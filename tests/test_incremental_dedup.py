"""Incremental exact dedup against a persistent fingerprint store
(llm/dedup.dedup_incremental): batches admit only never-seen
fingerprints, re-running a batch admits nothing (idempotence), and the
returned rows stay valid after the store is appended to.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rulemorph_spark.llm.dedup import dedup_incremental
from rulemorph_spark.llm.text import fingerprint

SF_DIR = "/root/testdata/sf0.001"


def _batches(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    b1 = docs.filter(F.col("doc_id") < 100)
    # overlaps b1 on 50 ids' worth of text plus 100 new docs
    b2 = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 200))
    return docs, b1, b2


def test_incremental_admits_only_new_fingerprints(spark, tmp_path):
    store = str(tmp_path / "fps")
    docs, b1, b2 = _batches(spark)
    key = fingerprint(F.col("text"))

    out1 = dedup_incremental(b1, store, key, "doc_id")
    got1 = {r.doc_id for r in out1.select("doc_id").collect()}
    # within-batch dedup keeps the lowest doc_id per fingerprint
    expected1 = {
        r.doc_id
        for r in b1.select("doc_id", key.alias("fp"))
        .groupBy("fp").agg(F.min("doc_id").alias("doc_id")).collect()}
    assert got1 == expected1

    out2 = dedup_incremental(b2, store, key, "doc_id")
    got2 = {r.doc_id for r in out2.select("doc_id").collect()}
    # nothing in batch 2 may reuse a fingerprint admitted in batch 1
    fp1 = {r.fp for r in b1.select(key.alias("fp")).collect()}
    fp2 = {r.fp
           for r in b2.join(spark.createDataFrame(
               [(i,) for i in sorted(got2)], "doc_id long"), "doc_id")
           .select(key.alias("fp")).collect()}
    assert got2 and not (fp1 & fp2)

    # union of both admissions deduplicates the union corpus exactly
    all_fps = spark.read.parquet(store)
    assert (all_fps.count() == all_fps.distinct().count()
            == len(fp1 | fp2))


def test_incremental_rerun_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "fps")
    _, b1, _ = _batches(spark)
    key = fingerprint(F.col("text"))

    first = dedup_incremental(b1, store, key, "doc_id")
    n_first = first.count()
    assert n_first > 0
    rerun = dedup_incremental(b1, store, key, "doc_id")
    assert rerun.count() == 0


def test_incremental_with_out_path_is_durable_and_rerunnable(
        spark, tmp_path):
    store = str(tmp_path / "fps")
    out = str(tmp_path / "admitted")
    _, b1, _ = _batches(spark)
    key = fingerprint(F.col("text"))

    first = dedup_incremental(b1, store, key, "doc_id", out_path=out)
    n = first.count()
    assert n > 0
    # survivors are durable parquet, independent of the session state
    assert spark.read.parquet(out).count() == n
    # re-run after a successful commit admits nothing new AND must NOT
    # clobber the durable survivors (their fingerprints stay committed,
    # so an overwrite would lose them permanently)
    rerun = dedup_incremental(b1, store, key, "doc_id", out_path=out)
    assert rerun.count() == 0
    assert spark.read.parquet(out).count() == n


# ------------------------------------------------- fuzzy (MinHash-LSH)

def _fuzzy_docs(spark):
    """Construction corpus: exact dup pair, paraphrase pair (one word
    changed out of 30 → Jaccard ≈ 0.87), and distinct docs."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon phi chi "
            "psi omega one two three four five six")
    near = base.replace("omicron", "OTHER")
    rows = [
        (1, base), (2, base),            # exact dup of each other
        (3, near),                       # near-dup of 1/2
        (10, "completely different text about volcanoes erupting in "
             "iceland near the glacier road last summer evening"),
        (11, "a third topic entirely concerning database engines and "
             "columnar storage formats for analytics workloads"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_fuzzy_incremental_first_batch_clusters(spark, tmp_path):
    from rulemorph_spark.llm.dedup import fuzzy_dedup_incremental
    store = str(tmp_path / "sigs")
    out = fuzzy_dedup_incremental(
        _fuzzy_docs(spark), store, num_hashes=16, bands=8,
        threshold=0.6)
    kept = sorted(r.doc_id for r in out.collect())
    # 1,2,3 collapse to min-id 1; distinct docs survive
    assert kept == [1, 10, 11]


def test_fuzzy_incremental_drops_paraphrase_recrawl(spark, tmp_path):
    from rulemorph_spark.llm.dedup import fuzzy_dedup_incremental
    store = str(tmp_path / "sigs")
    b1 = _fuzzy_docs(spark)
    fuzzy_dedup_incremental(b1, store, num_hashes=16, bands=8,
                            threshold=0.6)
    # batch 2: a re-crawl paraphrase of doc 1 under a new id + one
    # genuinely new doc
    b2 = spark.createDataFrame(
        [(20, b1.filter(F.col("doc_id") == 1).collect()[0]["text"]
          .replace("sigma", "ALTERED")),
         (21, "fresh subject matter on mountain trail running and "
              "altitude acclimatization strategies for beginners")],
        ["doc_id", "text"])
    out2 = fuzzy_dedup_incremental(b2, store, num_hashes=16, bands=8,
                                   threshold=0.6)
    assert sorted(r.doc_id for r in out2.collect()) == [21]


def test_fuzzy_incremental_rerun_is_idempotent(spark, tmp_path):
    from rulemorph_spark.llm.dedup import fuzzy_dedup_incremental
    store = str(tmp_path / "sigs")
    b1 = _fuzzy_docs(spark)
    fuzzy_dedup_incremental(b1, store, num_hashes=16, bands=8,
                            threshold=0.6)
    size_after_1 = spark.read.parquet(store).count()
    again = fuzzy_dedup_incremental(b1, store, num_hashes=16, bands=8,
                                    threshold=0.6)
    assert again.count() == 0
    assert spark.read.parquet(store).count() == size_after_1


def test_fuzzy_incremental_exact_verify_and_out_path(spark, tmp_path):
    from rulemorph_spark.llm.dedup import fuzzy_dedup_incremental
    store = str(tmp_path / "sigs")
    out_path = str(tmp_path / "corpus")
    b1 = _fuzzy_docs(spark)
    out = fuzzy_dedup_incremental(b1, store, num_hashes=16, bands=8,
                                  threshold=0.6, verify="exact",
                                  out_path=out_path)
    assert sorted(r.doc_id for r in out.collect()) == [1, 10, 11]
    # exact mode stores text alongside signatures
    assert "text" in spark.read.parquet(store).columns
    # re-run after successful commit: empty fresh set must NOT clobber
    # the durable output (same contract as dedup_incremental)
    again = fuzzy_dedup_incremental(b1, store, num_hashes=16, bands=8,
                                    threshold=0.6, verify="exact",
                                    out_path=out_path)
    assert again.count() == 0
    assert sorted(r.doc_id for r in
                  spark.read.parquet(out_path).collect()) == [1, 10, 11]


def test_fuzzy_incremental_rejects_bad_params(spark, tmp_path):
    import pytest
    from rulemorph_spark.llm.dedup import fuzzy_dedup_incremental
    df = _fuzzy_docs(spark)
    with pytest.raises(ValueError, match="verify"):
        fuzzy_dedup_incremental(df, str(tmp_path / "s"), verify="nope")
    with pytest.raises(ValueError, match="bands"):
        fuzzy_dedup_incremental(df, str(tmp_path / "s"), num_hashes=16,
                                bands=5)
