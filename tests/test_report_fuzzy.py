"""Corpus health report (llm/report.py) and the one-call batch fuzzy
dedup (dedup.dedup_fuzzy)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))


def test_corpus_report_matches_direct_aggregates(spark):
    from rulemorph_spark.llm.report import corpus_report
    from rulemorph_spark.llm.text import token_count
    docs = _t(spark, "documents")
    rep = {r["source"]: r for r in corpus_report(docs).collect()}

    direct = {r["source"]: r for r in
              docs.groupBy("source")
              .agg(F.count("*").alias("docs"),
                   F.sum(token_count(F.col("text")).cast("long"))
                   .alias("tokens"),
                   F.sum(F.length("text").cast("long")).alias("chars"))
              .collect()}
    assert set(rep) == set(direct)
    for s, d in direct.items():
        assert rep[s]["docs"] == d["docs"]
        assert rep[s]["tokens"] == d["tokens"]
        assert rep[s]["chars"] == d["chars"]
        assert 0.0 <= rep[s]["english_frac"] <= 1.0
        assert 0.0 <= rep[s]["dup_frac_approx"] <= 1.0
        assert rep[s]["p50_tokens"] <= rep[s]["p95_tokens"]


def test_corpus_report_total_one_row(spark):
    from rulemorph_spark.llm.report import corpus_report_total
    docs = _t(spark, "documents")
    rows = corpus_report_total(docs).collect()
    assert len(rows) == 1
    assert rows[0]["docs"] == docs.count()


def test_corpus_report_dup_pressure_visible(spark):
    from rulemorph_spark.llm.report import corpus_report_total
    docs = _t(spark, "documents").limit(200)
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 100000))
    r = corpus_report_total(doubled).collect()[0]
    # every doc duplicated once → ~half the fingerprints are distinct
    assert r["dup_frac_approx"] == pytest.approx(0.5, abs=0.08)


@pytest.mark.parametrize("verify", ["exact", "estimate"])
def test_dedup_fuzzy_one_call(spark, verify):
    from rulemorph_spark.llm.dedup import dedup_fuzzy
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon phi chi "
            "psi omega one two three four five six")
    rows = [
        (1, base), (2, base),
        (3, base.replace("omicron", "OTHER")),   # near-dup of 1/2
        (10, "completely different text about volcanoes erupting in "
             "iceland near the glacier road last summer evening"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_fuzzy(df, num_hashes=16, bands=8, threshold=0.6,
                      verify=verify)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 10]
    assert set(out.columns) == {"doc_id", "text"}


def test_dedup_fuzzy_agrees_with_hand_chain(spark):
    """dedup_fuzzy(exact) ≡ candidates → jaccard → CC → min-id keep,
    hand-chained (the composition it packages)."""
    from rulemorph_spark.llm.dedup import (connected_components,
                                           dedup_fuzzy, jaccard_ngram,
                                           minhash_lsh_candidates)
    docs = _t(spark, "documents").filter(F.col("doc_id") < 200)
    got = {r["doc_id"] for r in
           dedup_fuzzy(docs, num_hashes=8, bands=4, threshold=0.5)
           .collect()}

    cands = minhash_lsh_candidates(docs, "doc_id", "text", 8, 4, 3)
    ta = docs.select(F.col("doc_id").alias("id_a"),
                     F.col("text").alias("ta"))
    tb = docs.select(F.col("doc_id").alias("id_b"),
                     F.col("text").alias("tb"))
    edges = (cands.join(ta, "id_a").join(tb, "id_b")
             .filter(jaccard_ngram(F.col("ta"), F.col("tb"), 3) >= 0.5)
             .select(F.col("id_a").alias("src"),
                     F.col("id_b").alias("dst")))
    comp = connected_components(edges)
    losers = {r["node"] for r in
              comp.filter(F.col("node") != F.col("comp")).collect()}
    want = {r["doc_id"] for r in docs.collect()} - losers
    assert got == want and got


def test_lsh_candidates_hot_bucket_star_cap(spark):
    """A boilerplate signature shared by m docs must emit O(m) star
    edges under the cap, not m(m-1)/2 pairs — and component
    resolution still collapses the cluster to one survivor."""
    from rulemorph_spark.llm.dedup import (dedup_fuzzy,
                                           minhash_lsh_candidates)
    boiler = ("identical boilerplate sentence repeated across many "
              "pages of the crawl with no variation at all whatsoever")
    rows = [(i, boiler) for i in range(40)] + \
           [(100, "a genuinely unique document that talks about "
                  "something completely unrelated to the rest")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = minhash_lsh_candidates(df, "doc_id", "text", 8, 4,
                                    max_bucket=10)
    n_capped = capped.count()
    assert n_capped == 39  # star: every member -> hub 0
    assert capped.filter(F.col("id_a") != 0).count() == 0

    uncapped = minhash_lsh_candidates(df, "doc_id", "text", 8, 4)
    assert uncapped.count() == 40 * 39 // 2

    out = dedup_fuzzy(df, num_hashes=8, bands=4, threshold=0.6,
                      max_bucket=10)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 100]


def test_cli_report_command(tmp_path):
    import json as _json
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "-m", "rulemorph_spark.cli", "report",
         "-i", "/root/testdata/sf0.001/documents.parquet"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    rows = [_json.loads(l) for l in r.stdout.strip().splitlines()
            if l.startswith("{")]
    assert rows and all("dup_frac_approx" in x for x in rows)
    assert sum(x["docs"] for x in rows) == 500
