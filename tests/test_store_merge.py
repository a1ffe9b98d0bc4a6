"""Copy-on-write MERGE / DELETE on the versioned CorpusStore
(sources/versioned.py): only directories containing matched rows are
rewritten; everything else is carried by reference."""

import pytest
from pyspark.sql import functions as F

from rulemorph_spark.sources.versioned import CorpusStore


def _batch(spark, lo, hi, rev="r1"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"{rev}-text-"), F.col("id")).alias("text"))


@pytest.fixture()
def store(spark, tmp_path):
    s = CorpusStore(spark, str(tmp_path / "store"))
    s.append(_batch(spark, 0, 100), note="batch A")
    s.append(_batch(spark, 100, 200), note="batch B")
    s.append(_batch(spark, 200, 300), note="batch C")
    return s


def test_merge_updates_and_inserts(spark, store):
    updates = spark.createDataFrame(
        [(150, "fixed-150"), (300, "new-300")], "doc_id long, text string")
    v = store.merge(updates, "doc_id", note="fix 150, add 300")
    cur = store.read()
    assert cur.count() == 301
    got = {r["doc_id"]: r["text"]
           for r in cur.filter("doc_id in (150, 300, 0)").collect()}
    assert got == {150: "fixed-150", 300: "new-300", 0: "r1-text-0"}
    # time travel: the pre-merge snapshot still has the old row
    old = store.read(v - 1).filter("doc_id = 150").collect()
    assert old[0]["text"] == "r1-text-150"


def test_merge_rewrites_only_affected_dirs(spark, store):
    before = store.versions()[-1]["dirs"]
    # key 150 lives only in batch B's directory
    updates = spark.createDataFrame([(150, "fixed")],
                                    "doc_id long, text string")
    store.merge(updates, "doc_id")
    after = store.versions()[-1]["dirs"]
    carried = set(before) & set(after)
    assert len(carried) == 2          # A and C untouched, by reference
    assert len(set(after) - set(before)) == 1  # one rewritten dir


def test_merge_pure_insert_rewrites_nothing(spark, store):
    before = store.versions()[-1]["dirs"]
    inserts = _batch(spark, 500, 520, rev="r2")
    store.merge(inserts, "doc_id")
    after = store.versions()[-1]["dirs"]
    assert set(before) <= set(after) and len(after) == len(before) + 1
    assert store.read().count() == 320


def test_merge_into_empty_store(spark, tmp_path):
    s = CorpusStore(spark, str(tmp_path / "fresh"))
    s.merge(_batch(spark, 0, 10), "doc_id")
    assert s.read().count() == 10


def test_merge_key_validation(spark, store):
    with pytest.raises(ValueError):
        store.merge(_batch(spark, 0, 5), "missing_key")


def test_delete_where_partial_and_whole_dir(spark, store):
    before = store.versions()[-1]["dirs"]
    # delete half of batch B: only that dir is rewritten
    store.delete_where("doc_id >= 150 and doc_id < 200")
    after = store.versions()[-1]["dirs"]
    assert len(set(before) & set(after)) == 2
    assert store.read().count() == 250
    # delete ALL of batch A: its dir is dropped with no rewrite at all
    mid = store.versions()[-1]["dirs"]
    store.delete_where("doc_id < 100")
    final = store.versions()[-1]["dirs"]
    assert set(final) < set(mid) and len(final) == len(mid) - 1
    assert store.read().count() == 150
    # no-match delete commits an identical manifest
    store.delete_where("doc_id < 0")
    assert store.versions()[-1]["dirs"] == final


def test_vacuum_reclaims_replaced_dirs(spark, store):
    updates = spark.createDataFrame([(150, "fixed")],
                                    "doc_id long, text string")
    v = store.merge(updates, "doc_id")
    deleted = store.vacuum(keep_from_version=v)
    assert len(deleted) == 1          # batch B's replaced directory
    assert store.read().count() == 300
    assert store.read().filter("doc_id = 150").collect()[0]["text"] \
        == "fixed"


def test_append_and_merge_reject_schema_drift(spark, store):
    drifted = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("string").alias("text"),
        F.lit(1).alias("surprise"))
    with pytest.raises(ValueError, match="extra: \\['surprise'\\]"):
        store.append(drifted)
    retyped = spark.range(5).select(
        F.col("id").cast("int").alias("doc_id"),
        F.col("id").cast("string").alias("text"))
    with pytest.raises(ValueError, match="retyped"):
        store.merge(retyped, "doc_id")
    # column ORDER does not matter (parquet reads by name)
    reordered = spark.range(400, 405).select(
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.col("id").alias("doc_id"))
    store.append(reordered)
    assert store.read().count() == 305


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """A row whose condition evaluates to NULL did NOT match, so it
    must SURVIVE a delete — even when it shares a data directory with
    a true match (the rewrite path).  Regression for the ~cond
    survivor filter silently dropping NULL rows."""
    st = CorpusStore(spark, str(tmp_path / "store"))
    rows = [(1, 0.9), (2, None), (3, 0.1)]
    st.append(spark.createDataFrame(rows, "doc_id long, score double"))
    st.delete_where("score > 0.5")
    got = sorted((r["doc_id"], r["score"]) for r in st.read().collect())
    assert got == [(2, None), (3, 0.1)]
    # Column-object condition takes the same path
    st2 = CorpusStore(spark, str(tmp_path / "store2"))
    st2.append(spark.createDataFrame(rows, "doc_id long, score double"))
    st2.delete_where(F.col("score") > 0.5)
    assert sorted(r["doc_id"] for r in st2.read().collect()) == [2, 3]
