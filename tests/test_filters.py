"""Gopher / C4 filter presets and the deterministic hash split."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))


GOOD = ("The quick brown fox jumps over the lazy dog and then keeps "
        "running through the quiet field while the farmer watches "
        "from the old wooden fence near the barn as evening light "
        "settles slowly over the warm countryside and the animals "
        "begin to rest for the night after a long day of work")


def test_gopher_flags_good_doc_passes_all(spark):
    from rulemorph_spark.llm.filters import gopher_quality_flags
    df = spark.createDataFrame([(1, GOOD)], ["doc_id", "text"])
    r = gopher_quality_flags(df).collect()[0]
    for c in ("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
              "ok_line_shape", "ok_alpha_words", "ok_stopwords",
              "ok_repetition"):
        assert r[c] is True, c
    assert r["n_words"] >= 50


def test_gopher_flags_kill_reasons(spark):
    from rulemorph_spark.llm.filters import gopher_quality_flags
    docs = [
        (1, "too short"),                                  # word count
        (2, " ".join(["supercalifragilistic"] * 60)),      # mwl + stops
        (3, " ".join(["the and to of"] * 20) + " " +
            " ".join(f"# w{i} ... x{i}" for i in range(30))),  # symbols
        (4, " ".join(["12345 67890"] * 40)),               # alpha words
        (5, " ".join(["alpha beta gamma"] * 40)),          # repetition
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert got[1]["ok_word_count"] is False
    assert got[2]["ok_mean_word_len"] is False
    assert got[2]["ok_stopwords"] is False
    assert got[3]["ok_symbol_ratio"] is False
    assert got[4]["ok_alpha_words"] is False
    assert got[5]["ok_repetition"] is False


def test_gopher_filter_is_conjunctive(spark):
    from rulemorph_spark.llm.filters import (gopher_filter,
                                             gopher_quality_flags)
    docs = _t(spark, "documents")
    flags = gopher_quality_flags(docs)
    ok_ids = {r["doc_id"] for r in flags.collect()
              if all(r[c] for c in r.asDict() if c.startswith("ok_"))}
    got = gopher_filter(docs)
    assert {r["doc_id"] for r in got.collect()} == ok_ids
    # payload columns survive the filter untouched
    assert set(got.columns) == set(docs.columns)


def test_c4_clean_lines(spark):
    from rulemorph_spark.llm.filters import c4_clean_lines
    docs = [
        (1, "A good sentence ends with punctuation.\n"
            "short one\n"
            "Another proper sentence stands right here!\n"
            "- bullet fragment without ending"),
        (2, "this page contains Lorem Ipsum placeholder text."),
        (3, "function() { return 1; } looks like code."),
        (4, "no line here ever terminates properly"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in c4_clean_lines(df).collect()}
    assert set(got) == {1}
    assert got[1]["text"] == ("A good sentence ends with punctuation.\n"
                              "Another proper sentence stands right here!")
    assert got[1]["n_lines"] == 4 and got[1]["kept_lines"] == 2


def test_hash_split_properties(spark):
    from rulemorph_spark.llm.filters import hash_split
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, weights={"train": 0.9, "valid": 0.05,
                                  "test": 0.05})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] / 20000 == pytest.approx(0.9, abs=0.02)
    assert counts["valid"] / 20000 == pytest.approx(0.05, abs=0.02)

    # deterministic and partitioning-independent
    again = hash_split(df.repartition(13),
                       weights={"train": 0.9, "valid": 0.05,
                                "test": 0.05})
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, again.collect()))

    # membership is a pure function of the id: growing the corpus
    # never migrates an existing doc across splits (leakage guarantee)
    bigger = hash_split(
        spark.range(40000).withColumnRenamed("id", "doc_id"),
        weights={"train": 0.9, "valid": 0.05, "test": 0.05})
    small = {r["doc_id"]: r["split"] for r in out.collect()}
    big = {r["doc_id"]: r["split"] for r in bigger.collect()}
    assert all(big[k] == v for k, v in small.items())


def test_hash_split_rejects_bad_weights(spark):
    from rulemorph_spark.llm.filters import hash_split
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, weights={"train": 0.5, "test": 0.4})
