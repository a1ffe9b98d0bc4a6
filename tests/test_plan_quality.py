"""Physical-plan regression guards for the scale operators: the plans
that make these viable at 100 TB (broadcast instead of shuffle, pruned
scans, bounded exchange counts) are asserted, not just observed, so a
refactor that silently reintroduces a shuffle or a second corpus scan
fails here.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    # shuffle exchanges only — broadcasts counted separately
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|"
                          r"SinglePartition)", plan))


def test_tfidf_scans_corpus_once(spark):
    plan = _plan(E.queries()["q_tfidf_topterms"](spark, SF))
    # one exploding scan + one count-only scan; a tf⋈docfreq rewrite
    # re-scans and re-aggregates the exploded corpus (14 exchanges)
    assert plan.count("FileScan parquet") == 2
    assert _exchanges(plan) <= 4


def test_lsh_probe_side_is_broadcast_and_pruned(spark):
    from rulemorph_spark.llm.similarity import lsh_topk
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries_df = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 11))
    plan = _plan(lsh_topk(e, queries_df, "vec_id", "embedding", k=3,
                          nbits=6))
    assert "BroadcastExchange" in plan
    # the query-side scan must push the vec_id range into the reader
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(vec_id",
                     plan)
    # corpus-side: bucket join + one shuffle for the rank window only
    assert _exchanges(plan) <= 2


def test_lookup_join_broadcasts_dimension(spark):
    plan = _plan(E.queries()["q_lookup"](spark, SF))
    assert "BroadcastExchange" in plan


def test_decontaminate_broadcasts_benchmark_side(spark):
    from rulemorph_spark.llm.text import decontaminate
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 10)
    plan = _plan(decontaminate(docs, bench))
    assert "BroadcastExchange" in plan


def test_mixture_sample_is_narrow(spark):
    from rulemorph_spark.llm.sampling import mixture_sample
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(mixture_sample(docs, "source", {"src0": 0.5}))
    assert _exchanges(plan) == 0 and "BroadcastExchange" not in plan


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    plan = _plan(E.queries()["q_agg_pricing_summary"](spark, SF))
    # the shipdate predicate reaches the scan (DataFilters precede the
    # truncated PushedFilters section in toString output)
    assert re.search(r"DataFilters: \[isnotnull\(l_shipdate[^\]]*<=", plan)
    # column pruning: the 11-column lineitem scan must read only the
    # aggregation's inputs
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m and len(m.group(1).split(",")) <= 6
