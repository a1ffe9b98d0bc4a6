"""Scale-up probe: replicate the sf0.1 tables ~Nx with shifted keys and
measure how the headline operators' wall-clock grows.

Evidence for the 100 TB design claims: a plan whose cost is dominated
by fixed overhead at sf0.1 should grow sublinearly with N; a plan that
shuffles the whole input should grow ~linearly and no worse.  Run:

    python scripts/scale_probe.py [N]

Writes the replicated tables to a temp dir (never touches
/root/testdata) and prints one JSON line per measured query.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F


def replicate(spark, src_dir: str, out_dir: str, n: int) -> None:
    """lineitem/orders/events replicated n× with shifted ids; the small
    dims are left as-is (a 100 TB corpus grows facts, not regions)."""
    shifts = {
        "lineitem": [("l_orderkey", 10_000_000)],
        "orders": [("o_orderkey", 10_000_000)],
        "events": [("event_id", 10_000_000)],
        # identical texts under fresh ids: a duplicate-heavy corpus,
        # exactly what the dedup shuffle has to absorb
        "documents": [("doc_id", 10_000_000)],
        # identical vectors under fresh ids: semdedup's worst case —
        # every replica lands in the same cluster and must be pruned
        "embeddings": [("vec_id", 10_000_000)],
    }
    copy = ["region", "nation", "customer", "supplier", "part"]
    for t in copy:
        spark.read.parquet(f"{src_dir}/{t}.parquet") \
            .write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    for t, keys in shifts.items():
        base = spark.read.parquet(f"{src_dir}/{t}.parquet")
        parts = []
        for i in range(n):
            p = base
            for col, stride in keys:
                p = p.withColumn(col, F.col(col) + F.lit(i * stride))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rulemorph_spark.engine import get_spark
    import __spark_entry__ as entry

    spark = get_spark("scale-probe",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    qs = entry.queries()
    names = ["q_agg_pricing_summary", "q_dedup_exact", "q_window_rank",
             "q_sessionize", "q_asof_join", "q_lookup",
             "q_rule_typed_transform", "q_bloom_join", "q_lm_quality"]

    # unregistered round-2 operators, driven directly
    def _span_removal(spark, d):
        from rulemorph_spark.llm.dedup import remove_dup_spans
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return remove_dup_spans(docs, n=8, min_docs=2)

    def _gopher(spark, d):
        from rulemorph_spark.llm.filters import gopher_quality_flags
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return gopher_quality_flags(docs)

    def _semdedup(spark, d):
        from rulemorph_spark.llm.semdedup import semdedup
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        return semdedup(emb, "vec_id", "embedding", k=8, iters=2,
                        eps=0.05)

    def _bm25(spark, d):
        from rulemorph_spark.llm.retrieval import bm25_search
        docs = spark.read.parquet(f"{d}/documents.parquet") \
            .select("doc_id", "text")
        queries = spark.createDataFrame(
            [(i, "filter join merge table scan") for i in range(8)],
            "query_id int, query string")
        return bm25_search(docs, queries, k=10)

    def _ppl_buckets(spark, d):
        from rulemorph_spark.llm.lm import lm_quality, perplexity_buckets
        docs = spark.read.parquet(f"{d}/documents.parquet")
        return perplexity_buckets(lm_quality(docs))

    extras = {"op_remove_dup_spans": _span_removal,
              "op_gopher_flags": _gopher,
              "op_semdedup": _semdedup,
              "op_bm25_search": _bm25,
              "op_ppl_buckets": _ppl_buckets}

    with tempfile.TemporaryDirectory() as big:
        replicate(spark, src, big, n)
        runners = [(name, qs[name]) for name in names] + \
            sorted(extras.items())
        for name, fn in runners:
            out = {"query": name, "scale_n": n}
            for label, d in (("t_base_s", src), ("t_big_s", big)):
                fn(spark, d).write.format("noop").mode(
                    "overwrite").save()  # warm
                samples = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(spark, d).write.format("noop").mode(
                        "overwrite").save()
                    samples.append(time.perf_counter() - t0)
                out[label] = round(sorted(samples)[1], 3)
            out["growth"] = round(out["t_big_s"] / out["t_base_s"], 2)
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
