#!/usr/bin/env python
"""sf10 scale rehearsal (VERDICT r8 next-round #1): the 16 headline
queries + 5 corpus ops ONCE at ~60M lineitem rows / 500k documents,
with the interleaved-DuckDB methodology and — new — per-query shuffle
read/write bytes and memory/disk spill recorded from the Spark UI REST
API (stage-metric deltas around each run).  Emits ONE JSON line and
per-query sf1→sf10 scaling factors against BENCH_SF1_r08.json.

    python scripts/make_sf1.py /tmp/sf10 100   # once, ~2 min
    python scripts/bench_sf10.py [/tmp/sf10] > BENCH_SF10_r09.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
os.environ["SPARK_GRAFT_UI"] = "true"
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
    "q_agg_pricing_summary", "q_lookup", "q_steps_pipeline",
    "q_window_rank", "q_array_ops", "q_text_metrics", "q_dedup_exact",
    "q_doc_signatures", "q_ann_topk", "q_asof_join", "q_range_join",
    "q_sessionize", "q_tfidf_topterms", "q_multimodal_probe",
    "q_bloom_join", "q_lm_quality",
]


def _stage_totals(spark) -> dict:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    out = {"shuffle_read": 0, "shuffle_write": 0, "mem_spill": 0,
           "disk_spill": 0, "input_bytes": 0}
    for s in stages:
        out["shuffle_read"] += s.get("shuffleReadBytes", 0)
        out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        out["mem_spill"] += s.get("memoryBytesSpilled", 0)
        out["disk_spill"] += s.get("diskBytesSpilled", 0)
        out["input_bytes"] += s.get("inputBytes", 0)
    return out


def _delta(a: dict, b: dict) -> dict:
    return {k: b[k] - a[k] for k in a}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    cpus = int(os.environ["SPARK_GRAFT_CPUS"])

    from rulemorph_spark.engine import get_spark
    import __spark_entry__ as entry
    import bench as B

    spark = get_spark("rulemorph-bench-sf10", cpus=cpus)
    spark.range(1000).count()

    qs = entry.queries()
    oracles = entry.oracle_sql()

    def corpus_fns():
        from rulemorph_spark.llm.dedup import remove_dup_spans
        from rulemorph_spark.llm.filters import gopher_quality_flags
        from rulemorph_spark.llm.lm import lm_quality, perplexity_buckets
        from rulemorph_spark.llm.retrieval import bm25_search
        from rulemorph_spark.llm.semdedup import semdedup

        def docs(d):
            return spark.read.parquet(f"{d}/documents.parquet")

        return {
            "remove_dup_spans": lambda s, d: remove_dup_spans(docs(d), n=8),
            "gopher_flags": lambda s, d: gopher_quality_flags(docs(d)),
            "semdedup": lambda s, d: semdedup(
                spark.read.parquet(f"{d}/embeddings.parquet"),
                "vec_id", "embedding", k=8, iters=2, eps=0.05),
            "bm25_search": lambda s, d: bm25_search(
                docs(d).select("doc_id", "text"),
                spark.createDataFrame(
                    [(i, "filter join merge table scan") for i in range(8)],
                    "query_id int, query string"), k=10),
            "ppl_buckets": lambda s, d: perplexity_buckets(
                lm_quality(docs(d))),
        }

    duck_con = B._duck_connect(sf_dir, entry.TABLES, cpus)
    sentinel = {}
    if duck_con is not None:
        sentinel["start"] = B._duck_sentinel(duck_con)

    timings, metrics, duck = {}, {}, {}
    all_q = [(n, qs[n]) for n in HEADLINE] + sorted(corpus_fns().items())
    for name, fn in all_q:
        # one untimed warm run (codegen/AQE), then ONE timed run —
        # sf10 makes criterion-style 6-sample passes impractical
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        before = _stage_totals(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        metrics[name] = _delta(before, _stage_totals(spark))
        print(f"{name}: {timings[name]}s {metrics[name]}",
              file=sys.stderr, flush=True)
        if duck_con is not None and oracles.get(name):
            t0 = time.perf_counter()
            duck_con.execute(oracles[name]).fetchall()
            duck[name] = round(time.perf_counter() - t0, 3)

    if duck_con is not None:
        sentinel["end"] = B._duck_sentinel(duck_con)
        duck_con.close()

    scaling = {}
    sf1_path = os.path.join(REPO, "BENCH_SF1_r08.json")
    if os.path.exists(sf1_path):
        sf1 = json.load(open(sf1_path))
        base = dict(sf1.get("queries", {}), **sf1.get("corpus_ops", {}))
        for n, t in timings.items():
            if base.get(n):
                scaling[n] = round(t / base[n], 2)

    common = [n for n in HEADLINE if duck.get(n)]
    ratio = (round(sum(timings[n] for n in common)
                   / sum(duck[n] for n in common), 3) if common else None)
    print(json.dumps({
        "metric": "sf10_rehearsal",
        "value": round(sum(timings[n] for n in HEADLINE), 3),
        "unit": "sec",
        "queries": {n: timings[n] for n in HEADLINE},
        "corpus_ops": {n: timings[n] for n in timings
                       if n not in HEADLINE},
        "stage_metrics_bytes": metrics,
        "duckdb": duck,
        "spark_vs_duckdb_ratio": ratio,
        "sf1_to_sf10_scaling": scaling,
        "load_sentinel": sentinel,
        "sf": 10,
    }))


if __name__ == "__main__":
    main()
