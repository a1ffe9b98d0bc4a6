"""Scale-up probe: replicate the sf0.1 tables ~Nx with shifted keys and
measure how the headline operators' wall-clock grows.

Evidence for the 100 TB design claims: a plan whose cost is dominated
by fixed overhead at sf0.1 should grow sublinearly with N; a plan that
shuffles the whole input should grow ~linearly and no worse.  Run:

    python scripts/scale_probe.py [N] [--skew]

``--skew`` (VERDICT r2 next #5) replicates ADVERSARIALLY instead of
uniformly: ~30% of all document texts become ONE hot boilerplate text
and ~30% of all embeddings become ONE hot vector.  That manufactures
exactly the three open skew shapes — a hot LSH band bucket, one
mega-cluster for SemDeDup, one boilerplate gram for dup-span removal —
and the probe reports both wall-clock and the cap-engagement numbers
(raw hot-bucket size vs star-capped edges, mega-cluster size vs the
shard cap, hottest gram document frequency) that show the caps bound
per-task work.

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


def replicate(spark, src_dir: str, out_dir: str, n: int,
              skew: bool = False,
              tables: list[str] | None = None) -> None:
    """lineitem/orders/events replicated n× with shifted ids; the small
    dims are left as-is (a 100 TB corpus grows facts, not regions).
    Replication is ONE crossJoin against a broadcast n-row replica
    index (an n-way unionAll plan OOMs the driver at n=100).

    ``skew=True`` additionally collapses ~30% of document texts onto
    one hot boilerplate text and ~30% of embeddings onto one hot
    vector (deterministic ``id % 10 < 3``), manufacturing a hot LSH
    band, a SemDeDup mega-cluster and a boilerplate gram.
    ``tables`` limits which fact tables are replicated."""
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
        if tables is not None and t not in tables:
            continue
        spark.read.parquet(f"{src_dir}/{t}.parquet") \
            .write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    hot_text = hot_vec = None
    if skew:
        docs0 = spark.read.parquet(f"{src_dir}/documents.parquet")
        # a mid-length real text keeps the gram load realistic
        hot_text = (docs0.orderBy("doc_id")
                    .select("text").limit(50).collect()[25]["text"])
        hot_vec = (spark.read.parquet(f"{src_dir}/embeddings.parquet")
                   .orderBy("vec_id").select("embedding")
                   .limit(1).collect()[0]["embedding"])
    reps = F.broadcast(spark.range(n).select(
        F.col("id").alias("__rep__")))
    for t, keys in shifts.items():
        if tables is not None and t not in tables:
            continue
        base = spark.read.parquet(f"{src_dir}/{t}.parquet")
        out = base.crossJoin(reps)
        for col, stride in keys:
            out = out.withColumn(
                col, F.col(col) + F.col("__rep__") * F.lit(stride))
        out = out.drop("__rep__")
        if skew and t == "documents":
            out = out.withColumn(
                "text", F.when(F.col("doc_id") % 10 < 3,
                               F.lit(hot_text)).otherwise(F.col("text")))
        if skew and t == "embeddings":
            out = out.withColumn(
                "embedding",
                F.when(F.col("vec_id") % 10 < 3,
                       F.array(*[F.lit(float(x)) for x in hot_vec])
                       .cast("array<float>"))
                .otherwise(F.col("embedding")))
        # spread the replicated rows: the base table may be one file,
        # and 1 partition x n replicas would serialize every scan
        out.repartition(max(32, min(n, 256))) \
            .write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def _typed_probe(spark, n: int) -> None:
    """Round-5 probe (VERDICT r4 next #8): the round-4 typed paths at
    Nx — (a) typed navigation over map/array/struct columns must stay
    a zero-exchange narrow projection (growth ~ rows, no shuffle);
    (b) the widened-bound long-column ordering pushdown must engage
    parquet row-group pruning, so a selective record_when grows FAR
    slower than the variant path that decodes every row."""
    from rulemorph_spark.engine import transform_table

    base_rows, big_rows = 600_000, 600_000 * n
    gen = ["id",
           "id AS qty",  # monotonic → row-group min/max prune
           "map('k1', id % 1000, 'k2', id % 7) AS attrs",
           "array(id % 10, id % 100, id % 1000) AS arr",
           "named_struct('a', id % 997, 'b', concat('v', id % 13)) "
           "AS meta"]
    nav_rule = """
version: 2
input: {format: json}
mappings:
  - target: k1
    expr: ["@input.attrs.k1"]
  - target: second
    expr: ["@input.arr[1]"]
  - target: ma
    expr: ["@input.meta.a", {add: [1]}]
"""
    push_rule_t = """
version: 2
input: {format: json}
record_when: {gte: ["@input.qty", %d]}
mappings:
  - target: id
    source: id
"""
    with tempfile.TemporaryDirectory() as tmp:
        dirs = {}
        for label, rows in (("base", base_rows), ("big", big_rows)):
            p = f"{tmp}/{label}"
            # sortWithinPartitions keeps qty runs ordered per file so
            # parquet row-group stats are tight (the layout a real
            # ingest with Z-order/sort compaction produces)
            spark.range(rows).selectExpr(*gen) \
                .repartitionByRange(max(32, min(n, 256)), "id") \
                .sortWithinPartitions("id") \
                .write.mode("overwrite").parquet(p)
            dirs[label] = p

        out = {"probe": "typed_navigation", "scale_n": n}
        for label, p in dirs.items():
            df = spark.read.parquet(p)
            res = transform_table(df, nav_rule, mode="typed")
            plan = res._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan[:400]
            out[f"t_{label}_s"] = _timed3(lambda r=res: r)
        out["growth"] = round(out["t_big_s"] / out["t_base_s"], 2)
        out["rows_ratio"] = n
        out["exchanges"] = 0
        print(json.dumps(out), flush=True)

        # selective filter: top ~0.5% of the BIG table's qty domain
        lit = int(big_rows * 0.995)
        out = {"probe": "long_pushdown_prune", "scale_n": n,
               "selectivity": 0.005}
        big_df = spark.read.parquet(dirs["big"])
        typed = transform_table(big_df, push_rule_t % lit, mode="typed")
        plan = typed._jdf.queryExecution().executedPlan().toString()
        assert "GreaterThanOrEqual(qty," in plan, plan[:600]
        out["pushed"] = True
        out["t_typed_s"] = _timed3(lambda: typed)
        var = transform_table(big_df, push_rule_t % lit, mode="variant")
        out["t_variant_s"] = _timed3(lambda: var)
        out["typed_speedup"] = round(out["t_variant_s"]
                                     / out["t_typed_s"], 1)
        print(json.dumps(out), flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:]
            if a not in ("--skew", "--typed")]
    skew = "--skew" in sys.argv[1:]
    typed = "--typed" in sys.argv[1:]
    n = int(args[0]) if args else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # N=100 replicas need real heap (local-mode default is 1g)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from rulemorph_spark.engine import get_spark
    import __spark_entry__ as entry

    spark = get_spark("scale-probe",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if typed:
        return _typed_probe(spark, n)
    if skew:
        return _skew_probe(spark, src, n)
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


def _timed3(fn) -> float:
    fn().write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[1], 3)


def _skew_probe(spark, src: str, n: int) -> None:
    """Adversarial-skew probe: the three open skew shapes at Nx, with
    cap-engagement diagnostics proving per-task work stays bounded."""
    from rulemorph_spark.llm.dedup import (minhash_from_shingles,
                                           lsh_band_keys,
                                           minhash_lsh_candidates,
                                           remove_dup_spans, shingles)
    from rulemorph_spark.llm.semdedup import semdedup

    with tempfile.TemporaryDirectory() as big:
        replicate(spark, src, big, n, skew=True,
                  tables=["documents", "embeddings"])
        docs = spark.read.parquet(f"{big}/documents.parquet")
        emb = spark.read.parquet(f"{big}/embeddings.parquet")
        n_docs, n_vecs = docs.count(), emb.count()

        # --- hot LSH band: raw bucket size vs star-capped edges -----
        CAP = 64
        banded = docs.select(
            "doc_id",
            F.posexplode(lsh_band_keys(
                minhash_from_shingles(shingles(F.col("text"), 3), 8),
                4, 2)).alias("band", "band_key"))
        hot = (banded.groupBy("band", "band_key").count()
               .agg(F.max("count").alias("m")).collect()[0]["m"])
        edges = minhash_lsh_candidates(docs, "doc_id", "text",
                                       max_bucket=CAP).count()
        t_lsh = _timed3(lambda: minhash_lsh_candidates(
            docs, "doc_id", "text", max_bucket=CAP))
        print(json.dumps({
            "query": "op_lsh_candidates_skew", "scale_n": n,
            "n_docs": n_docs, "hot_bucket_raw": int(hot),
            "uncapped_pairs_of_hot_bucket": int(hot) * (int(hot) - 1) // 2,
            "max_bucket_cap": CAP, "edges_emitted": int(edges),
            "t_s": t_lsh}), flush=True)

        # --- SemDeDup mega-cluster vs the shard cap ------------------
        MAXC = 4096
        mega = (emb.groupBy(F.xxhash64(F.col("embedding")
                                       .cast("array<float>"))
                            .alias("h")).count()
                .agg(F.max("count").alias("m")).collect()[0]["m"])
        t_sd = _timed3(lambda: semdedup(emb, "vec_id", "embedding",
                                        k=8, iters=2, eps=0.05,
                                        max_cluster=MAXC))
        import math
        print(json.dumps({
            "query": "op_semdedup_skew", "scale_n": n,
            "n_vecs": n_vecs, "mega_cluster_size": int(mega),
            "max_cluster_cap": MAXC,
            "shards_for_mega": math.ceil(int(mega) / MAXC),
            "t_s": t_sd}), flush=True)

        # --- boilerplate gram in dup-span removal --------------------
        hot_gram_df = (docs.select(F.explode(F.array_distinct(
            shingles(F.col("text"), 8))).alias("g"))
            .groupBy("g").count()
            .agg(F.max("count").alias("m")).collect()[0]["m"])
        t_span = _timed3(lambda: remove_dup_spans(docs, n=8,
                                                  min_docs=2))
        print(json.dumps({
            "query": "op_remove_dup_spans_skew", "scale_n": n,
            "n_docs": n_docs, "hottest_gram_df": int(hot_gram_df),
            "t_s": t_span}), flush=True)


if __name__ == "__main__":
    main()
