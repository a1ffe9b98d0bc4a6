"""Benchmark harness: headline queries at SPARK_GRAFT_SF_DIR (default
sf0.1) on local[SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Includes ``rule_engine_lookup``: the Spark engine running the reference's
own perf workload shape (records × lookup_first/lookup into 100-user /
100-tag contexts — ``crates/rulemorph/tests/performance.rs:32-97``,
``benches/transform_bench.rs:98-131``) so BENCH anchors to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from pyspark.sql import functions as F


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    # the full sweep (40+ query plans + whole-stage codegen cache +
    # the 14-mapping extended anchor) overflows local-mode's 1g
    # default driver heap; the bench session gets real headroom
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from rulemorph_spark.engine import get_spark
    import __spark_entry__ as entry

    spark = get_spark("rulemorph-bench", cpus=cpus)

    # NOTE (round 2): several round-1 headline queries were merged into
    # composites so the driver's 50-entry correctness window covers the
    # whole registry — per-query times are not directly comparable to
    # BENCH_r01 (q_lookup = q_lookup_first+q_lookup_all, q_array_ops ⊇
    # q_array_zip_with, q_text_metrics ⊇ q_text_tokens, q_doc_signatures
    # = q_minhash_signature+q_simhash, q_ann_topk = q_embedding_topk+
    # q_ivf_topk+q_lsh_topk, q_sessionize = q_sessionize_batch+
    # q_session_window); each composite does strictly MORE work than the
    # round-1 queries it replaces.
    headline = [
        "q_agg_pricing_summary",   # flagship group-by aggregation
        "q_lookup",                # broadcast-join lookup + collect_list
        "q_steps_pipeline",        # multi-step expression pipeline
        "q_window_rank",           # window functions
        "q_array_ops",             # HOF array ops over collected arrays
        "q_text_metrics",          # text analysis scan
        "q_dedup_exact",           # hash-shuffle dedup
        "q_doc_signatures",        # MinHash + SimHash signatures
        "q_ann_topk",              # brute-force + IVF + LSH ANN
        "q_asof_join",             # union-merge as-of join
        "q_range_join",            # time-binned interval join
        "q_sessionize",            # lag+cumsum ⋈ native session_window
        "q_tfidf_topterms",        # corpus statistic (explode+window)
        "q_multimodal_probe",      # Arrow-batched mapInPandas path
        "q_bloom_join",            # bloom-pruned semi+anti join (round 2)
        "q_lm_quality",            # unigram-LM NLL scoring (round 2)
    ]
    qs = entry.queries()
    timings: dict[str, float] = {}

    # warm the JVM/session, the vectorized parquet-reader path, and the
    # agg/exchange codegen paths on the smallest table, so the first
    # timed query doesn't absorb one-time initialization (none of the
    # benchmark tables' data is touched)
    spark.range(1000).count()
    (spark.read.parquet(f"{sf_dir}/region.parquet")
     .groupBy("r_name")
     .agg(F.count("*"), F.sum(F.col("r_regionkey").cast("decimal(18,2)")))
     .collect())

    # criterion-comparable methodology (BASELINE.md anchors to the
    # reference's criterion benches, which time WARMED iterations): one
    # untimed warm-up execution per query, then the MEDIAN of six timed
    # runs taken in TWO passes over the whole query set (pass A, then
    # pass B after every other query has run).  Two passes separated by
    # minutes of bench wall time make environment drift measurable:
    # per-query {min, median, max} plus the pass-B-minus-pass-A median
    # delta are emitted as "dispersion" (VERDICT r3 next #4 — r3's
    # uniform +20% on untouched queries was invisible in a lone
    # median).  Cold first-run cost (codegen + AQE replan) is reported
    # separately as cold_total.
    # the DuckDB baseline runs INTERLEAVED per query (same environment
    # window as the Spark samples) with a fixed sentinel probe timed at
    # start / mid / end quantifying machine-load drift (r7, VERDICT r6
    # next-round #8)
    oracles = entry.oracle_sql()
    duck_con = _duck_connect(sf_dir, entry.TABLES, int(cpus))
    duck_samples: dict[str, list[float]] = {n: [] for n in headline}
    sentinel: dict[str, float] = {}
    if duck_con is not None:
        sentinel["start"] = _duck_sentinel(duck_con)

    cold_total = 0.0
    samples: dict[str, list[float]] = {n: [] for n in headline}
    for name in headline:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        cold_total += time.perf_counter() - t0
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
        if duck_con is not None and oracles.get(name):
            duck_samples[name] += _duck_time(duck_con, name,
                                             oracles[name], warm=True)
    if duck_con is not None:
        sentinel["mid"] = _duck_sentinel(duck_con)
    for name in headline:  # pass B: re-time after the full first pass
        fn = qs[name]
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
        if duck_con is not None and oracles.get(name):
            duck_samples[name] += _duck_time(duck_con, name,
                                             oracles[name], warm=False)
    if duck_con is not None:
        sentinel["end"] = _duck_sentinel(duck_con)
        vals = sorted(sentinel.values())
        sentinel["drift"] = (round(vals[-1] / vals[0], 3)
                             if vals[0] else None)
        duck_con.close()
    dispersion: dict[str, dict] = {}
    for name in headline:
        ss = sorted(samples[name])
        a = sorted(samples[name][:3])[1]
        b = sorted(samples[name][3:])[1]
        timings[name] = round(ss[len(ss) // 2], 3)
        dispersion[name] = {"min": round(ss[0], 3),
                            "median": timings[name],
                            "max": round(ss[-1], 3),
                            "pass_delta": round(b - a, 3)}

    # round-2 corpus operators, reported separately so the headline
    # total stays comparable with BENCH_r01's query set
    def _span(spark, d):
        from rulemorph_spark.llm.dedup import remove_dup_spans
        return remove_dup_spans(
            spark.read.parquet(f"{d}/documents.parquet"), n=8)

    def _gopher(spark, d):
        # r10: the scan spreading moved INSIDE the operator
        # (llm/filters.py — every caller gets it, not just the bench);
        # the bench calls the operator bare again
        from rulemorph_spark.llm.filters import gopher_quality_flags
        return gopher_quality_flags(
            spark.read.parquet(f"{d}/documents.parquet"))

    def _semdedup(spark, d):
        from rulemorph_spark.llm.semdedup import semdedup
        return semdedup(spark.read.parquet(f"{d}/embeddings.parquet"),
                        "vec_id", "embedding", k=8, iters=2, eps=0.05)

    def _bm25(spark, d):
        from rulemorph_spark.llm.retrieval import bm25_search
        docs = spark.read.parquet(f"{d}/documents.parquet") \
            .select("doc_id", "text")
        qdf = spark.createDataFrame(
            [(i, "filter join merge table scan") for i in range(8)],
            "query_id int, query string")
        return bm25_search(docs, qdf, k=10)

    def _ppl(spark, d):
        from rulemorph_spark.llm.lm import lm_quality, perplexity_buckets
        return perplexity_buckets(
            lm_quality(spark.read.parquet(f"{d}/documents.parquet")))

    corpus_ops = {}
    for name, fn in (("remove_dup_spans", _span),
                     ("gopher_flags", _gopher),
                     ("semdedup", _semdedup),
                     ("bm25_search", _bm25),
                     ("ppl_buckets", _ppl)):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ss = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            ss.append(time.perf_counter() - t0)
        ss.sort()
        corpus_ops[name] = round(ss[1], 3)
        dispersion[name] = {"min": round(ss[0], 3),
                            "median": corpus_ops[name],
                            "max": round(ss[-1], 3)}

    duckdb_timings = {n: round(sorted(ss)[len(ss) // 2], 3)
                      for n, ss in duck_samples.items() if ss}

    for name, disp in (
            ("rule_engine_lookup", _rule_engine_lookup(spark)),
            ("rule_engine_typed", _rule_engine_typed(spark, sf_dir)),
            ("rule_engine_typed_lookup", _rule_engine_typed_lookup(spark))):
        timings[name] = disp["median"]
        dispersion[name] = disp
    ext = _rule_engine_extended(spark)
    if ext is not None:
        timings["rule_engine_extended"] = ext[0]["median"]
        dispersion["rule_engine_extended"] = ext[0]
        extended_compile_s = round(ext[1], 3)
    else:
        extended_compile_s = None

    # headline total covers the same query set as rounds 1-4; the
    # round-5 extended anchor is reported per-query but kept out of
    # the total so cross-round totals stay comparable
    total = round(sum(v for k, v in timings.items()
                      if k != "rule_engine_extended"), 3)
    common = [n for n in headline if duckdb_timings.get(n)]
    spark_common = sum(timings[n] for n in common)
    duck_common = sum(duckdb_timings[n] for n in common)
    ratio = round(spark_common / duck_common, 3) if duck_common else None
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "corpus_ops": corpus_ops,
        # per-query spread over 6 timed runs in 2 separated passes;
        # pass_delta = passB median - passA median (drift over bench
        # wall time — r3's unexplained +20% motivated this)
        "dispersion": dispersion,
        "cold_total": round(cold_total, 3),
        # measured same-machine/same-data baseline (VERDICT r2 next #3):
        # each headline query's oracle_sql() timed in DuckDB (native
        # materialization, same thread budget, warmed median-of-3).
        # ratio = spark_total / duckdb_total over the common queries —
        # DuckDB is a best-in-class single-node OLAP engine, so <= ~2x
        # is the "within 2x of a native engine" reading of the gate.
        "duckdb": duckdb_timings,
        # fixed DuckDB probe timed at start/mid/end: measured machine-
        # load drift across the bench window (r7, VERDICT r6 #8) — the
        # per-query DuckDB samples are INTERLEAVED with the Spark
        # passes, so the ratio is already load-paired; the sentinel
        # quantifies any residual drift for cross-round comparisons
        "load_sentinel": sentinel,
        # one-time parse+compile+analysis cost of the extended anchor
        # (the reference bench re-parses per iteration; this engine
        # compiles once — see _rule_engine_extended docstring)
        "rule_engine_extended_compile_s": extended_compile_s,
        "spark_vs_duckdb_ratio": ratio,
        "duckdb_note": "oracles compute the same RESULT, not always "
                       "the same WORK: q_multimodal_probe's oracle is "
                       "pure arithmetic while Spark encodes+decodes "
                       "real PNG/WAV bytes; q_bloom_join's oracle "
                       "skips the bloom-filter build; q_ann_topk's "
                       "oracle runs brute-force only while Spark also "
                       "builds IVF+LSH. Per-query ratios at sf<=0.1 "
                       "are also floored by ~0.3s fixed Spark job "
                       "overhead that amortizes at scale; the summary "
                       "ratio is the honest aggregate.",
        "sf": sf,
        # the reference binary is unbuildable offline (BASELINE.md
        # "Anchor status"): the declared anchor is workload parity —
        # rule_engine_lookup / rule_engine_typed* reproduce the
        # reference's own perf harness shapes through this engine
        "baseline_anchor": "workload-parity: perf_lookup_transform "
                           "(performance.rs:6-60) as rule_engine_lookup; "
                           "transform_simple (transform_bench.rs:86-96) "
                           "as rule_engine_typed; reference binary "
                           "unbuildable offline — see BASELINE.md",
    }
    # Durability (VERDICT r4 #2/#3): the driver's artifact keeps only
    # the last ~2000 chars of stdout, and the full record (dispersion,
    # duckdb map, notes) no longer fits that window.  Write the FULL
    # result to a committed file, then print a compact final line —
    # same driver contract (metric/value/unit/queries/sf) plus the
    # ratio and a pointer to the full file — sized to survive the tail
    # capture.
    artifact = _local_artifact_path()
    with open(artifact, "w", encoding="utf-8") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    worst = sorted(timings, key=timings.get, reverse=True)[:3]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "corpus_ops_total": round(sum(corpus_ops.values()), 3),
        "cold_total": round(cold_total, 3),
        "spark_vs_duckdb_ratio": ratio,
        "load_sentinel_drift": sentinel.get("drift"),
        "worst3": {n: timings[n] for n in worst},
        "sf": sf,
        "full_results": os.path.basename(artifact),
    }))


def _local_artifact_path() -> str:
    """BENCH_LOCAL_r{N}.json next to bench.py, N = current round
    (one past the newest driver-recorded BENCH_r{N}.json)."""
    import glob
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [int(m.group(1)) for p in glob.glob(
        os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))]
    n = (max(rounds) + 1) if rounds else 1
    return os.path.join(here, f"BENCH_LOCAL_r{n:02d}.json")


def _duck_connect(sf_dir: str, tables, threads: int):
    """DuckDB connection with the bench views; None when unavailable.

    The baseline runs INTERLEAVED with the Spark passes (VERDICT r6
    next-round #8): the same HEAD produced ratios 1.199/1.316/1.573
    purely from machine load when Spark and DuckDB ran as separate
    phases minutes apart — pairing each query's Spark and DuckDB
    samples inside the same environment window makes the ratio
    load-robust, and the sentinel below quantifies residual drift."""
    try:
        import duckdb
    except ImportError:
        return None
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


_SENTINEL_SQL = ("SELECT count(*), sum(l_extendedprice * l_discount) "
                 "FROM lineitem WHERE l_quantity > 10")


def _duck_sentinel(con) -> float:
    """Fixed constant-work DuckDB probe (median of 3): timed at bench
    start / between passes / at the end, so cross-round ratio
    comparisons can quote measured machine-load drift instead of
    needing a quiet-machine caveat."""
    ss = []
    con.execute(_SENTINEL_SQL)
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(_SENTINEL_SQL)
        ss.append(time.perf_counter() - t0)
    return round(sorted(ss)[1], 4)


def _duck_time(con, name: str, sql: str, runs: int = 3,
               warm: bool = True) -> list[float]:
    """Samples for one oracle: ``CREATE TEMP TABLE AS`` materializes
    natively (the analogue of Spark's noop sink)."""
    try:
        if warm:
            con.execute(f"CREATE OR REPLACE TEMP TABLE __bench AS "
                        f"({sql})")
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(f"CREATE OR REPLACE TEMP TABLE __bench AS "
                        f"({sql})")
            samples.append(time.perf_counter() - t0)
        return samples
    except Exception as exc:  # a baseline gap, not a bench failure
        print(f"duckdb baseline failed for {name}: {exc}",
              file=sys.stderr)
        return []


def _timed(df, runs: int = 3) -> float:
    """criterion-style: one untimed warm-up, median of ``runs``
    executions of the already-compiled plan (noise-robust)."""
    return _timed_disp(df, runs)["median"]


def _timed_disp(df, runs: int = 3) -> dict:
    """``_timed`` that also reports {min, median, max} so the
    rule_engine anchors get the same dispersion treatment as the
    headline queries (VERDICT r5 #7 — the extended anchor swung
    1.35-2.93 s across rounds with no way to tell drift from noise)."""
    df.write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return {"min": round(samples[0], 3),
            "median": round(samples[len(samples) // 2], 3),
            "max": round(samples[-1], 3)}


_EXT_RULES_PATH = ("/root/reference/crates/rulemorph/tests/fixtures/"
                   "t13_expr_extended/rules.yaml")


def _rule_engine_extended(spark, n_records: int = 5000
                          ) -> tuple[float, float] | None:
    """The reference's ``transform_extended_parse_rule`` bench shape
    (``benches/transform_bench.rs:74-84``): the t13 extended-expr rule
    — twelve expression mappings across string/regex/numeric/base/date
    ops — over 5000 records of the bench's constant extended input.

    The criterion bench re-parses the YAML every iteration because the
    reference interpreter's cost model is per-record re-evaluation;
    this engine compiles a rule ONCE into a Catalyst plan, so the
    honest split is (execute_s, compile_s): the steady-state per-batch
    execution of the compiled plan, and the one-time parse+compile+
    analysis cost it amortizes (at 100 TB the latter is noise; on this
    5000-row toy it dominates).  Returns None when the reference
    fixture tree is unavailable."""
    import json as _json

    from rulemorph_spark.compiler.rule import Builder, RuleCompiler
    from rulemorph_spark.model import parse_rule_file

    try:
        with open(_EXT_RULES_PATH, encoding="utf-8") as fh:
            rule_text = fh.read()
    except OSError:
        return None
    record = _json.dumps({  # build_extended_input, transform_bench.rs
        "text": "abc-123-abc", "regex_text": "a1b2c3", "csv": "a,b,c",
        "pad": "7", "num_a": 80.6, "num_b": "2.5", "num_c": 3,
        "base_value": 255, "date_simple": "2024-01-02 03:04:05",
        "date_tz": "2024-01-02T03:04:05+09:00",
        "unix_s": "1970-01-01T00:00:01Z",
        "unix_ms": "1970-01-01T00:00:00.123Z"})
    records = spark.range(n_records).select(
        F.col("id").alias("__idx__"),
        F.parse_json(F.lit(record)).alias("__record__"))

    t0 = time.perf_counter()
    rule = parse_rule_file(rule_text)
    builder = Builder(records)
    compiled = RuleCompiler(rule).compile(builder, F.col("__record__"))
    out = (builder.df.withColumn("__keep__", compiled.keep)
           .filter("__keep__").select(compiled.out_json().alias("j")))
    out.schema  # force analysis — part of the one-time compile cost
    compile_s = time.perf_counter() - t0
    return _timed_disp(out), compile_s


# the reference's PERF_RULES verbatim shape (tests/performance.rs:6-30)
_LOOKUP_RULE = """
version: 1
input:
  format: json
  json: {}
mappings:
  - target: "id"
    source: "id"
  - target: "user_name"
    expr:
      op: "lookup_first"
      args:
        - { ref: "context.users" }
        - "id"
        - { ref: "input.user_id" }
        - "name"
  - target: "tags"
    expr:
      op: "lookup"
      args:
        - { ref: "context.tags" }
        - "id"
        - { ref: "input.tag_id" }
        - "value"
"""


def _rule_engine_lookup(spark, n_records: int = 10000, n_users: int = 100,
                        n_tags: int = 100) -> float:
    """The reference's perf_lookup_transform workload
    (``tests/performance.rs:62-97``) through the compiled rule engine."""
    import json as _json

    from rulemorph_spark.compiler.rule import Builder, RuleCompiler
    from rulemorph_spark.model import parse_rule_file

    context = {
        "users": [{"id": i, "name": f"user{i}", "role": "member"}
                  for i in range(n_users)],
        "tags": [{"id": f"t{i}", "value": f"tag-{i}"}
                 for i in range(n_tags)],
    }
    records = spark.range(n_records).select(
        F.col("id").alias("__idx__"),
        F.parse_json(F.concat(
            F.lit('{"id": '), F.col("id").cast("string"),
            F.lit(', "user_id": '), (F.col("id") % (n_users + 10))
            .cast("string"),
            F.lit(', "tag_id": "t'), (F.col("id") % (n_tags + 10))
            .cast("string"), F.lit('"}'),
        )).alias("__record__"))

    rule = parse_rule_file(_LOOKUP_RULE)
    builder = Builder(records)
    compiled = RuleCompiler(rule, context=context).compile(
        builder, F.col("__record__"))
    out = (builder.df.withColumn("__keep__", compiled.keep)
           .filter("__keep__").select(compiled.out_json().alias("j")))
    return _timed_disp(out)


_TYPED_LOOKUP_RULE = """
version: 2
input: {format: json}
mappings:
  - target: id
    source: id
  - target: user_name
    expr:
      - lookup_first: ["@context.users", "id", "@input.user_id", "name"]
  - target: tags
    expr:
      - lookup: ["@context.tags", "id", "@input.tag_id", "value"]
"""


def _rule_engine_typed_lookup(spark, n_records: int = 10000,
                              n_users: int = 100,
                              n_tags: int = 100) -> float:
    """The same lookup workload over native typed columns through the
    typed fast path (compile-time hash maps, element_at probes)."""
    from rulemorph_spark.engine import transform_table

    context = {
        "users": [{"id": i, "name": f"user{i}", "role": "member"}
                  for i in range(n_users)],
        "tags": [{"id": f"t{i}", "value": f"tag-{i}"}
                 for i in range(n_tags)],
    }
    records = spark.range(n_records).select(
        F.col("id"),
        (F.col("id") % (n_users + 10)).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % (n_tags + 10)).cast("string"))
        .alias("tag_id"))
    out = transform_table(records, _TYPED_LOOKUP_RULE, context=context,
                          mode="typed")
    return _timed_disp(out)


_TYPED_RULE = """
version: 2
input: {format: json}
record_when: {gte: ["@input.l_quantity", 10]}
mappings:
  - target: okey
    source: l_orderkey
  - target: net
    expr:
      - "@input.l_discount"
      - coalesce: [0.0]
      - multiply: ["@input.l_extendedprice"]
      - round: [2]
  - target: flag_status
    expr: ["@input.l_returnflag", {concat: ["-", "@input.l_linestatus"]}]
  - target: qty_int
    source: l_quantity
    type: int
"""


def _rule_engine_typed(spark, sf_dir: str) -> float:
    """The reference's transform_simple workload shape
    (``benches/transform_bench.rs:86-96``) over a typed parquet table
    through the typed fast-path compiler (zero variant ops in-plan)."""
    from rulemorph_spark.engine import transform_table

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = transform_table(df, _TYPED_RULE, mode="typed")
    return _timed_disp(out)


if __name__ == "__main__":
    sys.exit(main())
