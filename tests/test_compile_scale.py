"""Compile-scale regression guards: the expression-tree-linearity
mechanisms (README "Expression-tree discipline") keep deep pipes and
long @out chains compilable. If an op starts inlining operands
naively, these rules explode exponentially during analysis — the tests
would hang/OOM rather than merely slow down.
"""

from __future__ import annotations

import json
import time

from rulemorph_spark.engine import transform, transform_table


def _deep_pipe_rule(depth: int) -> str:
    steps = "".join(f'      - add: [{i % 3 + 1}]\n'
                    f'      - multiply: [1.0]\n' for i in range(depth))
    return ("version: 2\n"
            "input: {format: json}\n"
            "mappings:\n"
            "  - target: out\n"
            "    expr:\n"
            '      - "@input.x"\n' + steps +
            "      - round: [2]\n")


def _out_chain_rule(n: int) -> str:
    lines = ["version: 2", "input: {format: json}", "mappings:",
             "  - target: c0", "    expr: [\"@input.x\", {add: [1]}]"]
    for i in range(1, n):
        lines += [f"  - target: c{i}",
                  f"    expr: [\"@out.c{i - 1}\", {{add: [1]}}]"]
    return "\n".join(lines) + "\n"


def test_deep_pipe_compiles_and_runs(spark):
    depth = 25  # 50 op steps in one pipe
    rule = _deep_pipe_rule(depth)
    t0 = time.time()
    out = transform(spark, rule, input_text=json.dumps([{"x": 0}]))
    assert time.time() - t0 < 240
    expected = 0.0
    for i in range(depth):
        expected = (expected + (i % 3 + 1)) * 1.0
    assert out == [{"out": expected}]


def _nested_v1_concat(depth: int):
    """Right-nested v1 {op,args} tree: every level adds a computed
    (step-bearing) operand in a NON-first position — the shape that
    inlined the whole sub-tree per reference before ``_operands_bound``
    (ops_scalar.py) let-bound step-bearing args (plans grew ~16× per
    level and died at depth 4)."""
    expr = {"ref": "input.a"}
    for _ in range(depth):
        expr = {"op": "concat",
                "args": [expr,
                         {"op": "concat", "args": [{"ref": "input.b"}, "-"]}]}
    return expr


def test_nested_v1_operand_tree_compiles_and_runs(spark):
    depth = 8
    rule = {"version": 1, "input": {"format": "json", "json": {}},
            "mappings": [{"target": "out", "expr": _nested_v1_concat(depth)}]}
    t0 = time.time()
    out = transform(spark, json.dumps(rule),
                    input_text='{"a": "x", "b": "y"}')
    assert time.time() - t0 < 180
    assert out == [{"out": "x" + "y-" * depth}]


def test_long_out_chain_variant_and_typed(spark):
    n = 40
    rule = _out_chain_rule(n)
    df = spark.createDataFrame([(0.0,)], "x double")
    t0 = time.time()
    typed = transform_table(df, rule, mode="typed").collect()[0]
    variant_row = transform_table(df, rule, mode="variant") \
        .selectExpr(f"to_json(c{n - 1}) AS v").collect()[0]
    assert time.time() - t0 < 240
    assert typed[f"c{n - 1}"] == float(n)
    assert json.loads(variant_row["v"]) == float(n)


def _plan_len(df, rule) -> int:
    out = transform_table(df, rule, mode="variant")
    return len(out._jdf.queryExecution().analyzed().toString())


def test_nested_object_args_grow_linearly(spark):
    """VERDICT r5 #6: right-nested v1 ``merge`` args must grow the
    plan LINEARLY per nesting level (the scalar-op exponential class
    fixed by _operands_bound must not exist for object ops)."""
    df = spark.createDataFrame([(1, {"a": 1})],
                               "id long, obj struct<a:long>")

    def nested(depth):
        expr = {"ref": "input.obj"}
        for _ in range(depth):
            expr = {"op": "merge",
                    "args": [expr, {"op": "merge",
                                    "args": [{"ref": "input.obj"},
                                             {"z": 1}]}]}
        return expr

    sizes = []
    for depth in (1, 2, 4, 8):
        rule = json.dumps({"version": 1, "input": {"format": "json"},
                           "mappings": [{"target": "out",
                                         "expr": nested(depth)}]})
        sizes.append(_plan_len(df, rule))
    # linear: per-level increment stays flat (exponential would give
    # a depth-8 increment ~16^4× the depth-1→2 one)
    inc12 = sizes[1] - sizes[0]
    inc48 = (sizes[3] - sizes[2]) / 4
    assert inc48 < 2 * inc12, sizes


def test_nested_array_hof_args_grow_linearly(spark):
    """Same guarantee for v2 array HOF chains (filter+map per level)."""
    df = spark.createDataFrame([(1, [1, 2, 3])],
                               "id long, arr array<long>")

    def chain(depth):
        e = '"@input.arr"'
        for _ in range(depth):
            e += ', {filter: [["@item", {gt: [0]}]]}, {map: [{add: [1]}]}'
        return e

    sizes = []
    for depth in (1, 2, 4, 8):
        rule = ("version: 2\ninput: {format: json}\nmappings:\n"
                f"  - target: out\n    expr: [{chain(depth)}]\n")
        sizes.append(_plan_len(df, rule))
    inc12 = sizes[1] - sizes[0]
    inc48 = (sizes[3] - sizes[2]) / 4
    assert inc48 < 2 * inc12, sizes


def test_typed_deep_chain_falls_back_not_oom(spark):
    """Typed pipes compose raw Columns, so each op references the
    previous value 2+ times — deep chains grow multiplicatively and
    used to OOM Spark analysis at depth ~4-8 (latent pre-round-6,
    fuzz-surfaced).  compile_tpipe now defers to the variant engine
    (linear via V.let) past a plan-size cap; auto mode must run these
    chains correctly and fast."""
    import pytest

    from rulemorph_spark.compiler.typed import TypedFallback

    df = spark.createDataFrame([(1, 0.0)], "id long, x double")
    expr = '"@input.x"'
    expected = 0.0
    for i in range(25):
        expr += f', {{add: [{i % 3 + 1}]}}, {{multiply: [1.0]}}'
        expected = (expected + (i % 3 + 1)) * 1.0
    rule = ("version: 2\ninput: {format: json}\nmappings:\n"
            f"  - target: out\n    expr: [{expr}]\n")
    with pytest.raises(TypedFallback, match="expression growth"):
        transform_table(df, rule, mode="typed")
    t0 = time.time()
    from pyspark.sql import functions as F
    out = transform_table(df, rule, mode="auto") \
        .select(F.col("out").cast("double").alias("out")).collect()
    assert time.time() - t0 < 240
    assert out[0]["out"] == expected


def test_extended_anchor_plan_budget(spark):
    """Round-8 pin (VERDICT r7 #1): the t13 extended-rule anchor's
    analyzed plan must stay bounded so a future correctness push can't
    silently re-bloat it (r7 history: per-site probe chains doubled
    the plan — 864k chars — and with it compile AND per-row cost; the
    round-8 let-binding work brought it to ~150k).  Budgets leave ~60%
    headroom over the current size; a 2× regression trips them."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from rulemorph_spark.compiler.rule import Builder, RuleCompiler
    from rulemorph_spark.model import parse_rule_file

    fixture = ("/root/reference/crates/rulemorph/tests/fixtures/"
               "t13_expr_extended/rules.yaml")
    if not os.path.exists(fixture):
        import pytest
        pytest.skip("reference fixture tree unavailable")
    record = _json.dumps({
        "text": "abc-123-abc", "regex_text": "a1b2c3", "csv": "a,b,c",
        "pad": "7", "num_a": 80.6, "num_b": "2.5", "num_c": 3,
        "base_value": 255, "date_simple": "2024-01-02 03:04:05",
        "date_tz": "2024-01-02T03:04:05+09:00",
        "unix_s": "1970-01-01T00:00:01Z",
        "unix_ms": "1970-01-01T00:00:00.123Z"})
    records = spark.range(10).select(
        F.col("id").alias("__idx__"),
        F.parse_json(F.lit(record)).alias("__record__"))
    with open(fixture, encoding="utf-8") as fh:
        rule = parse_rule_file(fh.read())
    builder = Builder(records)
    compiled = RuleCompiler(rule).compile(builder, F.col("__record__"))
    out = (builder.df.withColumn("__keep__", compiled.keep)
           .filter("__keep__").select(compiled.out_json().alias("j")))
    plan = out._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 250_000, \
        f"t13 analyzed plan re-bloated: {len(plan)} chars"
    # the historical blow-up mode was one mapping going multiplicative
    # (the nested-arith mapping alone was 430k chars pre-round-8)
    an = out._jdf.queryExecution().analyzed()
    node, biggest = an, 0
    while True:
        if node.getClass().getSimpleName() == "Project":
            exprs = node.projectList()
            for i in range(exprs.size()):
                biggest = max(biggest, len(exprs.apply(i).toString()))
        ch = node.children()
        if ch.size() == 0:
            break
        node = ch.apply(0)
    assert biggest < 100_000, \
        f"one t13 mapping went multiplicative again: {biggest} chars"


def test_fast_columns_reentrant_and_threaded():
    """ADVICE r8 #2: fast_columns suspends a process-wide pyspark
    global — the suspension must be refcounted so nested and
    overlapping uses restore the ORIGINAL value only at the outermost
    exit (no stale restores from interleaved enter/exit)."""
    import threading
    import pyspark.errors.utils as eu
    from rulemorph_spark.compiler.core import fast_columns

    original = eu._enable_debugging_cache

    # nested: inner exit must NOT restore while outer is active
    with fast_columns():
        assert eu._enable_debugging_cache is False
        with fast_columns():
            assert eu._enable_debugging_cache is False
        assert eu._enable_debugging_cache is False
    assert eu._enable_debugging_cache == original

    # interleaved from two threads: whatever the overlap order, the
    # flag ends back at the original value
    enter = threading.Barrier(2)
    mid = threading.Barrier(2)

    def worker():
        with fast_columns():
            enter.wait(timeout=10)
            assert eu._enable_debugging_cache is False
            mid.wait(timeout=10)

    ts = [threading.Thread(target=worker) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert eu._enable_debugging_cache == original
