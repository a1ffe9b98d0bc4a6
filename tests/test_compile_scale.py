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
    assert time.time() - t0 < 120
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
    assert time.time() - t0 < 60
    assert out == [{"out": "x" + "y-" * depth}]


def test_long_out_chain_variant_and_typed(spark):
    n = 40
    rule = _out_chain_rule(n)
    df = spark.createDataFrame([(0.0,)], "x double")
    t0 = time.time()
    typed = transform_table(df, rule, mode="typed").collect()[0]
    variant_row = transform_table(df, rule, mode="variant") \
        .selectExpr(f"to_json(c{n - 1}) AS v").collect()[0]
    assert time.time() - t0 < 120
    assert typed[f"c{n - 1}"] == float(n)
    assert json.loads(variant_row["v"]) == float(n)
