"""String-op SQL-function fast path (round 9): cross-path parity.

The string/stringify ops (trim/lowercase/uppercase, to_string, concat,
split, pad_start/pad_end, replace, to_base) compile to session SQL
functions outside lambda scopes (compiler/ops_string_sql.py) and keep
the inline Column path for lambda contexts / step-bearing args.  Every
case runs BOTH paths (sqlfn enabled vs disabled) and both must agree
value-for-value and error-for-error — the drift detector for the dual
implementation, covering every protocol branch: missing short-circuit,
variant-null wording, type errors, the serde/Rust float renderings,
mode dispatch, and boundary values.
"""

from __future__ import annotations

import json

import pytest

from rulemorph_spark.compiler import sqlfn
from rulemorph_spark.engine import transform
from rulemorph_spark.errors import TransformEngineError


def _run(spark, rule, record):
    try:
        return ("ok", transform(spark, rule,
                                input_text=json.dumps([record])))
    except TransformEngineError as e:
        return ("err", e.kind, e.message, e.path)


def _both(spark, rule, record):
    fast = _run(spark, rule, record)
    sqlfn.disable(spark)
    try:
        slow = _run(spark, rule, record)
    finally:
        sqlfn.enable(spark)
    assert fast == slow, (rule, record, fast, slow)
    return fast


def _v2(expr):
    return (f"version: 2\ninput: {{format: json}}\nmappings:\n"
            f"  - target: out\n    expr: {json.dumps(expr)}\n")


def _v1(expr):
    return (f"version: 1\ninput: {{format: json, json: {{}}}}\n"
            f"mappings:\n  - target: out\n"
            f"    expr: {json.dumps(expr)}\n")


REC = {"s": "  aB c ", "t": "aXbXc", "n": 7, "f": 2.5, "neg": -255,
       "big": 1.23e21, "tiny": 1.5e-7, "intf": 2.0, "b": True,
       "arr": [1], "obj": {"k": 1}, "nul": None, "csv": "a,b,,c",
       "pat": "X", "rep": "-", "num_s": "42", "huge": 2 ** 60,
       "nzero": -0.0, "exp16": 1e16, "e_m4": 1e-4, "sci": 1.23e-7}

V2_CASES = [
    # unary string (native v2: numbers/bools stringify, containers err)
    ["@input.s", {"trim": []}],
    ["@input.n", {"trim": []}],
    ["@input.f", {"uppercase": []}],
    ["@input.b", {"lowercase": []}],
    ["@input.arr", {"trim": []}],          # expected string, got [..]
    ["@input.nul", {"trim": []}],          # expected string, got Null
    ["@input.nope", {"trim": []}],         # missing short-circuit
    # to_string v2: never errors, serde Display
    ["@input.intf", {"to_string": []}],    # 2.0 keeps .0
    ["@input.big", {"to_string": []}],     # bare-e scientific
    ["@input.sci", {"to_string": []}],
    ["@input.huge", {"to_string": []}],    # 2^60 ryu-shortest
    ["@input.nzero", {"to_string": []}],
    ["@input.exp16", {"to_string": []}],
    ["@input.e_m4", {"to_string": []}],
    ["@input.arr", {"to_string": []}],     # containers → JSON text
    ["@input.nul", {"to_string": []}],     # "null"
    # concat v2
    ["@input.s", {"concat": ["@input.f", "@input.b"]}],
    ["@input.s", {"concat": ["@input.arr"]}],
    ["@input.nope", {"concat": ["x"]}],
    ["@input.s", {"concat": ["@input.nul"]}],
    # delegated v1 string ops in v2 pipes
    ["@input.csv", {"split": [","]}],
    ["@input.csv", {"split": [""]}],       # empty delimiter error
    ["@input.csv", {"split": ["@input.n"]}],   # delim must be string
    ["@input.t", {"split": ["X"]}],
    ["@input.num_s", {"pad_start": [5]}],
    ["@input.num_s", {"pad_start": [5, "xy"]}],
    ["@input.num_s", {"pad_start": [1]}],      # value longer than len
    ["@input.num_s", {"pad_end": [5, ""]}],    # empty pad → unchanged
    ["@input.num_s", {"pad_start": [-1]}],     # negative length error
    ["@input.num_s", {"pad_start": ["@input.f"]}],  # non-int length
    ["@input.t", {"replace": ["X", "-"]}],     # literal FIRST only
    ["@input.t", {"replace": ["X", "-", "all"]}],
    ["@input.t", {"replace": ["[a-z]", "*", "regex"]}],
    ["@input.t", {"replace": ["[a-z]", "*", "regex_all"]}],
    ["@input.t", {"replace": ["X", "-", "bogus"]}],   # mode error
    ["@input.t", {"replace": ["", "-"]}],      # empty pattern prepends
    ["@input.neg", {"to_base": [16]}],
    ["@input.n", {"to_base": [2]}],
    ["@input.n", {"to_base": [37]}],           # base range error
    ["@input.n", {"to_base": ["@input.f"]}],   # base must be integer
    ["@input.f", {"to_base": [16]}],           # value must be integer
    ["@input.num_s", {"to_base": [16]}],       # i64-string accepted
]

V1_CASES = [
    # v1 to_string: integral trim + Rust {} float rendering
    {"op": "to_string", "args": [{"ref": "input.intf"}]},   # "2"
    {"op": "to_string", "args": [{"ref": "input.big"}]},
    {"op": "to_string", "args": [{"ref": "input.nzero"}]},  # "-0"
    {"op": "to_string", "args": [{"ref": "input.arr"}]},    # error
    {"op": "concat", "args": [{"ref": "input.s"},
                              {"ref": "input.intf"}]},
    {"op": "concat", "args": [{"ref": "input.s"},
                              {"ref": "input.nul"}]},  # v1 null wording
    {"op": "trim", "args": [{"ref": "input.n"}]},      # v1: strings only
    {"chain": [{"ref": "input.csv"},
               {"op": "split", "args": [","]}]},
    {"chain": [{"ref": "input.num_s"},
               {"op": "pad_start", "args": [5, "0"]}]},
    {"chain": [{"ref": "input.t"},
               {"op": "replace", "args": ["X", "-", "regex"]}]},
    {"chain": [{"ref": "input.neg"},
               {"op": "to_base", "args": [36]}]},
]


@pytest.mark.parametrize("expr", V2_CASES,
                         ids=[f"v2-{i}" for i in range(len(V2_CASES))])
def test_v2_cross_path_parity(spark, expr):
    _both(spark, _v2(expr), REC)


@pytest.mark.parametrize("expr", V1_CASES,
                         ids=[f"v1-{i}" for i in range(len(V1_CASES))])
def test_v1_cross_path_parity(spark, expr):
    _both(spark, _v1(expr), REC)


def test_lambda_scope_falls_back(spark):
    """Inside a map body the op must take the Column path (SQL-function
    args can't reference lambda variables) and still agree with the
    top-level result."""
    rule = _v2([[" x ", "y "],
                {"map": [{"op": "trim", "args": []}]}])
    out = _run(spark, rule, REC)
    assert out == ("ok", [{"out": ["x", "y"]}])


def test_step_bearing_arg_falls_back(spark):
    """A computed (step-bearing) argument needs the Column path's
    absent-guard machinery — the SQL gate must decline, and both paths
    agree end-to-end anyway."""
    expr = ["@input.num_s", {"pad_start": [["@input.n", {"+": [1]}]]}]
    _both(spark, _v2(expr), REC)


def test_lambda_free_rule_codegens_end_to_end(spark):
    """The round-9 goal (VERDICT r8 next #2): a variant rule using only
    string-family sqlfn ops compiles to a projection with ZERO lambda
    expressions, running entirely inside whole-stage codegen (arith
    keeps its eager-let lambdas and stays the documented exception)."""
    import json as _json

    from pyspark.sql import functions as F

    from rulemorph_spark.compiler.rule import Builder, RuleCompiler
    from rulemorph_spark.functions.diag import codegen_state, physical_plan
    from rulemorph_spark.model import parse_rule_file

    rule_text = """
version: 2
input: {format: json}
mappings:
  - target: a
    expr: ["@input.s", {trim: []}, {uppercase: []}, {concat: ["!"]}]
  - target: b
    expr: ["@input.s", {split: ["-"]}]
  - target: d
    expr: ["@input.s", {pad_start: [10, "0"]}, {replace: ["0", "x", "all"]}]
  - target: e
    expr: ["@input.n", {to_base: [16]}]
  - target: f
    expr: ["@input.n", {to_string: []}]
"""
    record = _json.dumps({"s": " ab-cd ", "n": 41})
    records = spark.range(10).select(
        F.col("id").alias("__idx__"),
        F.parse_json(F.lit(record)).alias("__record__"))
    rule = parse_rule_file(rule_text)
    builder = Builder(records)
    compiled = RuleCompiler(rule).compile(builder, F.col("__record__"))
    out = (builder.df.withColumn("__keep__", compiled.keep)
           .filter("__keep__").select(compiled.out_json().alias("j")))
    plan = physical_plan(out)
    assert "lambdafunction" not in plan, plan[:2000]
    st = codegen_state(out)
    assert not st["nodes_interpreted"], st
    assert any("Project" in n for n in st["nodes_in_codegen"]), st
