"""Lambda-trapped pandas-UDF ops route through the interpreter
(compiler/interp_bridge.py): deep_merge / object_(un)flatten / dynamic
pick/omit inside array-op bodies, {map:} step bodies, if-branches, or
operand args — positions where Spark forbids Python UDFs (round-8
find: these rules previously failed analysis with a misleading error;
the reference interprets them fine).  Every case compares the ENGINE
against the INTERPRETER oracle — results and error {kind, message,
path} alike."""

from __future__ import annotations

import json

import pytest

from rulemorph_spark import interp as I
from rulemorph_spark.engine import transform
from rulemorph_spark.errors import TransformEngineError


def _engine(spark, rule, records):
    try:
        return ("ok", transform(spark, rule,
                                input_text=json.dumps(records)))
    except TransformEngineError as e:
        return ("err", e.kind, e.message, e.path)


def _oracle(rule, records):
    try:
        return ("ok", I.transform(rule, input_text=json.dumps(records)))
    except I.InterpError as e:
        return ("err", e.kind, e.message, e.path)


CASES = [
    # deep_merge inside a {map:} step body — ok rows and an indexed
    # per-item error path
    ("""
version: 2
input: {format: json}
mappings:
  - target: out
    expr: ["@input.xs", {map: [{deep_merge: [{"z": 9}]}]}]
""", [{"xs": [{"a": 1}, {"b": {"c": 2}}]}]),
    ("""
version: 2
input: {format: json}
mappings:
  - target: out
    expr: ["@input.xs", {map: [{deep_merge: [{"z": 9}]}]}]
""", [{"xs": [{"a": 1}, 5]}]),
    # object_flatten inside a map OP body (v2 array op)
    ("""
version: 2
input: {format: json}
mappings:
  - target: out
    expr: ["@input.xs", {map: [{object_flatten: []}]}]
""", [{"xs": [{"a": {"b": 1}}, {"p.q": {"r": 2}}]}]),
    # object_unflatten nested under an if-branch
    ("""
version: 2
input: {format: json}
mappings:
  - target: out
    expr:
      - "@input.doc"
      - if:
          cond: {eq: [["@input.mode"], ["lit:un"]]}
          then: [$, {object_unflatten: []}]
""", [{"doc": {"a.b": 1, "c": 2}, "mode": "un"}]),
    # deep_merge as an operand ARG of a non-UDF op (compiles inside
    # the op's let lambda)
    ("""
version: 1
input: {format: json, json: {}}
mappings:
  - target: out
    expr:
      op: merge
      args:
        - {op: deep_merge, args: [{ref: "input.a"}, {ref: "input.b"}]}
        - {"k": true}
""", [{"a": {"x": {"y": 1}}, "b": {"x": {"z": 2}}}]),
    # dynamic pick (paths from data) inside a map body
    ("""
version: 2
input: {format: json}
mappings:
  - target: out
    expr: ["@input.xs", {map: [{pick: ["@input.fields"]}]}]
""", [{"xs": [{"a": 1, "b": 2}, {"a": 3, "c": 4}], "fields": ["a"]}]),
    # flatten error inside map: bracket key — per-item path
    ("""
version: 2
input: {format: json}
mappings:
  - target: out
    expr: ["@input.xs", {map: [{object_flatten: []}]}]
""", [{"xs": [{"ok": 1}, {"ba[d": 2}]}]),
]


@pytest.mark.parametrize("rule,records", CASES)
def test_engine_matches_interp(spark, rule, records):
    assert _engine(spark, rule, records) == _oracle(rule, records)


def test_top_level_udf_ops_stay_on_the_column_path(spark):
    """A direct deep_merge step must NOT take the interp fallback."""
    from rulemorph_spark.compiler.interp_bridge import needs_interp
    from rulemorph_spark.expr_ir import parse_expr

    pipe = parse_expr(["@input.a", {"deep_merge": [{"z": 1}]}])
    assert not needs_interp(pipe)
    pipe2 = parse_expr(["@input.xs", {"map": [{"deep_merge": [{"z": 1}]}]}])
    assert needs_interp(pipe2)


WHEN_CASES = [
    # deep_merge inside a when-condition's map body
    ("""
version: 2
input: {format: json}
mappings:
  - target: out
    when: {gt: [["@input.xs", {map: [{deep_merge: [{"w": 1}]}]}, {len: []}], [1]]}
    expr: ["lit:many"]
""", [{"xs": [{"a": 1}, {"b": 2}]}]),
    ("""
version: 2
input: {format: json}
mappings:
  - target: out
    when: {gt: [["@input.xs", {map: [{deep_merge: [{"w": 1}]}]}, {len: []}], [1]]}
    expr: ["lit:many"]
""", [{"xs": [{"a": 1}]}]),
    # erroring condition → warning + skip in both
    ("""
version: 2
input: {format: json}
mappings:
  - target: out
    when: {gt: [["@input.xs", {map: [{deep_merge: [{"w": 1}]}]}, {len: []}], [1]]}
    expr: ["lit:many"]
""", [{"xs": [{"a": 1}, 5]}]),
]


@pytest.mark.parametrize("rule,records", WHEN_CASES)
def test_when_conditions_match_interp(spark, rule, records):
    assert _engine(spark, rule, records) == _oracle(rule, records)
