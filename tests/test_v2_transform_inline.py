"""Port of the reference's inline ``transform.rs v2_transform_tests``
(transform.rs:6273-6563) plus the engine-visible cases from the
``v2_parser.rs`` rulefile-parser suites (v2_parser.rs:1124-1385) —
parser semantics asserted through full transforms rather than IR
introspection.
"""

from __future__ import annotations

import json

import pytest

from rulemorph_spark.engine import transform
from rulemorph_spark.errors import RuleError, TransformEngineError

pytestmark = pytest.mark.smoke

_ERRORS = (TransformEngineError, RuleError)


def _run(spark, yaml: str, input_obj, context=None):
    return transform(spark, yaml, input_text=json.dumps(input_obj),
                     context=context)


# --- transform.rs v2_transform_tests ------------------------------------

def test_v2_simple_ref_transform(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: user_name
    expr:
      - "@input.name"
"""
    assert _run(spark, yaml, [{"name": "Alice"}]) == \
        [{"user_name": "Alice"}]


def test_v2_scalar_ref_transform(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: user_name
    expr: "@input.name"
"""
    assert _run(spark, yaml, [{"name": "Alice"}]) == \
        [{"user_name": "Alice"}]


def test_v2_literal_object_with_lookup_key_is_literal(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: payload
    expr:
      lookup: 1
"""
    assert _run(spark, yaml, [{"id": 1}]) == \
        [{"payload": {"lookup": 1}}]


def test_v2_pipe_with_ops_transform(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: name
    expr:
      - "@input.name"
      - trim
      - uppercase
"""
    assert _run(spark, yaml, [{"name": "  alice  "}]) == \
        [{"name": "ALICE"}]


def test_v2_context_ref_transform(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: rate
    expr:
      - "@context.rate"
"""
    assert _run(spark, yaml, [{"id": 1}], context={"rate": 1.5}) == \
        [{"rate": 1.5}]


def test_v2_out_ref_transform(spark):
    """A bare non-@ string at pipe start is a plain literal."""
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: first_name
    expr:
      - "@input.name"
  - target: greeting
    expr:
      - "Hello, "
      - concat: ["@out.first_name"]
"""
    assert _run(spark, yaml, [{"name": "Bob"}]) == \
        [{"first_name": "Bob", "greeting": "Hello, Bob"}]


def test_v2_with_let_step_transform(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: total
    expr:
      - "@input.price"
      - let: { base: "$" }
      - multiply: [1.1]
"""
    out = _run(spark, yaml, [{"price": 100}])
    assert abs(out[0]["total"] - 110.0) < 0.001


def test_v2_with_if_step_transform(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: discount
    expr:
      - "@input.total"
      - if:
          cond:
            gt: ["$", 1000]
          then:
            - "$"
            - multiply: [0.9]
          else:
            - "$"
"""
    out = _run(spark, yaml, [{"total": 2000}, {"total": 500}])
    assert abs(out[0]["discount"] - 1800.0) < 0.001
    assert abs(out[1]["discount"] - 500.0) < 0.001


def test_v2_with_map_step_transform(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: items
    expr:
      - "@input.values"
      - map:
        - multiply: [2]
"""
    out = _run(spark, yaml, [{"values": [1, 2, 3]}])
    assert out == [{"items": [2.0, 4.0, 6.0]}]
    assert all(isinstance(x, float) for x in out[0]["items"])


def test_v2_v1_mixed_mappings(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: name
    source: name
  - target: upper_name
    expr:
      - "@input.name"
      - uppercase
"""
    assert _run(spark, yaml, [{"name": "alice"}]) == \
        [{"name": "alice", "upper_name": "ALICE"}]


def test_v2_lookup_first_transform(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: dept_name
    expr:
      - lookup_first:
        - "@context.departments"
        - id
        - "@input.dept_id"
        - name
"""
    ctx = {"departments": [
        {"id": 1, "name": "Engineering"},
        {"id": 2, "name": "Marketing"},
        {"id": 3, "name": "Sales"},
    ]}
    assert _run(spark, yaml, [{"dept_id": 2}], context=ctx) == \
        [{"dept_name": "Marketing"}]


def test_v2_lookup_first_with_pipe_value_transform(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: dept_name
    expr:
      - "@context.departments"
      - lookup_first:
        - id
        - "@input.dept_id"
        - name
"""
    ctx = {"departments": [
        {"id": 1, "name": "Engineering"},
        {"id": 2, "name": "Marketing"},
        {"id": 3, "name": "Sales"},
    ]}
    assert _run(spark, yaml, [{"dept_id": 2}], context=ctx) == \
        [{"dept_name": "Marketing"}]


def test_v1_rules_still_work(spark):
    yaml = """
version: 1
input:
  format: json
mappings:
  - target: name
    source: name
  - target: upper
    expr:
      op: uppercase
      args:
        - { ref: input.name }
"""
    assert _run(spark, yaml, [{"name": "test"}]) == \
        [{"name": "test", "upper": "TEST"}]


# --- v2_parser.rs rulefile suites, engine-visible cases ------------------

def _expr_rule(expr_yaml: str) -> str:
    return ("version: 2\ninput:\n  format: json\nmappings:\n"
            "  - target: out\n    expr:\n" + expr_yaml)


def test_parser_literal_object_start_pipe(spark):
    """``[{foo: 1}, keys]``: a literal object start feeding steps
    (v2_parser.rs:1162)."""
    yaml = _expr_rule("      - { foo: 1 }\n      - keys\n")
    assert _run(spark, yaml, [{}]) == [{"out": ["foo"]}]


def test_parser_literal_object_with_op_key_start_pipe(spark):
    """``[{op: x}, keys]``: object starts are never coerced into steps
    even when they carry an ``op`` key (v2_parser.rs:1181)."""
    yaml = _expr_rule('      - { op: "x" }\n      - keys\n')
    assert _run(spark, yaml, [{}]) == [{"out": ["op"]}]


def test_parser_single_step_comparison_alias(spark):
    """``[{gt: 80}]``: a single-element pipe whose only element is an
    alias-comparison object is a step over the (missing) pipe value —
    engine-visible as a missing result (v2_parser.rs:1256)."""
    yaml = _expr_rule("      - { gt: [80] }\n")
    assert _run(spark, yaml, [{}]) == [{}]


def test_parser_v1_fallback_op_in_pipe(spark):
    """``["@input.name", {op: uppercase, args: []}]``: v1-style op
    objects are steps inside v2 pipes (v2_parser.rs:1239)."""
    yaml = _expr_rule('      - "@input.name"\n'
                      '      - { op: uppercase, args: [] }\n')
    assert _run(spark, yaml, [{"name": "bob"}]) == [{"out": "BOB"}]


def test_parser_if_with_inline_condition(spark):
    """``{if: {gt: [...]}, then: ..., else: ...}`` — the condition may
    be the direct value of ``if`` with then/else as sibling keys
    (v2_parser.rs:1309)."""
    yaml = _expr_rule(
        '      - "@input.amount"\n'
        '      - if: { gt: ["$", 10000] }\n'
        "        then: [{ op: multiply, args: [0.9] }]\n"
        '        else: ["$"]\n')
    out = _run(spark, yaml, [{"amount": 20000}, {"amount": 5}])
    assert abs(out[0]["out"] - 18000.0) < 0.001
    assert out[1]["out"] == 5


def test_parser_empty_pipe_error(spark):
    """An empty pipe array is a parse error (v2_parser.rs:806)."""
    yaml = _expr_rule("      []\n")
    with pytest.raises(_ERRORS):
        _run(spark, yaml, [{}])


def test_parser_invalid_at_ref_error(spark):
    """``@foo-bar`` is an invalid v2 start (v2_parser.rs:1232)."""
    yaml = _expr_rule('      - "@foo-bar"\n')
    with pytest.raises(_ERRORS):
        _run(spark, yaml, [{}])


def test_parser_literal_escape(spark):
    """``lit:@input.name`` is the literal string, not a ref
    (v2_parser.rs:704, is_v2_expr table :1351)."""
    yaml = _expr_rule('      - "lit:@input.name"\n')
    assert _run(spark, yaml, [{"name": "x"}]) == \
        [{"out": "@input.name"}]
