"""Ports of the reference's five inline (non-fixture) test modules.

The fixture corpus (``transform_golden.rs``) runs in
``test_golden_reference.py``; these five suites live as standalone Rust
integration tests and were the last reference test modules with no repo
mirror (round-5 sweep):

- ``crates/rulemorph/tests/v1_pipe_ref.rs``
- ``crates/rulemorph/tests/v2_conditions.rs``
- ``crates/rulemorph/tests/v2_lookup_missing.rs``
- ``crates/rulemorph/tests/v2_map_op.rs``
- ``crates/rulemorph/tests/v2_missing.rs``

Each test carries the reference rule YAML / input / expectation
verbatim (they are semantics specs, not code) and asserts the same
output plus an empty warning channel where the reference does.
"""

from __future__ import annotations

import pytest

from rulemorph_spark.engine import transform, transform_with_warnings
from rulemorph_spark.errors import RuleError, TransformEngineError

pytestmark = pytest.mark.smoke


def _run(spark, yaml: str, input_text: str):
    out, warnings = transform_with_warnings(spark, yaml,
                                            input_text=input_text)
    assert warnings == [], f"unexpected warnings: {warnings!r}"
    return out


# --- v1_pipe_ref.rs ------------------------------------------------------

def test_v1_pipe_ref_outside_pipe_errors(spark):
    """``pipe.*`` refs are only valid inside a pipe (v1_pipe_ref.rs:4-21)."""
    yaml = """
version: 1
input:
  format: json
  json: {}
mappings:
  - target: "value"
    expr:
      ref: "pipe.value"
"""
    # a TRANSFORM ExprError, like the reference (round 9 parse-error
    # channel: expression parse failures are eval-channel errors)
    with pytest.raises(TransformEngineError) as exc_info:
        transform(spark, yaml, input_text='{ "id": 1 }')
    err = exc_info.value
    assert err.kind == "ExprError"
    assert err.message == "pipe is only available within v2 pipes"
    assert err.path == "mappings[0].expr"


# --- v2_conditions.rs ----------------------------------------------------

def test_v2_record_when_condition_object_is_evaluated(spark):
    yaml = """
version: 2
input:
  format: json
record_when:
  eq: ["@input.active", true]
mappings:
  - target: "name"
    source: "name"
"""
    out = _run(spark, yaml, '[{ "name": "aaa", "active": true }]')
    assert out == [{"name": "aaa"}]


def test_v2_mapping_when_condition_object_is_evaluated(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: "name"
    source: "name"
    when:
      gt: ["@input.score", 10]
"""
    out = _run(spark, yaml, '[{ "name": "aaa", "score": 20 }]')
    assert out == [{"name": "aaa"}]


# --- v2_lookup_missing.rs ------------------------------------------------

def test_v2_lookup_first_missing_pipe_defaults(spark):
    """A missing pipe seed (``@input.users`` absent) propagates through
    ``lookup_first`` to the mapping default (v2_lookup_missing.rs:4-27)."""
    yaml = """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "user_name"
    expr:
      - "@input.users"
      - lookup_first:
        - id
        - "@input.user_id"
        - name
    default: "unknown"
"""
    out = _run(spark, yaml, '[{ "user_id": 1 }]')
    assert out == [{"user_name": "unknown"}]


def test_v2_lookup_missing_pipe_defaults(spark):
    yaml = """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "users"
    expr:
      - "@input.users"
      - lookup:
        - id
        - "@input.user_id"
        - name
    default: ["missing"]
"""
    out = _run(spark, yaml, '[{ "user_id": 1 }]')
    assert out == [{"users": ["missing"]}]


# --- v2_map_op.rs --------------------------------------------------------

def test_v2_map_op_missing_input_propagates(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: "values"
    expr:
      - "@input.items"
      - { op: "map", args: ["@item.value"] }
    default: ["default"]
"""
    out = _run(spark, yaml, '[{ "id": 1 }]')
    assert out == [{"values": ["default"]}]


def test_v2_map_op_drops_missing_results(spark):
    """Per-element missing results vanish from the mapped array
    (v2_map_op.rs:24-43)."""
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: "values"
    expr:
      - "@input.items"
      - { op: "map", args: [["@item", { op: "get", args: ["value"] }]] }
"""
    out = _run(spark, yaml,
               '[{ "items": [{"value": 1}, {"other": 2}, {"value": 3}] }]')
    assert out == [{"values": [1, 3]}]


# --- v2_missing.rs -------------------------------------------------------

def test_v2_missing_string_op_propagates_to_default(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: "name"
    expr:
      - "@input.name"
      - trim
    default: "unknown"
"""
    out = _run(spark, yaml, '[{ "id": 1 }]')
    assert out == [{"name": "unknown"}]


def test_v2_missing_number_op_propagates_to_default(spark):
    yaml = """
version: 2
input:
  format: json
mappings:
  - target: "amount"
    expr:
      - "@input.amount"
      - add: [1]
    default: 0
"""
    out = _run(spark, yaml, '[{ "id": 1 }]')
    assert out == [{"amount": 0}]
