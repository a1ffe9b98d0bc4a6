"""Ordering-comparison error split (VERDICT r5 #3).

The reference distinguishes two ExprErrors in ``compare_values_ord``
(``crates/rulemorph/src/v2_eval.rs:1150-1177``):

- ``"cannot compare missing values"`` (v2_eval.rs:1175) — either
  operand is *missing* (path absent); and
- ``"cannot compare values of different types"`` (v2_eval.rs:1169) —
  both operands are present values but neither both-numeric
  (f64-parseable, numeric strings included) nor both-string.  JSON
  ``null`` is a *value* in the reference's model, so ``null > 1`` is a
  different-types error, NOT a missing error.

Both engines must emit the exact wording: the variant engine carries
missing as SQL-NULL variant vs JSON null as variant-null; the typed
engine threads the static ``missing`` flag / runtime ``missing_when``
predicate into the error branch.
"""

from __future__ import annotations

import json

import pytest

from rulemorph_spark.engine import transform, transform_table
from rulemorph_spark.errors import RuleError, TransformEngineError

_ERRORS = (TransformEngineError, RuleError)

MISSING_MSG = "cannot compare missing values"
TYPES_MSG = "cannot compare values of different types"


def _if_gt(left, right):
    """expr that forces a STRICT ordering eval via an if step."""
    return [left, {"if": {"cond": {"gt": ["$", right]},
                          "then": ["lit:T"], "else": ["lit:F"]}}]


def _eval_err(spark, expr, record=None):
    rule = {"version": 2, "input": {"format": "json"},
            "mappings": [{"target": "out", "expr": expr}]}
    with pytest.raises(_ERRORS) as ei:
        transform(spark, json.dumps(rule),
                  input_text=json.dumps([record or {}]))
    return getattr(ei.value, "message", str(ei.value))


def _eval(spark, expr, record=None):
    rule = {"version": 2, "input": {"format": "json"},
            "mappings": [{"target": "out", "expr": expr}]}
    out = transform(spark, json.dumps(rule),
                    input_text=json.dumps([record or {}]))
    return out[0].get("out")


# --- variant engine (document transform) -------------------------------

def test_variant_missing_vs_value(spark):
    assert MISSING_MSG in _eval_err(spark, _if_gt("@input.absent", 1))


def test_variant_value_vs_missing(spark):
    expr = [5, {"if": {"cond": {"lt": ["$", "@input.absent"]},
                       "then": ["lit:T"], "else": ["lit:F"]}}]
    assert MISSING_MSG in _eval_err(spark, expr)


def test_variant_missing_vs_missing(spark):
    expr = ["@input.absent",
            {"if": {"cond": {"gte": ["$", "@input.gone"]},
                    "then": ["lit:T"], "else": ["lit:F"]}}]
    assert MISSING_MSG in _eval_err(spark, expr)


def test_variant_bool_vs_number(spark):
    assert TYPES_MSG in _eval_err(spark, _if_gt(True, 1))


def test_variant_bool_vs_bool(spark):
    # neither side is numeric or string → different-types, matching
    # the reference (bools have no ordering in compare_values_ord)
    assert TYPES_MSG in _eval_err(spark, _if_gt(True, False))


def test_variant_null_vs_number_is_types_not_missing(spark):
    # JSON null is a VALUE (present), so the missing branch must NOT
    # fire — v2_eval.rs reaches the :1169 error for (null, 1)
    msg = _eval_err(spark, _if_gt(None, 1))
    assert TYPES_MSG in msg
    assert MISSING_MSG not in msg


def test_variant_number_vs_nonnumeric_string(spark):
    # 5 parses, "abc" doesn't → numeric fails; 5 is not a string →
    # string fails → different-types (v2_eval.rs:1169)
    assert TYPES_MSG in _eval_err(spark, _if_gt(5, "abc"))


def test_variant_array_vs_number(spark):
    expr = [{"lit": [1, 2]},
            {"if": {"cond": {"gt": ["$", 0]},
                    "then": ["lit:T"], "else": ["lit:F"]}}]
    assert TYPES_MSG in _eval_err(spark, expr)


def test_variant_happy_paths_unchanged(spark):
    assert _eval(spark, _if_gt(5, 3)) == "T"
    assert _eval(spark, _if_gt("5", "a")) == "F"   # lexicographic
    assert _eval(spark, _if_gt("10", 9)) == "T"    # numeric strings


def test_variant_lenient_when_still_false(spark):
    # in a mapping `when`, the same error downgrades to skip (lenient)
    rule = {"version": 2, "input": {"format": "json"},
            "mappings": [{"target": "out", "expr": ["lit:x"],
                          "when": {"gt": ["@input.absent", 1]}}]}
    out = transform(spark, json.dumps(rule), input_text=json.dumps([{}]))
    assert out == [{}]


# --- typed engine (transform_table) -------------------------------------

_RULE = """
version: 2
input: {format: json}
mappings:
  - target: id
    source: id
  - target: out
    expr: [%s]
"""


def _typed_err(spark, df, expr, match):
    with pytest.raises(Exception, match=match):
        transform_table(df, _RULE % expr, mode="typed").collect()


def test_typed_static_missing_vs_value(spark):
    df = spark.createDataFrame([(1, 5)], "id long, n long")
    _typed_err(spark, df,
               '"@input.absent", {if: {cond: {gt: ["$", 1]}, '
               'then: ["lit:T"], else: ["lit:F"]}}',
               MISSING_MSG)


def test_typed_bool_vs_number(spark):
    df = spark.createDataFrame([(1, True)], "id long, flag boolean")
    _typed_err(spark, df,
               '"@input.flag", {if: {cond: {gt: ["$", 1]}, '
               'then: ["lit:T"], else: ["lit:F"]}}',
               TYPES_MSG)


def test_typed_null_vs_number_is_types_not_missing(spark):
    # a null literal is a present VALUE → different-types wording
    df = spark.createDataFrame([(1,)], "id long")
    _typed_err(spark, df,
               'null, {if: {cond: {gt: ["$", 1]}, '
               'then: ["lit:T"], else: ["lit:F"]}}',
               TYPES_MSG)


def test_typed_runtime_null_number_column_is_types(spark):
    # a NULL cell in a long column is JSON null (present), not missing
    df = spark.createDataFrame([(1, None)], "id long, n long")
    _typed_err(spark, df,
               '"@input.n", {if: {cond: {gt: ["$", 1]}, '
               'then: ["lit:T"], else: ["lit:F"]}}',
               TYPES_MSG)


def test_typed_number_vs_nonnumeric_string(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, s string")
    _typed_err(spark, df,
               '"@input.s", {if: {cond: {lt: ["$", 3]}, '
               'then: ["lit:T"], else: ["lit:F"]}}',
               TYPES_MSG)


def test_typed_happy_paths_unchanged(spark):
    df = spark.createDataFrame([(1, 5), (2, 1)], "id long, n long")
    out = transform_table(
        df, _RULE % ('"@input.n", {if: {cond: {gt: ["$", 3]}, '
                     'then: ["lit:T"], else: ["lit:F"]}}'),
        mode="typed")
    got = {r["id"]: r["out"] for r in out.collect()}
    assert got == {1: "T", 2: "F"}
