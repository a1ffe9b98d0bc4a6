"""Port of the reference's inline ``v2_eval.rs`` test corpus.

The reference keeps ~110 semantic unit tests INSIDE
``crates/rulemorph/src/v2_eval.rs`` (modules ``v2_ref_eval_tests``,
``v2_start_eval_tests``, ``v2_op_step_eval_tests``,
``v2_let_step_eval_tests``, ``v2_if_step_eval_tests``,
``v2_map_step_eval_tests``, ``v2_pipe_eval_tests``,
``v2_lookup_eval_tests``) — none of which ship as fixtures, so the
golden runner never sees them.  This module mirrors every case that
expresses an engine-visible behavior, driving each through a one-mapping
v2 rule (the evaluator entry this engine exposes).  The
``v2_eval_context_tests`` module (Rust context-plumbing accessors) has
no engine-visible surface and is intentionally not mirrored.

Where the reference asserts an f64 result (v2 arithmetic is raw f64 —
``json!(15.0)`` etc.), the test also pins Python ``float`` type, since
``2.0 == 2`` would otherwise hide an integer re-emission divergence.
"""

from __future__ import annotations

import json

import pytest

from rulemorph_spark.engine import transform
from rulemorph_spark.errors import RuleError, TransformEngineError

pytestmark = pytest.mark.smoke

MISSING = object()
_ERRORS = (TransformEngineError, RuleError)


def _transform(spark, mappings, record, context=None):
    rule = {"version": 2, "input": {"format": "json"}, "mappings": mappings}
    return transform(spark, json.dumps(rule),
                     input_text=json.dumps([record]), context=context)


def _eval(spark, expr, record=None, context=None):
    out = _transform(spark, [{"target": "out", "expr": expr}],
                     record if record is not None else {}, context)
    assert len(out) == 1
    return out[0].get("out", MISSING)


def _eval_err(spark, expr, record=None, context=None):
    with pytest.raises(_ERRORS) as ei:
        _transform(spark, [{"target": "out", "expr": expr}],
                   record if record is not None else {}, context)
    return ei.value


def _is_float(x) -> bool:
    return isinstance(x, float) and not isinstance(x, bool)


# =======================================================================
# v2_ref_eval_tests (v2_eval.rs:393-620)
# =======================================================================

def test_ref_input(spark):
    assert _eval(spark, "@input.name",
                 {"name": "Alice", "age": 30}) == "Alice"


def test_ref_input_nested(spark):
    assert _eval(spark, "@input.user.profile.name",
                 {"user": {"profile": {"name": "Bob"}}}) == "Bob"


def test_ref_input_missing(spark):
    assert _eval(spark, "@input.nonexistent", {"name": "Alice"}) is MISSING


def test_ref_context(spark):
    ctx = {"rate": 1.5, "config": {"enabled": True}}
    assert _eval(spark, "@context.rate", {}, ctx) == 1.5
    assert _eval(spark, "@context.config.enabled", {}, ctx) is True


def test_ref_context_absent_is_missing(spark):
    assert _eval(spark, "@context.rate", {}, None) is MISSING


def test_ref_out(spark):
    out = _transform(spark, [
        {"target": "computed", "value": 42},
        {"target": "mirror", "expr": "@out.computed"},
    ], {})
    assert out == [{"computed": 42, "mirror": 42}]


def test_ref_local_via_let(spark):
    assert _eval(spark, [0, {"let": {"price": 100}}, "@price"]) == 100


def test_ref_local_undefined_errors(spark):
    _eval_err(spark, ["@undefined_local"])


def test_ref_item_in_map(spark):
    items = [{"name": "item1", "value": 10}, {"name": "item2", "value": 20}]
    assert _eval(spark, ["@input.items",
                         {"op": "map", "args": [["@item.name"]]}],
                 {"items": items}) == ["item1", "item2"]


def test_ref_item_index_in_map(spark):
    assert _eval(spark, ["@input.items",
                         {"op": "map", "args": [["@item.index"]]}],
                 {"items": ["a", "b", "c"]}) == [0, 1, 2]


def test_ref_item_outside_map_scope_errors(spark):
    _eval_err(spark, ["@item.value"])


def test_ref_acc_in_reduce(spark):
    result = _eval(spark, ["@input.nums",
                           {"reduce": [["@acc", {"add": ["@item"]}]]}],
                   {"nums": [1, 2, 3]})
    assert result == 6.0


def test_ref_acc_outside_reduce_errors(spark):
    _eval_err(spark, ["@acc"])


def test_ref_input_empty_path_is_whole_record(spark):
    assert _eval(spark, "@input", {"name": "Alice"}) == {"name": "Alice"}


# =======================================================================
# v2_start_eval_tests (v2_eval.rs:666-900)
# =======================================================================

def test_start_literals(spark):
    assert _eval(spark, "lit:hello") == "hello"
    assert _eval(spark, [42]) == 42
    assert _eval(spark, [True]) is True
    assert _eval(spark, [[1, 2, 3]]) == [1, 2, 3]
    assert _eval(spark, [{"key": "value"}]) == {"key": "value"}


def test_start_literal_null(spark):
    out = _transform(spark, [{"target": "out", "expr": [None]}], {})
    assert out == [{"out": None}]


def test_start_ref(spark):
    assert _eval(spark, ["@input.name"], {"name": "Bob"}) == "Bob"


def test_start_pipe_value_not_available_is_missing(spark):
    # "$" at pipe start with no surrounding pipe value → Missing
    assert _eval(spark, "$", {"x": 1}) is MISSING


# =======================================================================
# v2_op_step_eval_tests (v2_eval.rs:3075-3802)
# =======================================================================

def test_op_trim(spark):
    assert _eval(spark, ["@input.v", "trim"], {"v": "  hello  "}) == "hello"


def test_op_lowercase_uppercase(spark):
    assert _eval(spark, ["@input.v", "lowercase"], {"v": "HELLO"}) == "hello"
    assert _eval(spark, ["@input.v", "uppercase"], {"v": "hello"}) == "HELLO"


def test_op_to_string(spark):
    assert _eval(spark, ["@input.v", "to_string"], {"v": 42}) == "42"
    assert _eval(spark, ["@input.v", "to_string"], {"v": True}) == "true"


def test_op_replace(spark):
    assert _eval(spark, ["@input.v", {"replace": ["world", "there"]}],
                 {"v": "hello world"}) == "hello there"


def test_op_split_and_pad(spark):
    assert _eval(spark, ["@input.v", {"split": [","]}],
                 {"v": "a,b,c"}) == ["a", "b", "c"]
    assert _eval(spark, ["@input.v", {"pad_start": [3, "0"]}],
                 {"v": "7"}) == "007"
    assert _eval(spark, ["@input.v", {"pad_end": [3, "0"]}],
                 {"v": "7"}) == "700"


def test_op_round_and_to_base(spark):
    rounded = _eval(spark, ["@input.v", {"round": [2]}], {"v": 1.2345})
    assert abs(rounded - 1.23) < 1e-9
    assert _eval(spark, ["@input.v", {"to_base": [2]}], {"v": 10}) == "1010"


def test_op_merge(spark):
    assert _eval(spark, ["@input.v", {"merge": [{"b": 2}]}],
                 {"v": {"a": 1}}) == {"a": 1, "b": 2}


def test_op_array_map_and_reduce(spark):
    mapped = _eval(spark, ["@input.v",
                           {"op": "map", "args": [["@item", {"add": [1]}]]}],
                   {"v": [1, 2, 3]})
    assert mapped == [2.0, 3.0, 4.0]
    assert all(_is_float(x) for x in mapped)
    reduced = _eval(spark, ["@input.v",
                            {"reduce": [["@acc", {"add": ["@item"]}]]}],
                    {"v": [1, 2, 3]})
    assert reduced == 6.0 and _is_float(reduced)


def test_op_first_last(spark):
    assert _eval(spark, ["@input.v", "first"], {"v": [1, 2]}) == 1
    assert _eval(spark, ["@input.v", "last"], {"v": [1, 2]}) == 2


def test_op_type_casts(spark):
    assert _eval(spark, ["@input.v", "int"], {"v": "42"}) == 42
    assert abs(_eval(spark, ["@input.v", "float"], {"v": "3.14"})
               - 3.14) < 1e-9
    assert _eval(spark, ["@input.v", "bool"], {"v": "true"}) is True
    assert _eval(spark, ["@input.v", "string"], {"v": 12}) == "12"


def test_op_and_or_short_circuit(spark):
    # a true pipe value short-circuits `or` before the erroring arg
    # ([1, divide: 0]) is consulted — and false does the same for `and`
    assert _eval(spark, ["@input.v", {"or": [[1, {"divide": [0]}]]}],
                 {"v": True}) is True
    assert _eval(spark, ["@input.v", {"and": [[1, {"divide": [0]}]]}],
                 {"v": False}) is False


def test_op_add_subtract(spark):
    r = _eval(spark, ["@input.v", {"add": [10]}], {"v": 5})
    assert r == 15.0 and _is_float(r)
    r = _eval(spark, ["@input.v", {"subtract": [3]}], {"v": 10})
    assert r == 7.0 and _is_float(r)


@pytest.mark.parametrize("op,left,right,expected", [
    ("eq", 1, "1", True),      # op-position comparisons are v1-coerced
    ("ne", 1, 2, True),
    ("lt", 5, 10, True),
    ("lte", 10, 10, True),
    ("gt", 10, 5, True),
    ("gte", 10, 10, True),
    ("match", "apple", "^a.*", True),
])
def test_op_comparison_aliases(spark, op, left, right, expected):
    assert _eval(spark, ["@input.v", {op: [right]}],
                 {"v": left}) is expected


def test_op_pick_multiple_paths(spark):
    obj = {"name": "apple", "price": 100, "category": "fruit"}
    assert _eval(spark, ["@input.v", {"pick": ["name", "price"]}],
                 {"v": obj}) == {"name": "apple", "price": 100}


def test_op_omit_multiple_paths(spark):
    obj = {"name": "apple", "price": 100, "category": "fruit"}
    assert _eval(spark, ["@input.v", {"omit": ["category", "price"]}],
                 {"v": obj}) == {"name": "apple"}


def test_op_pick_paths_array_arg(spark):
    """The reference's array-literal paths arg (``lit(json!(["name",
    "price"]))``) needs an extra nesting level at the YAML surface —
    ``[["name","price"]]`` is a PIPE whose second element parses as an
    (unknown) op step in both parsers, so the literal form is a
    single-element pipe whose start is the array."""
    obj = {"name": "apple", "price": 100, "category": "fruit"}
    assert _eval(spark, ["@input.v", {"pick": [[["name", "price"]]]}],
                 {"v": obj}) == {"name": "apple", "price": 100}
    # the un-nested spelling is an unknown-op error in both engines
    _eval_err(spark, ["@input.v", {"pick": [["name", "price"]]}],
              {"v": obj})


def test_op_multiply_divide(spark):
    r = _eval(spark, ["@input.v", {"multiply": [0.9]}], {"v": 100})
    assert r == 90.0 and _is_float(r)
    r = _eval(spark, ["@input.v", {"divide": [2]}], {"v": 10})
    assert r == 5.0 and _is_float(r)


def test_op_divide_by_zero_errors(spark):
    _eval_err(spark, ["@input.v", {"divide": [0]}], {"v": 10})


def test_op_coalesce(spark):
    assert _eval(spark, ["@input.v", {"coalesce": ["default"]}],
                 {"v": "value"}) == "value"
    assert _eval(spark, ["@input.v", {"coalesce": ["default"]}],
                 {"v": None}) == "default"
    assert _eval(spark, ["@input.v", {"coalesce": ["default"]}],
                 {}) == "default"


def test_op_unknown_errors(spark):
    _eval_err(spark, ["@input.v", "unknown_op"], {"v": "test"})


# =======================================================================
# v2_let_step_eval_tests (v2_eval.rs:3802-4049)
# =======================================================================

def test_let_does_not_change_pipe_value(spark):
    assert _eval(spark, [100, {"let": {"x": "$"}}]) == 100


def test_let_binding_uses_pipe_value(spark):
    assert _eval(spark, [100, {"let": {"x": "$"}}, "@x"]) == 100


def test_let_binding_chain(spark):
    # let: { x: 10, y: @x } — later bindings see earlier ones
    assert _eval(spark, [0, {"let": {"x": 10, "y": "@x"}}, "@y"]) == 10


def test_let_binding_from_input(spark):
    assert _eval(spark, [0, {"let": {"name": "@input.user.name"}}, "@name"],
                 {"user": {"name": "Alice"}}) == "Alice"


def test_let_then_op(spark):
    r = _eval(spark, [100, {"let": {"factor": 2}},
                      {"multiply": ["@factor"]}])
    assert r == 200.0 and _is_float(r)


# =======================================================================
# v2_if_step_eval_tests (v2_eval.rs:4049-4857)
# =======================================================================

def _cond_result(spark, cond, record=None, context=None):
    """True/False of a v2 condition via an if step (strict v2 condition
    semantics — NOT the warn-and-skip when/record_when channel)."""
    expr = [0, {"if": {"cond": cond, "then": ["lit:T"], "else": ["lit:F"]}}]
    return _eval(spark, expr, record, context) == "T"


@pytest.mark.parametrize("cond,expected", [
    ({"eq": [10, 10]}, True),
    ({"eq": [10, 20]}, False),
    ({"eq": ["1", 1]}, False),          # strict: numeric string != number
    ({"ne": ["a", "b"]}, True),
    ({"gt": [20, 10]}, True),
    ({"gt": ["B", "A"]}, True),         # non-numeric strings: lexicographic
    # compare_values_ord: numeric only when BOTH parse as f64, else
    # both-strings lexicographic — "5" vs "a" is lex, not an error
    ({"gt": ["5", "a"]}, False),
    ({"lt": ["5", "a"]}, True),
    ({"gt": ["5", "3"]}, True),         # both numeric strings: numeric
    ({"lt": [5, 10]}, True),
    ({"gte": [10, 10]}, True),
    ({"lte": [5, 10]}, True),
    ({"match": ["hello123", "^hello\\d+"]}, True),
    ({"all": [{"gt": [10, 5]}, {"lt": [10, 20]}]}, True),
    ({"all": [{"gt": [10, 5]}, {"lt": [10, 5]}]}, False),
    ({"any": [{"eq": ["admin", "user"]}, {"gt": [100, 50]}]}, True),
    ({"any": [{"eq": [1, 2]}, {"eq": [3, 4]}]}, False),
    (True, True),                        # expr condition: truthy literal
    (False, False),
])
def test_condition_semantics(spark, cond, expected):
    assert _cond_result(spark, cond) is expected


def test_condition_eq_missing_as_null(spark):
    assert _cond_result(spark, {"eq": ["@input.optional", None]}, {}) is True


def test_condition_expr_non_bool_errors(spark):
    from rulemorph_spark.errors import normalize_kind
    err = _eval_err(spark, [0, {"if": {"cond": "lit:active",
                                       "then": ["lit:T"],
                                       "else": ["lit:F"]}}])
    kind = getattr(err, "kind", getattr(err, "code", None))
    assert normalize_kind(kind) == "ExprError"
    assert "must evaluate to boolean" in getattr(err, "message", str(err))


def test_condition_expr_missing_is_false(spark):
    assert _cond_result(spark, "@input.active", {}) is False


def test_condition_comparison_arity_eval_error(spark):
    """Comparisons take exactly 2 args AT EVAL (v2_eval.rs:1103-1110):
    inside an if step the error is a hard ExprError..."""
    err = _eval_err(spark, [0, {"if": {"cond": {"eq": [1]},
                                       "then": ["lit:T"],
                                       "else": ["lit:F"]}}])
    assert "exactly 2 arguments" in getattr(err, "message", str(err))


def test_condition_comparison_arity_when_warns_and_skips(spark):
    """...while in a mapping `when` the same eval error downgrades to
    the warning channel and skips the mapping."""
    from rulemorph_spark.engine import transform_with_warnings
    rule = {"version": 2, "input": {"format": "json"}, "mappings": [
        {"target": "a", "value": 1},
        {"target": "b", "value": 2, "when": {"eq": [1]}}]}
    out, warnings = transform_with_warnings(spark, json.dumps(rule),
                                            input_text="[{}]")
    assert out == [{"a": 1}]
    assert len(warnings) == 1 and warnings[0]["path"] == "mappings[1].when"


def test_condition_with_pipe_value(spark):
    expr = [150, {"if": {"cond": {"gt": ["$", 100]},
                         "then": ["lit:T"], "else": ["lit:F"]}}]
    assert _eval(spark, expr) == "T"


def test_if_step_then_branch(spark):
    r = _eval(spark, [20, {"if": {"cond": {"gt": ["$", 10]},
                                  "then": [{"multiply": [2]}]}}])
    assert r == 40.0 and _is_float(r)


def test_if_step_else_branch(spark):
    r = _eval(spark, [5, {"if": {"cond": {"gt": ["$", 10]},
                                 "then": [{"multiply": [2]}],
                                 "else": [{"multiply": [0.5]}]}}])
    assert r == 2.5


def test_if_step_no_else_returns_pipe_value(spark):
    assert _eval(spark, [5, {"if": {"cond": {"gt": ["$", 10]},
                                    "then": [{"multiply": [2]}]}}]) == 5


def test_pipe_with_if_step(spark):
    r = _eval(spark, [10000, {"if": {"cond": {"gt": ["$", 5000]},
                                     "then": [{"multiply": [0.9]}]}}])
    assert r == 9000.0 and _is_float(r)


def test_if_with_input_condition(spark):
    expr = [0, {"if": {"cond": {"eq": ["@input.role", "admin"]},
                       "then": [100], "else": [50]}}]
    assert _eval(spark, expr, {"role": "admin"}) == 100
    assert _eval(spark, expr, {"role": "user"}) == 50


def test_nested_if(spark):
    inner = {"if": {"cond": {"gt": ["$", 500]},
                    "then": ["lit:gold"], "else": ["lit:silver"]}}
    expr_for = lambda v: [v, {"if": {"cond": {"gt": ["$", 100]},
                                     "then": [inner],
                                     "else": ["lit:bronze"]}}]
    assert _eval(spark, expr_for(50)) == "bronze"
    assert _eval(spark, expr_for(200)) == "silver"
    assert _eval(spark, expr_for(600)) == "gold"


def test_sort_by_mixed_key_kinds_error(spark):
    """Every sort key must share one kind (v2_eval.rs:2218,
    transform.rs:3939); bools order false < true; non-scalar keys and
    mixed kinds are ExprErrors."""
    assert _eval(spark, ["@input.v", {"sort_by": [["@item"]]}],
                 {"v": [True, False, True]}) == [False, True, True]
    err = _eval_err(spark, ["@input.v", {"sort_by": [["@item"]]}],
                    {"v": [1, "a"]})
    assert "all the same type" in getattr(err, "message", str(err))
    err = _eval_err(spark, ["@input.v", {"sort_by": [["@item"]]}],
                    {"v": [{"x": 1}]})
    assert "string/number/bool" in getattr(err, "message", str(err))


# =======================================================================
# v2_map_step_eval_tests (v2_eval.rs:4857-5175)
# =======================================================================

def test_map_step_simple(spark):
    assert _eval(spark, ["@input.v", {"map": ["uppercase"]}],
                 {"v": ["a", "b", "c"]}) == ["A", "B", "C"]


def test_map_step_with_multiply(spark):
    r = _eval(spark, ["@input.v", {"map": [{"multiply": [2]}]}],
              {"v": [1, 2, 3]})
    assert r == [2.0, 4.0, 6.0]
    assert all(_is_float(x) for x in r)


def test_map_step_empty_array(spark):
    assert _eval(spark, ["@input.v", {"map": ["uppercase"]}],
                 {"v": []}) == []


def test_map_step_missing_returns_missing(spark):
    assert _eval(spark, ["@input.v", {"map": ["uppercase"]}], {}) is MISSING


def test_map_step_non_array_errors(spark):
    _eval_err(spark, ["@input.v", {"map": ["uppercase"]}],
              {"v": "not an array"})


def test_map_step_concat(spark):
    assert _eval(spark, ["@input.v", {"map": [{"concat": ["!"]}]}],
                 {"v": ["hello", "world"]}) == ["hello!", "world!"]


def test_map_step_no_steps_is_identity(spark):
    assert _eval(spark, ["@input.items", {"map": []}],
                 {"items": [10, 20, 30]}) == [10, 20, 30]


def test_map_step_multiple_ops(spark):
    assert _eval(spark, ["@input.v", {"map": ["trim", "uppercase"]}],
                 {"v": ["  a  ", "  b  "]}) == ["A", "B"]


def test_pipe_with_map_step(spark):
    assert _eval(spark, ["@input.names", {"map": ["uppercase"]}],
                 {"names": ["alice", "bob"]}) == ["ALICE", "BOB"]


def test_map_with_if_step(spark):
    # [3, 7, 2, 10] -> [3, 14, 2, 20] (only 7 and 10 are > 5)
    r = _eval(spark, ["@input.v",
                      {"map": [{"if": {"cond": {"gt": ["$", 5]},
                                       "then": [{"multiply": [2]}]}}]}],
              {"v": [3, 7, 2, 10]})
    assert r == [3, 14.0, 2, 20.0]
    assert _is_float(r[1]) and _is_float(r[3])
    assert not _is_float(r[0]) and not _is_float(r[2])


def test_nested_map(spark):
    r = _eval(spark, ["@input.v", {"map": [{"map": [{"multiply": [2]}]}]}],
              {"v": [[1, 2], [3, 4]]})
    assert r == [[2.0, 4.0], [6.0, 8.0]]


def test_map_objects_identity(spark):
    users = [{"name": "Alice"}, {"name": "Bob"}]
    assert _eval(spark, ["@input.users", {"map": []}],
                 {"users": users}) == users


# =======================================================================
# v2_pipe_eval_tests (v2_eval.rs:5175-5456)
# =======================================================================

def test_pipe_simple_ref(spark):
    assert _eval(spark, ["@input.name"], {"name": "Alice"}) == "Alice"


def test_pipe_literal_start(spark):
    assert _eval(spark, [42]) == 42


def test_pipe_chain_ops_literal_string_start(spark):
    assert _eval(spark, ["  hello  ", "trim", "uppercase"]) == "HELLO"


def test_pipe_with_context(spark):
    r = _eval(spark, ["@context.multiplier",
                      {"multiply": ["@input.value"]}],
              {"value": 10}, {"multiplier": 5})
    assert r == 50.0 and _is_float(r)


def test_pipe_with_out_ref(spark):
    out = _transform(spark, [
        {"target": "previous", "value": 99},
        {"target": "next", "expr": ["@out.previous", {"add": [1]}]},
    ], {})
    assert out == [{"previous": 99, "next": 100.0}]
    assert _is_float(out[0]["next"])


def test_pipe_complex_chain(spark):
    # 2000 * 0.9 = 1800 > 1000 → 1800 - 100 = 1700
    r = _eval(spark, ["@input.price",
                      {"let": {"original": "$"}},
                      {"multiply": [0.9]},
                      {"let": {"discounted": "$"}},
                      {"if": {"cond": {"gt": ["$", 1000]},
                              "then": [{"subtract": [100]}]}}],
              {"price": 2000})
    assert r == 1700.0 and _is_float(r)


def test_pipe_coalesce_chain(spark):
    expr = ["@input.primary",
            {"coalesce": ["@input.secondary"]},
            {"coalesce": ["default"]}]
    assert _eval(spark, expr, {"primary": "first"}) == "first"
    assert _eval(spark, expr,
                 {"primary": None, "secondary": "second"}) == "second"
    assert _eval(spark, expr,
                 {"primary": None, "secondary": None}) == "default"


def test_pipe_deep_nesting(spark):
    r = _eval(spark, ["@input.scores",
                      {"map": [{"if": {"cond": {"gte": ["$", 60]},
                                       "then": ["lit:pass"],
                                       "else": ["lit:fail"]}}]}],
              {"scores": [80, 55, 90, 45]})
    assert r == ["pass", "fail", "pass", "fail"]


# =======================================================================
# v2_lookup_eval_tests (v2_eval.rs:5456-5996)
# =======================================================================

DEPARTMENTS = [
    {"id": 1, "name": "Engineering", "budget": 100000},
    {"id": 2, "name": "Sales", "budget": 50000},
    {"id": 3, "name": "HR", "budget": 30000},
]


def test_lookup_first_basic(spark):
    r = _eval(spark, [None, {"lookup_first": ["@context.departments",
                                              "id", 2, "name"]}],
              {}, {"departments": DEPARTMENTS})
    assert r == "Sales"


def test_lookup_first_uses_pipe_value_from(spark):
    r = _eval(spark, ["@context.departments",
                      {"lookup_first": ["id", 2, "budget"]}],
              {}, {"departments": DEPARTMENTS})
    assert r == 50000


def test_lookup_first_no_match_is_missing(spark):
    assert _eval(spark, [None, {"lookup_first": ["@context.departments",
                                                 "id", 999, "name"]}],
                 {}, {"departments": DEPARTMENTS}) is MISSING


def test_lookup_first_return_whole_object(spark):
    r = _eval(spark, [None, {"lookup_first": ["@context.departments",
                                              "id", 1]}],
              {}, {"departments": DEPARTMENTS})
    assert r == {"id": 1, "name": "Engineering", "budget": 100000}


def test_lookup_first_with_input_match_value(spark):
    r = _eval(spark, [None, {"lookup_first": ["@context.departments",
                                              "id", "@input.dept_id",
                                              "name"]}],
              {"dept_id": 3}, {"departments": DEPARTMENTS})
    assert r == "HR"


def test_lookup_first_missing_match_value_does_not_match_null(spark):
    users = [{"id": None, "name": "MissingUser"}, {"id": 1, "name": "Alice"}]
    assert _eval(spark, [None, {"lookup_first": ["@context.users", "id",
                                                 "@input.user_id", "name"]}],
                 {}, {"users": users}) is MISSING


def test_lookup_all_matches(spark):
    employees = [
        {"name": "Alice", "dept": "Engineering"},
        {"name": "Bob", "dept": "Sales"},
        {"name": "Charlie", "dept": "Engineering"},
        {"name": "Diana", "dept": "HR"},
    ]
    r = _eval(spark, [None, {"lookup": ["@context.employees", "dept",
                                        "Engineering", "name"]}],
              {}, {"employees": employees})
    assert r == ["Alice", "Charlie"]


def test_lookup_no_matches_is_empty_array(spark):
    assert _eval(spark, [None, {"lookup": ["@context.departments",
                                           "id", 999]}],
                 {}, {"departments": DEPARTMENTS}) == []


def test_lookup_missing_match_value_does_not_match_null(spark):
    users = [{"id": None, "name": "MissingUser"}, {"id": 1, "name": "Alice"}]
    assert _eval(spark, [None, {"lookup": ["@context.users", "id",
                                           "@input.user_id", "name"]}],
                 {}, {"users": users}) is MISSING


def test_lookup_first_missing_from_is_missing(spark):
    assert _eval(spark, [None, {"lookup_first": ["@context.nonexistent",
                                                 "id", 1]}],
                 {}, {}) is MISSING


def test_lookup_first_insufficient_args_errors(spark):
    _eval_err(spark, [None, {"lookup_first": [[]]}])


def test_lookup_in_pipe(spark):
    r = _eval(spark, [None, {"lookup_first": ["@context.departments",
                                              "id", "@input.dept_id",
                                              "budget"]}],
              {"dept_id": 2}, {"departments": DEPARTMENTS})
    assert r == 50000


def test_lookup_then_multiply(spark):
    r = _eval(spark, [None,
                      {"lookup_first": ["@context.departments", "id", 2,
                                        "budget"]},
                      {"multiply": [1.1]}],
              {}, {"departments": DEPARTMENTS})
    assert abs(r - 55000.0) < 0.001


def test_match_invalid_literal_pattern_is_expr_error(spark):
    """A literal pattern that does not compile surfaces the reference's
    v2 ExprError ("invalid regex pattern: {e}" — the v2 ~= op and
    compare_values_match wrap the regex compile failure,
    v2_eval.rs:1208-1214; "regex pattern is invalid" is the V1
    cached-regex wording) in both the op and condition positions —
    never a raw Spark regex error.  Adjudicated against the
    interpreter oracle in the r7 continuation."""
    from rulemorph_spark.errors import normalize_kind
    err = _eval_err(spark, ["lit:abc", {"~=": ["lit:[unclosed"]}])
    assert "invalid regex pattern:" in getattr(err, "message", str(err))
    kind = getattr(err, "kind", getattr(err, "code", None))
    assert normalize_kind(kind) == "ExprError"
    err = _eval_err(spark, [0, {"if": {"cond":
                                       {"match": ["lit:abc",
                                                  "lit:[unclosed"]},
                                       "then": ["lit:T"],
                                       "else": ["lit:F"]}}])
    assert "invalid regex pattern:" in getattr(err, "message", str(err))
