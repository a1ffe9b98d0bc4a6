"""EVAL-surface arity parity with the reference, engine vs the
interpreter oracle (round 9).

The reference enforces op arity twice with DIFFERENT tables: the
validators (only ``validate`` runs them) and eval — which is what a
plain transform sees.  Divergences this campaign closed (all found by
probing shapes the old compile-time gate rejected, a systematic fuzz
blind spot — fuzzers only generated compile-accepted rules):

- v2 non-native steps delegate to v1 with the pipe injected, so
  ``["@x", {object_flatten: []}]`` is VALID at eval while the validator
  (faithfully) flags it; wrong counts raise v1's "expr.args must
  contain ..." wording at ``{step}.args`` AFTER evaluating the args;
- v2 native steps raise per-op "requires ..." wordings BEFORE
  evaluating args, and several (trim/to_string/first/+/*/int/...)
  IGNORE extra args entirely — even raising ones;
- v1 chains/standalones check per-op TOTAL windows (the injected pipe /
  hoisted first arg counts), and reject v2-only spellings with
  "expr.op is not supported" at ``{step}.op``;
- all of these are EVAL errors: an untaken if-branch shields them, a
  when-condition downgrades them to the warning channel.

Every case runs through BOTH engines and must agree on (result | error
kind+message+path).
"""

from __future__ import annotations

import json

import pytest

from rulemorph_spark import interp as I
from rulemorph_spark.engine import transform
from rulemorph_spark.errors import RuleError, TransformEngineError

REC = {"arr": [3, 1, 2], "arr2": [[1], [2]], "obj": {"x": {"y": 1}},
       "objs": [{"x": 1}], "n": 6, "s": "a,b", "ent": [["a", 1]],
       "d": "2021-01-02 03:04:05"}

BAD = ["lit:x", {"~=": ["("]}]  # raising sub-expression (invalid regex)


def _rule(version, expr):
    return (f"version: {version}\ninput: {{format: json}}\nmappings:\n"
            f"  - target: r\n    expr: {json.dumps(expr)}\n")


def _engine(spark, rule):
    try:
        return ("ok", transform(spark, rule, input_text=json.dumps([REC])))
    except TransformEngineError as e:
        return ("err", e.kind, e.message, e.path)
    except RuleError as e:
        return ("rule_err", e.code, e.message, e.path)


def _oracle(rule):
    try:
        return ("ok", I.transform(rule, input_text=json.dumps([REC])))
    except I.InterpError as e:
        return ("err", e.kind, e.message, e.path)


V2_CASES = [
    # --- delegated ops: explicit = v1 total - 1 ------------------------
    ["@input.obj", {"object_flatten": []}],
    ["@input.obj", {"object_flatten": ["@input.obj"]}],
    ["@input.obj", {"object_unflatten": []}],
    ["@input.ent", {"from_entries": []}],
    ["@input.ent", {"from_entries": [1, 2]}],
    ["@input.obj", {"keys": ["@input.obj"]}],
    ["@input.obj", {"len": [1]}],
    ["@input.arr", {"take": []}],
    ["@input.arr", {"take": [1, 2]}],
    ["@input.arr", {"chunk": []}],
    ["@input.s", {"split": []}],
    ["@input.obj", {"get": []}],
    ["@input.n", {"to_base": []}],
    ["@input.arr", {"index_of": []}],
    ["@input.s", {"pad_start": []}],
    ["@input.s", {"pad_start": [1, 2, 3]}],
    ["@input.s", {"replace": ["a"]}],
    ["@input.s", {"replace": ["a", "b", "all", "x"]}],
    ["@input.n", {"round": [1, 2]}],
    ["@input.arr2", {"flatten": [1, 2]}],
    ["@input.obj", {"merge": []}],
    ["@input.obj", {"deep_merge": []}],
    ["@input.arr", {"zip": []}],
    ["@input.obj", {"pick": []}],
    ["@input.obj", {"omit": []}],
    ["@input.d", {"date_format": []}],
    ["@input.d", {"to_unixtime": ["%Y", "s", "x"]}],
    # delegated: argument errors fire BEFORE the arity error, in order
    ["@input.arr", {"take": [BAD, 2]}],
    ["@input.obj", {"object_flatten": [BAD]}],
    ["@input.arr", {"take": ["@input.nope", 2]}],  # missing arg: arity wins
    # --- native ops: per-op "requires" wordings, args NOT evaluated ----
    ["@input.arr", {"fold": [0]}],
    ["@input.arr", {"fold": [BAD, 1, 2]}],
    ["@input.arr", {"sort_by": []}],
    ["@input.arr", {"sort_by": [BAD, "asc", 1]}],
    ["@input.arr", {"zip_with": [1]}],
    ["@input.arr", {"reduce": []}],
    ["@input.arr", {"filter": [BAD, BAD]}],
    ["@input.arr", {"find": []}],
    ["@input.arr", {"group_by": []}],
    ["@input.arr", {"distinct_by": [1, 2]}],
    ["@input.objs", {"lookup": [1]}],
    ["@input.objs", {"lookup_first": [1]}],
    ["@input.n", {"-": []}],
    ["@input.n", {"/": []}],
    ["lit:x", {"and": []}],
    ["lit:x", {"or": []}],
    ["lit:true", {"not": [1]}],
    ["@input.n", {"==": []}],
    ["@input.n", {"==": [1, 2]}],
    ["@input.s", {"~=": []}],
    ["@input.n", {"<": [1, 2]}],
    # native tolerance: extra args ignored, not even evaluated
    ["@input.s", {"trim": [BAD]}],
    ["@input.arr", {"first": [BAD]}],
    ["@input.arr", {"last": [BAD, BAD]}],
    ["@input.n", {"to_string": [BAD, BAD]}],
    ["@input.n", {"int": [BAD]}],
    ["lit:true", {"bool": [1, 2, 3]}],
    ["@input.n", {"+": []}],
    ["@input.n", {"*": []}],
    ["@input.n", {"concat": []}],
    ["@input.n", {"coalesce": []}],
    [None, {"coalesce": []}],
    # explicit op-object form of a native (map arity has its own rule)
    ["@input.arr", {"op": "map", "args": []}],
    ["@input.arr", {"op": "map", "args": [["@item"], ["@item"]]}],
    # empty MapStep (step-list syntax) is identity-with-array-check
    ["@input.arr", {"map": []}],
    ["@input.nope", {"map": []}],
    # unknown op: eval error at {step}.op, not a parse error
    ["@input.arr", {"frobnicate": []}],
    ["@input.arr", {"op": "frobnicate", "args": [1]}],
    # untaken if-branch shields an arity error entirely
    ["@input.n", {"if": {"cond": {"eq": [1, 2]},
                         "then": [5, {"fold": [0]}], "else": [7]}}],
    # taken branch raises it
    ["@input.n", {"if": {"cond": {"eq": [1, 1]},
                         "then": [["@input.arr"], {"fold": [0]}],
                         "else": [7]}}],
]

A = {"ref": "input.arr"}
O = {"ref": "input.obj"}
S = {"ref": "input.s"}

V1_CASES = [
    # standalone: total = explicit args (first hoists to the pipe)
    {"op": "take", "args": [A]},
    {"op": "take", "args": [A, 2]},
    {"op": "take", "args": [A, 2, 3]},
    {"op": "take", "args": []},
    {"op": "len", "args": []},
    {"op": "object_flatten", "args": [O, 1]},
    {"op": "pick", "args": [O]},
    {"op": "pick", "args": [O, "x", "y"]},
    {"op": "fold", "args": [A, 0]},
    {"op": "round", "args": [{"ref": "input.n"}, 1, 2]},
    # v2-only spellings are unsupported in v1
    {"op": "eq", "args": [1, 1]},
    {"op": "string", "args": [1]},
    {"op": "first", "args": [A]},
    {"op": "frobnicate", "args": [1]},
    {"op": "frobnicate", "args": []},
    # chains: the injected pipe counts toward the total
    {"chain": [A, {"op": "take", "args": []}]},
    {"chain": [A, {"op": "take", "args": [2, 3]}]},
    {"chain": [O, {"op": "object_flatten", "args": [1]}]},
    {"chain": [O, {"op": "len", "args": [1]}]},
    {"chain": [S, {"op": "pad_start", "args": [5, "-", 1]}]},
    {"chain": [O, {"op": "merge", "args": []}]},
    {"chain": [A, {"op": "map", "args": []}]},
    {"chain": [A, {"op": "last", "args": []}]},
    {"chain": [A, {"op": "add", "args": [1]}]},
    {"chain": [{"ref": "input.n"}, {"op": "+", "args": []}]},
    {"chain": [A, {"op": "frobnicate", "args": []}]},
    {"chain": [A, {"op": "zip_with", "args": [A]}]},
]


@pytest.mark.parametrize("expr", V2_CASES,
                         ids=[f"v2-{i}" for i in range(len(V2_CASES))])
def test_v2_eval_arity_matches_interpreter(spark, expr):
    rule = _rule(2, expr)
    assert _engine(spark, rule) == _oracle(rule)


@pytest.mark.parametrize("expr", V1_CASES,
                         ids=[f"v1-{i}" for i in range(len(V1_CASES))])
def test_v1_eval_arity_matches_interpreter(spark, expr):
    rule = _rule(1, expr)
    assert _engine(spark, rule) == _oracle(rule)
