"""Validator ↔ runtime arity coherence, swept over the FULL op table.

The reference enforces per-op argument counts twice — statically
(``get_op_arg_range`` in v2_validator.rs, ``validate_op`` /
``validate_chain_op`` in validator.rs) and again at eval
("fold requires exactly two arguments", v2_eval.rs) — so for every op
this engine must (a) flag out-of-range v2 step counts in the
validator, (b) reject them at compile/eval, and (c) accept every
in-range count in both layers.  This pins the round-5 strictness fix
(the old ``lo - 1`` allowance silently admitted native-v2 undercounts)
against regressions in either direction.
"""

from __future__ import annotations

import json

import pytest

from rulemorph_spark.engine import transform
from rulemorph_spark.errors import RuleError, TransformEngineError
from rulemorph_spark.model import parse_rule_file
from rulemorph_spark.registry import OP_ARITY
from rulemorph_spark.validator import _V1_ARITY, validate_rule

_ERRORS = (TransformEngineError, RuleError)


def _v2_rule_yaml(op: str, n_args: int) -> str:
    # explicit op-object form so reserved step keys (``map``) still
    # parse as OP steps, like the reference's V2OpStep
    step = {"op": op, "args": [["lit:x"]] * n_args}
    expr = json.dumps(["@input.v", step])
    return ("version: 2\ninput: {format: json}\nmappings:\n"
            f"  - target: out\n    expr: {expr}\n")


def _codes(yaml_text: str) -> list[str]:
    return [e.code for e in validate_rule(parse_rule_file(yaml_text))]


# ops whose symbol forms need YAML quoting handled via json.dumps above;
# every (op, bad_count) pair that must be rejected
_UNDER = [(op, lo - 1) for op, (lo, hi) in OP_ARITY.items() if lo > 0]
_OVER = [(op, hi + 1) for op, (lo, hi) in OP_ARITY.items()
         if hi is not None]


# (op, n) pairs the VALIDATOR rejects but the reference's EVAL
# tolerates — the two reference tables genuinely disagree (round-9
# differential finding; see registry.py "EVAL-surface arities").
# These natives ignore extra args without evaluating them, and
# concat/coalesce are total-variadic at eval.  test_eval_arity.py pins
# the eval-side behavior against the interpreter.
_EVAL_TOLERATED = {("trim", 1), ("lowercase", 1), ("uppercase", 1),
                   ("to_string", 1), ("string", 1), ("int", 1),
                   ("float", 1), ("bool", 1), ("first", 1), ("last", 1),
                   ("concat", 0), ("coalesce", 0)}


@pytest.mark.parametrize("op,n", _UNDER + _OVER,
                         ids=[f"{o}-{n}" for o, n in _UNDER + _OVER])
def test_v2_step_out_of_range_rejected_by_validator(spark, op, n):
    yaml_text = _v2_rule_yaml(op, n)
    assert "InvalidArgs" in _codes(yaml_text), (op, n)
    if (op, n) in _EVAL_TOLERATED:
        return  # eval-side tolerance pinned by test_eval_arity.py
    with pytest.raises(_ERRORS):
        transform(spark, yaml_text, input_text='[{"v": "x"}]')


@pytest.mark.parametrize(
    "op,n", [(op, lo) for op, (lo, hi) in OP_ARITY.items()],
    ids=[f"{o}-{n}" for o, (n, _) in OP_ARITY.items()])
def test_v2_step_min_count_validates_clean(op, n):
    """The minimum in-range count passes VALIDATION for every op (the
    runtime may still raise type errors on the dummy args — arity and
    typing are separate layers)."""
    codes = _codes(_v2_rule_yaml(op, n))
    assert "InvalidArgs" not in codes, (op, n, codes)


def _v1_rule_yaml(op: str, n_args: int, *, chain: bool) -> str:
    args = [{"ref": "input.v"}] + ["x"] * (n_args - 1) if not chain \
        else ["x"] * n_args
    if chain:
        expr = {"chain": [{"ref": "input.v"},
                          {"op": op, "args": args}]}
    else:
        expr = {"op": op, "args": args}
    doc = {"version": 1, "input": {"format": "json", "json": {}},
           "mappings": [{"target": "out", "expr": expr}]}
    return json.dumps(doc)


_V1_CASES = []
for _op, (_lo, _hi) in sorted(_V1_ARITY.items()):
    if _op in ("lookup", "lookup_first"):
        continue
    # standalone: effective = len(args)
    if _lo > 1:  # lo-1 >= 1 keeps args non-empty (separate check)
        _V1_CASES.append((_op, _lo - 1, False))
    if _hi is not None:
        _V1_CASES.append((_op, _hi + 1, False))
    # chain: effective = len(args) + 1
    if _hi is not None:
        _V1_CASES.append((_op, _hi, True))  # args=hi → effective hi+1


@pytest.mark.parametrize("op,n,chain", _V1_CASES,
                         ids=[f"{o}-{n}-{'c' if c else 's'}"
                              for o, n, c in _V1_CASES])
def test_v1_out_of_range_flagged(op, n, chain):
    codes = _codes(_v1_rule_yaml(op, n, chain=chain))
    assert "InvalidArgs" in codes, (op, n, chain, codes)


@pytest.mark.parametrize(
    "op,n", [(op, lo) for op, (lo, hi) in sorted(_V1_ARITY.items())
             if op not in ("lookup", "lookup_first")],
    ids=[f"{o}-{n}" for o, (n, _) in sorted(_V1_ARITY.items())
         if o not in ("lookup", "lookup_first")])
def test_v1_standalone_min_count_validates_clean(op, n):
    codes = _codes(_v1_rule_yaml(op, n, chain=False))
    assert "InvalidArgs" not in codes, (op, n, codes)
