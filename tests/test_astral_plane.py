"""Astral-plane (non-BMP) audit, engine vs interpreter (VERDICT r8
next-round #6): Rust counts chars as Unicode scalar values and so do
Spark's string functions, but surrogate-pair handling in `F.split(key,
"")` (the path DFA walks per-char), `len`/`split`/`pad_*`, and dynamic
`get`/`pick`/`omit` keys deserved explicit pins.  All cases carry a
U+1F389 (🎉) through keys, values, delimiters and pad fills.
"""

from __future__ import annotations

import json

import pytest

from rulemorph_spark import interp as I
from rulemorph_spark.engine import transform
from rulemorph_spark.errors import TransformEngineError

E = "\U0001F389"

REC = {"o": {E: 1, f"a{E}b": {"c": 2}}, "s": f"x{E}y{E}z", "k": E,
       "k2": f"a{E}b.c", "arr": [E, "b"]}

CASES = [
    ["@input.o", {"get": ["@input.k"]}],
    ["@input.o", {"get": ["@input.k2"]}],
    ["@input.o", {"get": [E]}],
    ["@input.o", {"pick": ["@input.k"]}],
    ["@input.o", {"omit": ["@input.k"]}],
    ["@input.s", {"len": []}],
    ["@input.s", {"split": [E]}],
    ["@input.s", {"split": [""]}],
    ["@input.k", {"pad_start": [4, E]}],
    ["@input.s", {"pad_end": [9, E]}],
    ["@input.s", {"replace": [E, "-"]}],
    ["@input.s", {"uppercase": []}],
    ["@input.arr", {"index_of": [E]}],
    ["@input.o", {"get": [E + "["]}],   # malformed astral path (DFA)
    ["@input.s", {"~=": [E]}],
]


def test_yaml_surrogate_escapes_pair_like_libyaml(spark):
    """``json.dumps`` with the default ``ensure_ascii=True`` embeds
    astral chars as adjacent ``\\ud83c\\udf89`` escapes; the
    reference's libyaml pairs those into the astral char while PyYAML
    left two LONE surrogates (which also crashed py4j transport — the
    round-9 flaky UnicodeEncodeError).  Both engines repair at the
    YAML boundary and must agree with the unescaped form."""
    expr = ["@input.o", {"get": [E]}]
    rule_esc = (f"version: 2\ninput: {{format: json}}\nmappings:\n"
                f"  - target: r\n    expr: {json.dumps(expr)}\n")
    inp = json.dumps([REC], ensure_ascii=False)
    assert transform(spark, rule_esc, input_text=inp) == [{"r": 1}]
    assert I.transform(rule_esc, input_text=inp) == [{"r": 1}]


def test_yaml_lone_surrogate_is_rule_error():
    from rulemorph_spark.errors import RuleError
    rule = ('version: 2\ninput: {format: json}\nmappings:\n'
            '  - target: r\n    expr: ["lit:\\ud83c"]\n')
    with pytest.raises(RuleError):
        transform(None, rule, input_text="[]")
    with pytest.raises(I.InterpRuleError):
        I.transform(rule, input_text="[]")


@pytest.mark.parametrize("expr", CASES,
                         ids=[f"astral-{i}" for i in range(len(CASES))])
def test_astral_matches_interpreter(spark, expr):
    rule = (f"version: 2\ninput: {{format: json}}\nmappings:\n"
            f"  - target: r\n    expr: "
            f"{json.dumps(expr, ensure_ascii=False)}\n")
    inp = json.dumps([REC], ensure_ascii=False)
    try:
        eng = ("ok", transform(spark, rule, input_text=inp))
    except TransformEngineError as e:
        eng = ("err", e.kind, e.message, e.path)
    try:
        orc = ("ok", I.transform(rule, input_text=inp))
    except I.InterpError as e:
        orc = ("err", e.kind, e.message, e.path)
    assert eng == orc
