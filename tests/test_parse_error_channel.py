"""v2 expression parse-error channel parity (round 9, closes the
deferred "invalid step:" class): the reference parses v2 pipes at EVAL
(per mapping), so parse failures are transform ExprErrors (CLI rc=3)
rendered with the ``V2ParseError`` Display wrappers
("invalid step: …", "invalid start value: …", "invalid condition: …",
v2_parser.rs:565-583) — not rule errors.  The engine parses lazily at
compile (still inside transform) and converts expression-level
RuleErrors at the boundary (``errors.rule_error_to_transform``),
threading the variant tag from ``expr_ir._err``.

Every case compares the engine against the interpreter on
(channel, kind, message, path).
"""

from __future__ import annotations

import json

import pytest

from rulemorph_spark import interp as I
from rulemorph_spark.engine import transform
from rulemorph_spark.errors import RuleError, TransformEngineError

CASES = [
    ["@input.a", {"get": ["@bogus"]}],     # eval: undefined variable
    ["@bogus.x"],                          # invalid start value
    [],                                    # pipe array cannot be empty
    [1, 2, 3],                             # invalid step (int)
    ["@input.a", {"map": [1]}],            # invalid step in map body
    ["@input.a", "$"],                     # $ as a step
    ["@input.a", {"let": 5}],              # let bindings must be object
    ["@input.a", {"let": {"x": ["@wat.y"]}}],  # nested start error
    ["@input.a", {"if": {"then": [1]}}],   # if step missing 'cond'
    ["@input.a", {"take": [[]]}],          # nested empty pipe
    ["@input.a", {"bad": 1, "two": 2}],    # unknown step type
    ["@input.a", {"if": {"cond": {"all": 5}, "then": [1]}}],  # cond
]


@pytest.mark.parametrize("expr", CASES,
                         ids=[f"p-{i}" for i in range(len(CASES))])
def test_parse_errors_match_interpreter(spark, expr):
    rule = (f"version: 2\ninput: {{format: json}}\nmappings:\n"
            f"  - target: r\n    expr: {json.dumps(expr)}\n")
    try:
        eng = ("ok", transform(spark, rule, input_text='[{"a": 1}]'))
    except TransformEngineError as e:
        eng = ("err", e.kind, e.message, e.path)
    except RuleError as e:
        eng = ("rule_err", e.code, e.message, e.path)
    try:
        orc = ("ok", I.transform(rule, input_text='[{"a": 1}]'))
    except I.InterpError as e:
        orc = ("err", e.kind, e.message, e.path)
    assert eng == orc


def test_when_condition_parse_failure_warns_and_skips(spark):
    """A malformed when/record_when condition is the WARNING channel
    (parse failure behaves like an eval failure — warn and false), not
    a hard error; both engines agree."""
    rule = ("version: 2\ninput: {format: json}\nrecord_when: {all: 5}\n"
            "mappings:\n  - target: r\n    source: input.a\n")
    assert transform(spark, rule, input_text='[{"a": 1}]') == []
    assert I.transform(rule, input_text='[{"a": 1}]') == []

    rule2 = ("version: 2\ninput: {format: json}\nmappings:\n"
             "  - target: r\n    source: input.a\n"
             "    when: {all: 5}\n")
    assert transform(spark, rule2, input_text='[{"a": 1}]') == [{}]
    assert I.transform(rule2, input_text='[{"a": 1}]') == [{}]


def test_structural_rule_errors_stay_on_rule_channel(spark):
    """Rule-structure problems (not expression parse) remain RuleErrors
    — the CLI's rc=2 validation channel."""
    with pytest.raises(RuleError):
        transform(spark, "version: 99\ninput: {format: json}\n"
                  "mappings:\n  - target: r\n    source: input.a\n",
                  input_text="[]")
