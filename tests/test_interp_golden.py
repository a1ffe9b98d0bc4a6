"""The independent interpreter (``rulemorph_spark.interp``) must pass the
reference's own golden fixtures STANDALONE — no Spark session anywhere.

This is the round-7 third-oracle gate (VERDICT r6 next-round #1): the
interpreter mirrors ``transform.rs``/``v2_eval.rs`` directly with its own
parser and evaluator, so the three-way fuzzers
(``tests/test_pipe_fuzz_threeway.py``) have a ground truth that shares no
code with the Spark engines.

Same corpus and assertions as ``test_golden_reference.py`` (59 runnable
fixtures: 47 transform + 12 {kind, path} error fixtures).
"""

from __future__ import annotations

import json
import math
import os

import pytest

from rulemorph_spark import interp

FIXTURES = "/root/reference/crates/rulemorph/tests/fixtures"

if os.path.isdir(FIXTURES):
    ALL_DIRS = sorted(
        d for d in os.listdir(FIXTURES)
        if os.path.isfile(os.path.join(FIXTURES, d, "rules.yaml")))
else:
    ALL_DIRS = []

TRANSFORM_DIRS = [d for d in ALL_DIRS
                  if os.path.isfile(os.path.join(FIXTURES, d,
                                                 "expected.json"))]
ERROR_DIRS = [d for d in ALL_DIRS
              if os.path.isfile(os.path.join(FIXTURES, d,
                                             "expected_error.json"))]


def _json_eq(a, b, *, rel=1e-9) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return (isinstance(a, bool) and isinstance(b, bool)
                and a is b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if a == b:
            return True
        return math.isclose(a, b, rel_tol=rel, abs_tol=1e-12)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_json_eq(x, y)
                                        for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_json_eq(a[k], b[k])
                                            for k in a)
    return a == b


def _load_fixture(d: str):
    base = os.path.join(FIXTURES, d)
    with open(os.path.join(base, "rules.yaml"), encoding="utf-8") as fh:
        rule_text = fh.read()
    input_text = None
    for name in ("input.json", "input.csv"):
        p = os.path.join(base, name)
        if os.path.isfile(p):
            with open(p, encoding="utf-8") as fh:
                input_text = fh.read()
            break
    context = None
    ctx_path = os.path.join(base, "context.json")
    if os.path.isfile(ctx_path):
        with open(ctx_path, encoding="utf-8") as fh:
            context = json.load(fh)
    return rule_text, input_text, context


@pytest.mark.parametrize("fixture", TRANSFORM_DIRS)
def test_interp_golden_transform(fixture):
    rule_text, input_text, context = _load_fixture(fixture)
    with open(os.path.join(FIXTURES, fixture, "expected.json"),
              encoding="utf-8") as fh:
        expected = json.load(fh)
    actual = interp.transform(
        rule_text, input_text=input_text, context=context,
        base_dir="/root/reference/crates/rulemorph")
    assert _json_eq(actual, expected), (
        f"{fixture}:\nexpected: {json.dumps(expected, indent=1)}\n"
        f"actual:   {json.dumps(actual, indent=1, default=repr)}")


@pytest.mark.parametrize("fixture", ERROR_DIRS)
def test_interp_golden_error(fixture):
    rule_text, input_text, context = _load_fixture(fixture)
    with open(os.path.join(FIXTURES, fixture, "expected_error.json"),
              encoding="utf-8") as fh:
        expected = json.load(fh)
    with pytest.raises(interp.InterpError) as exc_info:
        interp.transform(rule_text, input_text=input_text, context=context,
                         base_dir="/root/reference/crates/rulemorph")
    err = exc_info.value
    assert err.kind == expected.get("kind"), (
        f"{fixture}: expected kind {expected.get('kind')!r}, got "
        f"{err.kind!r} ({err})")
    if "path" in expected:
        assert err.path == expected["path"], (
            f"{fixture}: expected path {expected['path']!r}, got "
            f"{err.path!r} ({err})")


def test_interp_never_imports_spark():
    """The oracle must stay Spark-free: importing it must not pull in
    pyspark, and its module graph must not reference the engines."""
    import sys
    import importlib
    importlib.reload(interp)
    src = open(interp.__file__, encoding="utf-8").read()
    assert "pyspark" not in src
    assert "from .compiler" not in src and "compiler." not in src.replace(
        "the Spark engines", "").replace("compiler/typed.py", "").replace(
        "compiler/variant.py", "")
    assert "expr_ir" not in src.replace("``expr_ir``", "")
