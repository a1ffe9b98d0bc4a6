"""Golden-fixture parity tests against the reference's own test corpus.

Runs every fixture dir under the reference checkout (read in place —
nothing is copied): ``rules.yaml`` + ``input.(json|csv)``
[+ ``context.json``] must produce ``expected.json`` exactly (structural
JSON equality), or the ``expected_error.json`` {kind} for error fixtures.
Mirrors ``crates/rulemorph/tests/transform_golden.rs``.

Skipped wholesale if the reference checkout is absent.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from rulemorph_spark.engine import transform
from rulemorph_spark.errors import RuleError, TransformEngineError

FIXTURES = "/root/reference/crates/rulemorph/tests/fixtures"

if os.path.isdir(FIXTURES):
    ALL_DIRS = sorted(
        d for d in os.listdir(FIXTURES)
        if os.path.isfile(os.path.join(FIXTURES, d, "rules.yaml")))
else:
    ALL_DIRS = []

TRANSFORM_DIRS = [d for d in ALL_DIRS
                  if os.path.isfile(os.path.join(FIXTURES, d, "expected.json"))]
ERROR_DIRS = [d for d in ALL_DIRS
              if os.path.isfile(os.path.join(FIXTURES, d,
                                             "expected_error.json"))]


def _json_eq(a, b, *, rel=1e-9) -> bool:
    """Structural JSON equality with float tolerance (serde f64 and Spark
    double agree bit-for-bit on arithmetic, but parse/format round trips
    may differ in the last ulp)."""
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b if isinstance(a, bool) and isinstance(b, bool) else False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if a == b:
            return True
        return math.isclose(a, b, rel_tol=rel, abs_tol=1e-12)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_json_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_json_eq(a[k], b[k]) for k in a)
    return a == b


def _load_fixture(d: str):
    base = os.path.join(FIXTURES, d)
    with open(os.path.join(base, "rules.yaml"), encoding="utf-8") as fh:
        rule_text = fh.read()
    input_path = None
    input_text = None
    for name in ("input.json", "input.csv"):
        p = os.path.join(base, name)
        if os.path.isfile(p):
            input_path = p
            with open(p, encoding="utf-8") as fh:
                input_text = fh.read()
            break
    context = None
    ctx_path = os.path.join(base, "context.json")
    if os.path.isfile(ctx_path):
        with open(ctx_path, encoding="utf-8") as fh:
            context = json.load(fh)
    return rule_text, input_text, input_path, context


@pytest.mark.parametrize("fixture", TRANSFORM_DIRS)
def test_golden_transform(spark, fixture):
    rule_text, input_text, input_path, context = _load_fixture(fixture)
    with open(os.path.join(FIXTURES, fixture, "expected.json"),
              encoding="utf-8") as fh:
        expected = json.load(fh)
    actual = transform(spark, rule_text, input_text=input_text,
                       input_path=input_path, context=context,
                       base_dir="/root/reference/crates/rulemorph")
    assert _json_eq(actual, expected), (
        f"{fixture}:\nexpected: {json.dumps(expected, indent=1)}\n"
        f"actual:   {json.dumps(actual, indent=1)}")


@pytest.mark.parametrize("fixture", ERROR_DIRS)
def test_golden_error(spark, fixture):
    rule_text, input_text, input_path, context = _load_fixture(fixture)
    with open(os.path.join(FIXTURES, fixture, "expected_error.json"),
              encoding="utf-8") as fh:
        expected = json.load(fh)
    with pytest.raises((TransformEngineError, RuleError)) as exc_info:
        transform(spark, rule_text, input_text=input_text,
                  input_path=input_path, context=context,
                  base_dir="/root/reference/crates/rulemorph")
    err = exc_info.value
    kind = getattr(err, "kind", getattr(err, "code", None))
    assert kind == expected.get("kind"), (
        f"{fixture}: expected kind {expected.get('kind')!r}, got {kind!r} "
        f"({err})")
    # the reference's golden runner asserts {kind, path} together
    # (transform_golden.rs: ExpectedTransformError) — so do we
    if "path" in expected:
        path = getattr(err, "path", None)
        assert path == expected["path"], (
            f"{fixture}: expected path {expected['path']!r}, got {path!r} "
            f"({err})")
