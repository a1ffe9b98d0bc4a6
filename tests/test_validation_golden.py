"""Static-validation golden tests against the reference's v01–v11 and
tv26_* fixtures (``crates/rulemorph/tests/validation.rs`` model):
expected ``{code, path}`` pairs must match exactly."""

from __future__ import annotations

import json
import os

import pytest

from rulemorph_spark.model import parse_rule_file
from rulemorph_spark.validator import validate_rule

FIXTURES = "/root/reference/crates/rulemorph/tests/fixtures"

if os.path.isdir(FIXTURES):
    CASES = sorted(
        d for d in os.listdir(FIXTURES)
        if os.path.isfile(os.path.join(FIXTURES, d, "expected_errors.json")))
else:
    CASES = []


@pytest.mark.parametrize("case", CASES)
def test_validation_golden(case):
    base = os.path.join(FIXTURES, case)
    with open(os.path.join(base, "rules.yaml"), encoding="utf-8") as fh:
        rule = parse_rule_file(fh.read())
    with open(os.path.join(base, "expected_errors.json"),
              encoding="utf-8") as fh:
        expected = json.load(fh)
    errors = validate_rule(rule)
    got = sorted((e.code, e.path) for e in errors)
    want = sorted((e["code"], e.get("path")) for e in expected)
    assert got == want, f"{case}: got {got}, want {want}"


# valid rules must validate clean (validation.rs valid_rules list model)
VALID = [d for d in (sorted(os.listdir(FIXTURES)) if CASES else [])
         if d.startswith(("t0", "t1", "t2", "tv2", "tv3", "tv4"))
         and os.path.isfile(os.path.join(FIXTURES, d, "expected.json"))
         and os.path.isfile(os.path.join(FIXTURES, d, "rules.yaml"))]


@pytest.mark.parametrize("case", VALID)
def test_valid_rules_pass(case):
    base = os.path.join(FIXTURES, case)
    with open(os.path.join(base, "rules.yaml"), encoding="utf-8") as fh:
        rule = parse_rule_file(fh.read())
    errors = validate_rule(rule)
    assert errors == [], f"{case}: unexpected errors {errors}"
