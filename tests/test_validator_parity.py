"""Validator error-code parity (round 5).

Pins the structural checks the reference validator performs beyond the
golden fixtures (``crates/rulemorph/src/validator.rs``): missing
sections (``:427-447``), missing mappings (``:43-47``), empty targets
(``:305-311``), step shape (``:54-92,119-126,171-186``), and finalize
shape (``:202-259``).  Each case asserts the exact (code, path) the
reference emits.
"""

import pytest

from rulemorph_spark.model import parse_rule_file
from rulemorph_spark.validator import validate_rule_source

CASES = [
    ("version: 1\ninput:\n  format: csv\nmappings: []\n",
     [("MissingCsvSection", "input.csv"),
      ("MissingMappings", "mappings")]),
    ("version: 1\ninput: {format: json}\nmappings:\n"
     "  - {target: a, source: a}\n",
     [("MissingJsonSection", "input.json")]),
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: '  ', source: a}\n",
     [("MissingTarget", "mappings[0].target")]),
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: '', source: a}\n",
     [("MissingTarget", "mappings[0].target"),
      ("InvalidPath", "mappings[0].target")]),
    ("version: 1\ninput: {format: json, json: {}}\nsteps:\n"
     "  - mappings:\n      - {target: a, source: a}\n",
     [("InvalidStep", "steps")]),
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - mappings:\n      - {target: a, source: a}\n"
     "    record_when: {eq: ['@input.a', 1]}\n",
     [("InvalidStep", "steps[0]")]),
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - name: only-a-name\n",
     [("InvalidStep", "steps[0]")]),
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - asserts:\n      - when: {eq: ['@input.a', 1]}\n"
     "        error: {code: ' ', message: ''}\n",
     [("InvalidStep", "steps[0].asserts[0].error")]),
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - branch:\n      when: {eq: ['@input.a', 1]}\n      then: ''\n",
     [("InvalidStep", "steps[0].branch.then")]),
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - branch:\n      when: {eq: ['@input.a', 1]}\n"
     "      then: x.yaml\n      else: ''\n",
     [("InvalidStep", "steps[0].branch.else")]),
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a}\nfinalize:\n  limit: 1\n",
     [("InvalidFinalize", "finalize")]),
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a}\nfinalize:\n"
     "  sort: {by: a, order: sideways}\n",
     [("InvalidFinalize", "finalize.sort.order")]),
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a}\nfinalize:\n  sort: {by: 'a..b'}\n",
     [("InvalidPath", "finalize.sort.by")]),
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a}\nfinalize:\n"
     "  filter: {op: '>', args: [{ref: item.a}, 1]}\n",
     [("InvalidFinalize", "finalize.filter")]),
]

VALID = [
    # finalize.filter with @item in scope is legal
    "version: 2\ninput: {format: json, json: {}}\nmappings:\n"
    "  - {target: a, source: a}\nfinalize:\n"
    "  filter: {gt: ['@item.a', 1]}\n",
    # a merging branch step followed by an @out ref to its targets
    "version: 2\ninput: {format: json, json: {}}\nsteps:\n"
    "  - branch: {when: {eq: ['@input.k', 'x']}, then: ./b.yaml}\n"
    "  - mappings:\n"
    "      - {target: c, expr: ['@out.from_branch', 'to_string']}\n",
]


@pytest.mark.parametrize("rules,expect", CASES,
                         ids=[e[0][0] + "-" + str(i)
                              for i, e in enumerate(CASES)])
def test_structural_validation_codes(rules, expect):
    errors = validate_rule_source(parse_rule_file(rules), rules)
    got = [(e.code, e.path) for e in errors]
    assert got == expect, got


@pytest.mark.parametrize("rules", VALID)
def test_structural_validation_accepts(rules):
    errors = validate_rule_source(parse_rule_file(rules), rules)
    assert errors == [], [(e.code, e.path) for e in errors]


def test_all_reference_error_codes_emittable():
    """Every ErrorCode the reference validator can emit has at least
    one push site in this validator (diff of validator.rs vs
    validator.py, round-5 sweep)."""
    import re
    from pathlib import Path
    src = Path("rulemorph_spark/validator.py").read_text()
    mine = set(re.findall(r'push\("([A-Za-z]+)"', src))
    reference_codes = {
        "DuplicateTarget", "ForwardOutReference", "InvalidArgs",
        "InvalidDelimiterLength", "InvalidExprShape", "InvalidFinalize",
        "InvalidPath", "InvalidRefNamespace", "InvalidStep",
        "InvalidTypeName", "InvalidVersion", "InvalidWhenType",
        "MissingCsvColumns", "MissingCsvSection", "MissingJsonSection",
        "MissingMappingValue", "MissingMappings", "MissingTarget",
        "SourceValueExprExclusive", "StepsMappingExclusive", "UnknownOp",
    }
    missing = reference_codes - mine
    assert not missing, missing
