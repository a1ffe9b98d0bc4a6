"""DTO golden tests against the reference fixtures (dto01/dto02),
byte-exact per language (``tests/dto_golden.rs`` model)."""

from __future__ import annotations

import os

import pytest

from rulemorph_spark.dto import generate_dto
from rulemorph_spark.model import parse_rule_file

FIXTURES = "/root/reference/crates/rulemorph/tests/fixtures"
EXT = {"rust": "rs", "typescript": "ts", "python": "py", "go": "go",
       "java": "java", "kotlin": "kt", "swift": "swift"}

CASES = []
if os.path.isdir(FIXTURES):
    for d in sorted(os.listdir(FIXTURES)):
        if not d.startswith("dto"):
            continue
        for lang, ext in EXT.items():
            p = os.path.join(FIXTURES, d, f"expected_{lang}.{ext}")
            if os.path.isfile(p):
                CASES.append((d, lang))


@pytest.mark.parametrize("case,lang", CASES)
def test_dto_golden(case, lang):
    base = os.path.join(FIXTURES, case)
    with open(os.path.join(base, "rules.yaml"), encoding="utf-8") as fh:
        rule = parse_rule_file(fh.read())
    with open(os.path.join(base, f"expected_{lang}.{EXT[lang]}"),
              encoding="utf-8") as fh:
        expected = fh.read()
    actual = generate_dto(rule, lang)
    assert actual == expected, (
        f"{case}/{lang}:\n--- expected ---\n{expected}\n--- actual ---\n"
        f"{actual}")
