"""Default-chain date parsing with the round-5 structural gate.

``_fmt_gate_regex`` skips formats whose shape can't match before any
``try_to_timestamp`` attempt.  The gate must be loose-or-equal to the
parser: these cases cover EVERY format family in the default chain
(RFC3339, tz'd, RFC2822, naive) and assert the parsed instant, so a
gate that wrongly rejects its own format's values fails loudly here.
"""

import json

import pytest

from rulemorph_spark.compiler.ops_date import (_DEFAULT_NAIVE,
                                               _DEFAULT_WITH_TZ,
                                               _RFC3339,
                                               _fmt_gate_regex)
from rulemorph_spark.engine import transform

# (input string, expected epoch seconds UTC)
CASES = [
    ("2024-01-02T03:04:05+09:00", 1704132245),   # RFC3339
    ("2024-01-02T03:04:05.123+09:00", 1704132245),
    ("2024-01-02 03:04:05+09:00", 1704132245),
    ("2024-01-02T03:04:05+0900", 1704132245),
    ("2024-01-02 03:04:05+0900", 1704132245),
    ("2024/01/02 03:04:05+09:00", 1704132245),
    ("2024/01/02 03:04:05+0900", 1704132245),
    ("2024-01-02T03:04:05Z", 1704164645),
    ("Tue, 02 Jan 2024 03:04:05 +0900", 1704132245),  # RFC2822
    ("02 Jan 2024 03:04:05 +0900", 1704132245),       # no weekday
    ("2024-01-02", 1704153600),                  # naive date
    ("2024/01/02", 1704153600),
    ("20240102", 1704153600),
    ("2024-01-02 03:04", 1704164640),
    ("2024/01/02 03:04", 1704164640),
    ("2024-01-02 03:04:05", 1704164645),
    ("2024/01/02 03:04:05", 1704164645),
    ("2024-01-02T03:04", 1704164640),
    ("2024-01-02T03:04:05", 1704164645),
    ("2024-01-02T03:04:05.500", 1704164645),
    ("2024-01-02 03:04:05.500", 1704164645),
    ("2024/01/02 03:04:05.500", 1704164645),
]

RULE = """
version: 1
input:
  format: json
  json: {}
mappings:
  - target: "epoch"
    expr:
      op: "to_unixtime"
      args:
        - { ref: "input.d" }
"""


def test_default_chain_all_families_still_parse(spark):
    data = json.dumps([{"d": s} for s, _ in CASES])
    got = transform(spark, RULE, input_text=data)
    expected = [{"epoch": e} for _, e in CASES]
    for (s, _), g, e in zip(CASES, got, expected):
        assert g == e, (s, g, e)


def test_gate_regex_accepts_own_format_values():
    """Python-side: each case's string passes at least one gate in the
    chain it belongs to (the gate never filters the whole chain)."""
    import re
    chain = _RFC3339 + _DEFAULT_WITH_TZ + _DEFAULT_NAIVE
    gates = [re.compile(_fmt_gate_regex(f)) for f in chain]
    for s, _ in CASES:
        if "Jan" in s:
            continue  # RFC2822 path is not chrono-gated
        assert any(g.match(s) for g in gates), s


def test_gate_regex_shapes():
    assert _fmt_gate_regex("%Y-%m-%d") == r"^\d+\-\d+\-\d+$"
    rx = _fmt_gate_regex("%Y-%m-%dT%H:%M:%S%.f%:z")
    import re
    assert re.match(rx, "2024-01-02T03:04:05.123+09:00")
    assert re.match(rx, "2024-01-02T03:04:05Z")
    assert not re.match(rx, "2024-01-02 03:04:05")


def test_invalid_dates_still_error(spark):
    with pytest.raises(Exception) as exc:
        transform(spark, RULE,
                  input_text=json.dumps([{"d": "not a date"}]))
    assert "date format is invalid" in str(exc.value)
