"""Dynamic dot-path parse classification: the in-plan DFA must equal
the exact Python parser (``paths.parse_path``, itself a line-mirror of
``path.rs:28-166``) on EVERY input — wording and scan order included
(round 8, VERDICT r7 #5; previously regex classes only approximated
the order)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from rulemorph_spark.compiler import variant as V
from rulemorph_spark.errors import RuleError
from rulemorph_spark.paths import parse_path


def _oracle(p: str) -> str:
    try:
        parse_path(p)
        return "ok"
    except RuleError as e:
        return e.message


def _classify(spark, cases: list[str]) -> list[tuple[str, str]]:
    df = spark.createDataFrame([(c,) for c in cases], "k string")
    rows = df.select(
        F.col("k"),
        V.path_parse_guard(F.col("k"),
                           lambda m: F.lit("ERR:" + m)).alias("r")
    ).collect()
    out = []
    for row in rows:
        got = "ok" if row["r"] == row["k"] else (row["r"] or "ERR:?")[4:]
        out.append((row["k"], got))
    return out


def test_dfa_matches_exact_parser_exhaustive(spark):
    cases = set()
    for length in range(1, 5):
        for tup in itertools.product('a."[]\\\'0', repeat=length):
            cases.add("".join(tup))
    rng = random.Random(8)
    alphabet = list('ab."\'[]\\01.')
    for _ in range(2000):
        cases.add("".join(rng.choice(alphabet)
                          for _ in range(rng.randint(5, 14))))
    # unicode incl. a supplementary-plane char (splits into surrogate
    # halves under Java's per-code-unit split — must stay harmless)
    cases |= {"日本.語", 'a["日本語"]', "a.𝄞b", 'x["𝄞"]', 'x["𝄞]',
              "a[\"é\\q\"]", "é..b"}
    cases = sorted(cases)
    mism = [(k, _oracle(k), got)
            for k, got in _classify(spark, cases) if _oracle(k) != got]
    assert not mism, mism[:10]
