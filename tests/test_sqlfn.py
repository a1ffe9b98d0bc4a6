"""SQL-function fast path: capability probes + cross-path parity.

The ops that compile to session SQL functions outside lambda scopes
(arith, dates) keep an inline Column fallback for lambda contexts.
These tests pin (a) the Spark capabilities the design rests on, and
(b) that the two paths agree value-for-value and error-for-error on a
corpus covering every protocol branch — the drift detector for the
dual implementation (round 8, VERDICT r7 #1).
"""

from __future__ import annotations

import json

import pytest

from rulemorph_spark.compiler import sqlfn
from rulemorph_spark.engine import transform
from rulemorph_spark.errors import TransformEngineError


def _run(spark, rule, record):
    try:
        out = transform(spark, rule, input_text=json.dumps([record]))
        return ("ok", out)
    except TransformEngineError as e:
        return ("err", e.kind, e.message, e.path)


def _both_paths(spark, rule, record):
    """(sql-path result, inline result) for the same rule+record."""
    fast = _run(spark, rule, record)
    sqlfn.disable(spark)
    try:
        slow = _run(spark, rule, record)
    finally:
        sqlfn.enable(spark)
    return fast, slow


ARITH_RULE = """
version: 1
input: {format: json, json: {}}
mappings:
  - target: out
    expr: {op: "%(op)s", args: [{ref: "input.a"}, {ref: "input.b"}]}
"""

V2_RULE = """
version: 2
input: {format: json}
mappings:
  - target: out
    expr: ["@input.a", {%(op)s: ["@input.b"]}]
"""

DATE_RULE = """
version: 1
input: {format: json, json: {}}
mappings:
  - target: out
    expr:
      op: date_format
      args: [{ref: "input.d"}, "%Y/%m/%d %H:%M:%S%:z", "+09:00"]
  - target: epoch
    expr: {op: to_unixtime, args: [{ref: "input.d"}, "ms"]}
"""

ARITH_RECORDS = [
    {"a": 80.6, "b": "2.5"},
    {"a": 1, "b": 2},
    {"a": 1, "b": "x"},           # conversion error
    {"b": 2},                     # missing → missing
    {"a": 1, "b": None},          # null protocol error
    {"a": 1, "b": 0},             # ÷0 paths
    {"a": "inf", "b": 1},         # rust grammar non-finite → error (v1)
    {"a": "1e308", "b": "1e308"}, # overflow → not finite (v1 +)
    {"a": True, "b": 1},          # bool → error
    {"a": [1], "b": 1},           # container → error
    {"a": "0.1", "b": "0.2"},
    {"a": -0.0, "b": 0.0},
]

DATE_RECORDS = [
    {"d": "2024-01-02T03:04:05Z"},
    {"d": "2024-01-02 03:04:05"},
    {"d": "2024-01-02T03:04:05.123+09:00"},
    {"d": "Tue, 02 Jan 2024 03:04:05 +0900"},
    {"d": "20240102"},
    {"d": "not a date"},          # invalid-date error
    {"d": 12345},                 # value must be a string
    {"d": None},                  # null protocol
    {},                           # missing → missing
]


@pytest.mark.parametrize("op", ["+", "-", "*", "/"])
def test_arith_paths_agree_v1(spark, op):
    rule = ARITH_RULE % {"op": op}
    for rec in ARITH_RECORDS:
        fast, slow = _both_paths(spark, rule, rec)
        assert fast == slow, (op, rec, fast, slow)


@pytest.mark.parametrize("op", ["add", "divide"])
def test_arith_paths_agree_v2(spark, op):
    rule = V2_RULE % {"op": op}
    for rec in ARITH_RECORDS:
        fast, slow = _both_paths(spark, rule, rec)
        assert fast == slow, (op, rec, fast, slow)


def test_date_paths_agree(spark):
    for rec in DATE_RECORDS:
        fast, slow = _both_paths(spark, DATE_RULE, rec)
        assert fast == slow, (rec, fast, slow)


def test_sql_path_engages_and_shares(spark):
    """The fast path must actually be taken at top level, and two
    mappings differing only in error paths must SHARE one session
    function (the slot-parameterization contract)."""
    from pyspark.sql import functions as F

    from rulemorph_spark.engine import transform_table

    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    rule = """
version: 1
input: {format: json, json: {}}
mappings:
  - target: x
    expr: {op: "+", args: [{ref: "input.a"}, {ref: "input.b"}]}
  - target: y
    expr: {op: "+", args: [{ref: "input.b"}, {ref: "input.a"}]}
"""
    before = sqlfn.registered_names(spark)
    out = transform_table(df, rule, mode="variant")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "_rm_ar_" in plan, "fast path not engaged"
    new = {n for n in sqlfn.registered_names(spark)
           if n.startswith("_rm_ar_")} - before
    # both mappings (and both within one) resolve to the same function
    import re
    names = set(re.findall(r"_rm_ar_\w+", plan))
    assert len(names) == 1, names
    rows = out.selectExpr("to_json(x) AS x", "to_json(y) AS y").collect()
    assert (rows[0]["x"], rows[0]["y"]) == ("3", "3")


def test_inline_path_used_inside_lambdas(spark):
    """Arith inside a {map:} body compiles inline (SQL-function args
    cannot reference Catalyst lambda variables) and still matches."""
    rule = """
version: 2
input: {format: json}
mappings:
  - target: out
    expr: ["@input.xs", {map: [{add: [1]}]}]
"""
    out = transform(spark, rule, input_text=json.dumps(
        [{"xs": [1, 2.5, "3"]}]))
    assert out == [{"out": [2.0, 3.5, 4.0]}]


def test_earlier_conversion_error_wins_over_later_arg_raise(spark):
    """ADVICE r8 #4: the absent-guard must cover earlier-operand
    CONVERSION failures, not just missing/null — the reference
    converts operand i before evaluating arg i+1, so a bool operand's
    "expected number" error fires before a later step-bearing arg's
    embedded division-by-zero.  Pinned against the interpreter oracle
    on both the SQL-function and inline paths."""
    import pytest as _pytest
    from rulemorph_spark import interp
    rule = """
version: 2
input: {format: json}
mappings:
  - target: out
    expr: ["@input.a", {"+": [["@input.b", {"/": [0]}]]}]
"""
    cases = [
        # bool operand 0 → its conversion error wins
        {"a": True, "b": 1},
        # numeric operand 0 → the heavy arg's ÷0 error fires
        {"a": 1, "b": 1},
        # missing operand 0 → whole op missing (r6 class, still green)
        {"b": 1},
    ]
    for rec in cases:
        try:
            expected = ("ok", interp.transform(
                rule, input_text=json.dumps([rec])))
        except interp.InterpError as e:
            expected = ("err", e.kind_snake, e.message, e.path) \
                if hasattr(e, "kind_snake") else ("err", e)
        fast, slow = _both_paths(spark, rule, rec)
        assert fast == slow, (rec, fast, slow)
        if expected[0] == "ok":
            assert fast[0] == "ok" and fast[1] == expected[1], \
                (rec, fast, expected)
        else:
            assert fast[0] == "err", (rec, fast)
            if len(expected) == 4:
                assert (fast[2], fast[3]) == (expected[2], expected[3]), \
                    (rec, fast, expected)
            else:
                err = expected[1]
                assert (fast[2], fast[3]) == (err.message, err.path), \
                    (rec, fast, err)


def test_deferred_registration_parallel_and_loud(spark):
    """r9: inside sqlfn.deferred, ensure_fn submits CREATEs to the
    background pool and returns the hash-derived name immediately;
    flush resolves everything (including bodies that reference still-
    pending helper names) and a malformed body still propagates
    LOUDLY at the barrier — never a silent slow path."""
    import pyspark.sql.functions as F

    with sqlfn.deferred(spark):
        h = sqlfn.ensure_fn("v BIGINT", "BIGINT", "v + 1", "tdefh")
        assert h is not None
        # dependent body references the still-pending helper by name
        dep = sqlfn.ensure_fn("v BIGINT", "BIGINT", f"{h}(v) * 10",
                              "tdefd")
        assert dep is not None
        st = sqlfn._state(spark)
        assert h in st.pending or h in st.registered
    # scope exit flushed: both callable, correct composition
    row = spark.range(1).select(
        sqlfn.call(dep, F.lit(4).cast("long")).alias("x")).collect()[0]
    assert row["x"] == 50
    assert {h, dep} <= sqlfn.registered_names(spark)

    # failure propagates at the barrier (scope exit), not silently
    import pytest as _pt
    with _pt.raises(Exception):
        with sqlfn.deferred(spark):
            sqlfn.ensure_fn("v BIGINT", "BIGINT",
                            "this_is_not_a_function(v", "tdefbad")
    # the registry is still healthy afterwards
    assert not sqlfn._state(spark).disabled
    ok = sqlfn.ensure_fn("v BIGINT", "BIGINT", "v + 2", "tdefok")
    row = spark.range(1).select(
        sqlfn.call(ok, F.lit(1).cast("long")).alias("x")).collect()[0]
    assert row["x"] == 3


def test_deferred_scope_is_thread_local(spark):
    """r10 (ADVICE r9): the deferred flag must only apply to the
    thread INSIDE the scope — a concurrent ensure_fn from another
    thread keeps the synchronous register-then-call-immediately
    contract (its CREATE has run before the call returns)."""
    from pyspark import InheritableThread

    result: dict = {}

    def other_thread():
        # a fresh py4j-pinned JVM thread has no active session; a real
        # concurrent driver thread would bind one the same way
        spark._jvm.SparkSession.setActiveSession(spark._jsparkSession)
        # runs while the main thread holds a deferred scope
        name = sqlfn.ensure_fn("v BIGINT", "BIGINT", "v + 41", "ttloc")
        st = sqlfn._state(spark)
        result["name"] = name
        result["registered"] = name in st.registered
        result["pending"] = name in st.pending

    with sqlfn.deferred(spark):
        t = InheritableThread(target=other_thread)
        t.start()
        t.join()
    assert result["name"] is not None
    assert result["registered"] and not result["pending"]
    import pyspark.sql.functions as F
    row = spark.range(1).select(
        sqlfn.call(result["name"], F.lit(1).cast("long"))
        .alias("x")).collect()[0]
    assert row["x"] == 42


def test_deferred_scope_drains_all_failures_on_clean_exit(spark):
    """r10 (ADVICE r9): a scope with TWO malformed bodies must drain
    both failed futures on exit (re-raising the first) — neither may
    linger in st.pending to poison a later unrelated flush."""
    import pytest as _pt
    with _pt.raises(Exception):
        with sqlfn.deferred(spark):
            sqlfn.ensure_fn("v BIGINT", "BIGINT",
                            "bad_one(v", "tdrain1")
            sqlfn.ensure_fn("v BIGINT", "BIGINT",
                            "bad_two(v", "tdrain2")
    assert sqlfn._state(spark).pending == {}
    sqlfn.flush(spark)  # clean — no poisoned leftovers


def test_deferred_failure_does_not_poison_later_flushes(spark):
    """A failed deferred CREATE raises at its barrier and is removed —
    subsequent flushes/compiles of the session stay healthy."""
    import pytest as _pt
    with _pt.raises(Exception):
        with sqlfn.deferred(spark):
            sqlfn.ensure_fn("v BIGINT", "BIGINT",
                            "nope_not_real(v", "tpois")
    # later flushes are clean and new registrations work
    sqlfn.flush(spark)
    assert sqlfn._state(spark).pending == {}
    import pyspark.sql.functions as F
    ok = sqlfn.ensure_fn("v BIGINT", "BIGINT", "v * 3", "tpoisok")
    row = spark.range(1).select(
        sqlfn.call(ok, F.lit(2).cast("long")).alias("x")).collect()[0]
    assert row["x"] == 6
