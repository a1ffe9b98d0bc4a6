"""Seeded fuzzer over ARRAY and OBJECT pipes, typed vs variant.

Same contract as ``test_pipe_fuzz``: random 1–2-step v2 pipes over
array/struct columns run through both engines; values must match
(JSON-compared, numerics normalized), errors must match by
{kind, message}, and a one-sided error is a failing divergence.
TypedFallback pipes are skipped (auto mode falls back by design).
"""

from __future__ import annotations

import json
import random
import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rulemorph_spark.compiler.typed import TypedFallback
from rulemorph_spark.engine import transform_table
from rulemorph_spark.errors import decode_dbg_message

RULE = """
version: 2
input: {format: json}
mappings:
  - target: id
    source: id
  - target: out
    expr: [%s]
"""

_ARR_OPS = [
    ('{take: [%d]}', lambda r: r.randrange(-3, 4)),
    ('{drop: [%d]}', lambda r: r.randrange(-3, 4)),
    ('{slice: [%d, %d]}', lambda r: (r.randrange(-2, 3),
                                     r.randrange(0, 4))),
    ('{chunk: [%d]}', lambda r: r.randrange(1, 4)),
    ('{flatten: []}', None),
    ('{unique: []}', None),
    ('{sum: []}', None),
    ('{avg: []}', None),
    ('{min: []}', None),
    ('{max: []}', None),
    ('{first: []}', None),
    ('{last: []}', None),
    ('{len: []}', None),
    ('{index_of: [%d]}', lambda r: r.randrange(0, 4)),
    ('{contains: [%d]}', lambda r: r.randrange(0, 4)),
    ('{map: [{multiply: [%d]}]}', lambda r: r.randrange(-2, 3)),
    ('{filter: [["@item", {gt: [%d]}]]}', lambda r: r.randrange(0, 3)),
    ('{reduce: [["@acc", {add: ["@item"]}]]}', None),
    ('{sort_by: [["@item"]]}', None),
    ('{sort_by: [["@item"], ["lit:desc"]]}', None),
]

_OBJ_OPS = [
    ('{keys: []}', None),
    ('{values: []}', None),
    ('{entries: []}', None),
    ('{len: []}', None),
    ('{get: ["%s"]}', lambda r: r.choice(["a", "b", "nope"])),
    ('{pick: ["%s"]}', lambda r: r.choice(["a", "b"])),
    ('{omit: ["%s"]}', lambda r: r.choice(["a", "c"])),
    ('{merge: [{z: 9}]}', None),
]

_ERR = re.compile(r'RULEMORPH_ERROR:(\{.*?\})')


def _nrm(v):
    # top-level missing vs JSON null is NOT distinguishable through
    # to_json on the variant side; the dedicated missing-semantics
    # suites (v2_missing goldens) pin that axis — the fuzzer folds
    # both to None
    if v == "__MISSING__":
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, list):
        return [_nrm(x) for x in v]
    if isinstance(v, dict):
        return {k: _nrm(x) for k, x in v.items()}
    return v


def _run(df, rule, mode):
    try:
        out = transform_table(df, rule, mode=mode)
        if "out" not in out.columns:
            # all-missing mapping: the target column is dropped
            return "ok", {r["id"]: None
                          for r in out.select(
                              F.col("id").try_cast("long").alias("id")
                          ).collect()}
        dt = out.schema["out"].dataType
        if mode == "variant" or isinstance(
                dt, (T.StructType, T.ArrayType, T.MapType)):
            rows = out.select(
                F.col("id").try_cast("long").alias("id"),
                F.to_json("out").alias("out")).collect()
            return "ok", {r["id"]: (None if r["out"] is None
                                    else _nrm(json.loads(r["out"])))
                          for r in rows}
        return "ok", {r["id"]: _nrm(r["out"]) for r in out.collect()}
    except TypedFallback:
        raise
    except Exception as e:
        m = _ERR.search(str(e))
        if not m:
            raise
        err = json.loads(m.group(1))
        return "err", {"kind": err["kind"],
                       "message": decode_dbg_message(err["message"])}


def _fuzz(spark, df, ids, ops, starts, seed, iters, depth=(1, 3)):
    rng = random.Random(seed)
    compared = skipped = 0
    for _ in range(iters):
        start = rng.choice(starts)
        steps = []
        for _ in range(rng.randrange(*depth)):
            tmpl, gen = rng.choice(ops)
            if gen is None:
                steps.append(tmpl)
            else:
                args = gen(rng)
                steps.append(tmpl % args)
        expr = f'"{start}", ' + ", ".join(steps)
        rule = RULE % expr
        try:
            tkind, tres = _run(df, rule, "typed")
        except TypedFallback:
            skipped += 1
            continue
        vkind, vres = _run(df, rule, "variant")
        if tkind == "err" or vkind == "err":
            for rid in ids:
                one = df.filter(F.col("id") == rid)
                try:
                    tk, tr = _run(one, rule, "typed")
                except TypedFallback:
                    tk = None
                if tk is None:
                    continue
                vk, vr = _run(one, rule, "variant")
                assert tk == vk, (expr, rid, tk, tr, vk, vr)
                if tk == "err":
                    assert tr == vr, (expr, rid, tr, vr)
            compared += 1
            continue
        assert tres == vres, (expr, tres, vres)
        compared += 1
    return compared, skipped


def test_random_array_pipes_parity(spark):
    df = spark.createDataFrame(
        [(1, [3, 1, 2], ["b", "a"]),
         (2, [], []),
         (3, [5, 5, -1, 0], ["x"]),
         (4, None, None)],
        "id long, nums array<long>, strs array<string>")
    compared, skipped = _fuzz(
        spark, df, (1, 2, 3, 4), _ARR_OPS,
        ["@input.nums", "@input.strs"], seed=787878, iters=30)
    assert compared >= 12, (compared, skipped)


def test_random_object_pipes_parity(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "x", "c": True}),
         (2, {"a": 0, "b": "", "c": False}),
         (3, None)],
        "id long, obj struct<a: long, b: string, c: boolean>")
    compared, skipped = _fuzz(
        spark, df, (1, 2, 3), _OBJ_OPS,
        ["@input.obj"], seed=565656, iters=30)
    assert compared >= 10, (compared, skipped)


def test_map_step_over_null_array_errors_both_engines(spark):
    """The v2 map step requires an array — a runtime JSON null errors
    ("map step requires array", v2_eval.rs:973) in BOTH engines, while
    a missing input stays missing (fuzz-found typed divergence: null
    used to pass through as null)."""
    df = spark.createDataFrame([(1, [1, 2]), (2, None)],
                               "id long, nums array<long>")
    rule = RULE % '"@input.nums", {map: [{multiply: [2]}]}'
    for mode in ("typed", "variant"):
        kind, res = _run(df.filter(F.col("id") == 2), rule, mode)
        assert kind == "err", (mode, res)
        assert res["message"] == "map step requires array, got Null", \
            (mode, res)
        kind, res = _run(df.filter(F.col("id") == 1), rule, mode)
        assert kind == "ok" and res == {1: [2.0, 4.0]}, (mode, res)


def test_random_condition_comparisons_parity(spark):
    """Strict v2 condition comparisons (eq/ne/gt/gte/lt/lte) over
    random column/literal pairs through an if step, typed vs variant —
    pins _t_compare against v2_eq/compare ordering semantics
    (numbers, strings, bools, nulls, cross-type)."""
    rng = random.Random(909090)
    df = spark.createDataFrame(
        [(1, 7, 2.5, "b", True),
         (2, -3, 7.0, "B", False),
         (3, 0, -0.0, "", None),
         (4, None, None, None, True)],
        "id long, i long, x double, s string, b boolean")
    refs = ['"@input.i"', '"@input.x"', '"@input.s"', '"@input.b"']
    lits = ["7", "7.0", "-3", "0", '"lit:b"', '"lit:"', "true", "false",
            "null", '"lit:7"', '"lit:-3.5"']
    compared = skipped = 0
    for _ in range(40):
        op = rng.choice(["eq", "ne", "gt", "gte", "lt", "lte"])
        left = rng.choice(refs + lits)
        right = rng.choice(refs + lits)
        cond = f'{{{op}: [[{left}], [{right}]]}}'
        expr = (f'"$", {{if: {{cond: {cond}, '
                f'then: ["lit:T"], else: ["lit:F"]}}}}')
        rule = RULE % expr
        try:
            tkind, tres = _run(df, rule, "typed")
        except TypedFallback:
            skipped += 1
            continue
        vkind, vres = _run(df, rule, "variant")
        assert tkind == vkind, (cond, tkind, tres, vkind, vres)
        if tkind == "ok":
            assert tres == vres, (cond, tres, vres)
        compared += 1
    assert compared >= 20, (compared, skipped)


# --- round 6: the TVal.errs class (static decisions must not drop
# --- per-row runtime error state) --------------------------------------

def test_positional_operand_protocol(spark):
    """The reference evaluates operands IN ORDER: each one's errors
    fire when it is reached, *missing* short-circuits the whole op
    (later operands never evaluate), *null* errors (op_concat,
    transform.rs:1403-1432).  r6 found both engines wrong in opposite
    directions: typed's any-static-missing shortcut dropped an earlier
    operand's ÷0 raise; the variant V.let bindings evaluated a LATER
    heavy arg's ÷0 raise that a missing earlier operand should have
    suppressed."""
    df = spark.createDataFrame([(1, 5, None)],
                               "id long, a long, s string")
    div = '{divide: ["$", 0]}, {to_string: []}'
    # error chain IS the pipe value → evaluated first → error wins
    err_first = RULE % f'"@input.a", {div}, {{concat: ["@input.absent"]}}'
    # missing operand first (pipe start) → later ÷0 chain suppressed
    miss_first = RULE % ('{concat: [["@input.a", ' + div +
                         '], "@input.absent"]}')
    # null pipe value then missing arg → the null error (positional)
    null_first = RULE % '"@input.s", {concat: ["@input.absent"]}'
    for mode in ("variant", "auto"):
        kind, res = _run(df, err_first, mode)
        assert (kind, res.get("message") if kind == "err" else res) == \
            ("err", "division by zero"), (mode, kind, res)
        kind, res = _run(df, miss_first, mode)
        assert kind == "ok" and res == {1: None}, (mode, kind, res)
        kind, res = _run(df, null_first, mode)
        assert (kind, res.get("message") if kind == "err" else res) == \
            ("err", "expected string, got Null"), (mode, kind, res)


def test_get_absent_field_over_errorable_base(spark):
    """t_get's static-missing shortcut over an errs-carrying base
    (merge can error per-row on null operands) must match the variant
    engine — the r5 fix routed it through a fallback; pin it."""
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "x"}), (2, None)],
        "id long, obj struct<a: long, b: string>")
    rule = RULE % '"@input.obj", {merge: [{z: 9}]}, {get: ["nope"]}'
    va = _run(df, rule, "variant")
    au = _run(df, rule, "auto")
    assert va == au, (va, au)
    # row 2 (null obj) errors in both; row 1 navigates to missing
    kind, res = _run(df.filter(F.col("id") == 2), rule, "variant")
    assert kind == "err", res
    k2, r2 = _run(df.filter(F.col("id") == 2), rule, "auto")
    assert (kind, res) == (k2, r2)


def test_runtime_missing_does_not_mask_operand_errors(spark):
    """mws masking guard: an operand that is runtime-missing on SOME
    rows must not skip another operand's per-row error on those rows.
    Here arg1 = maybe-missing lookup-ish value (if over missing
    branch), arg2 = ÷0 error chain: the error fires on every row in
    the reference order regardless of arg1's missing rows."""
    df = spark.createDataFrame([(1, 5, "x"), (2, 0, None)],
                               "id long, a long, s string")
    rule = RULE % (
        '{concat: ['
        '["$", {if: {cond: {gt: ["@input.a", 1]}, '
        'then: ["@input.absent"], else: ["lit:ok"]}}], '
        '["@input.a", {divide: ["$", 0]}, {to_string: []}]]}')
    for rid in (1, 2):
        one = df.filter(F.col("id") == rid)
        va = _run(one, rule, "variant")
        au = _run(one, rule, "auto")
        assert va == au, (rid, va, au)


_MISS_OPS = [
    ('{concat: ["@input.absent"]}', None),
    ('{concat: ["lit:-"]}', None),
    ('{coalesce: ["@input.absent", %d]}', lambda r: r.randrange(0, 3)),
    ('{get: ["nope"]}', None),
    ('{get: ["a"]}', None),
    ('{to_string: []}', None),
    ('{trim: []}', None),
    ('{add: [%d]}', lambda r: r.randrange(0, 3)),
    ('{divide: [%d]}', lambda r: r.randrange(0, 2)),
    ('{merge: [{z: 9}]}', None),
    ('{if: {cond: {gt: ["$", 1]}, then: ["@input.absent"], '
     'else: ["$"]}}', None),
    ('{if: {cond: {eq: ["$", "@input.absent"]}, '
     'then: ["lit:eq"], else: ["$"]}}', None),
]


def test_fuzz_missing_and_type_error_pipes(spark):
    """Depth-3/4 pipes biased toward static-missing and static-type-
    error shapes (VERDICT r5 #2): every non-fallback pipe must agree
    with the variant engine on values AND per-row errors."""
    df = spark.createDataFrame(
        [(1, 7, None, "x", {"a": 1, "b": "y"}),
         (2, 0, 3, "", None),
         (3, None, 0, None, {"a": None, "b": ""})],
        "id long, i long, n long, s string, "
        "obj struct<a: long, b: string>")
    compared, skipped = _fuzz(
        spark, df, (1, 2, 3), _MISS_OPS,
        ["@input.i", "@input.n", "@input.s", "@input.obj",
         "@input.absent"], seed=606060, iters=50, depth=(3, 5))
    assert compared >= 10, (compared, skipped)


# --- round 6: top-level missing-vs-null fuzz (VERDICT r5 #5) ------------
#
# Table outputs fold missing and null into SQL NULL, so the table-only
# fuzzers can't see the tri-state axis.  The DOCUMENT transform surface
# CAN: an absent key is missing, an explicit null is null.  This mode
# runs the same random pipes through the document engine and both
# table engines and checks the documented folding row by row.

def _run_doc(spark, records, rule_yaml):
    """Document transform → per-id (kind, {id: MISSING|value})."""
    import yaml as _yaml
    from rulemorph_spark.engine import transform as _doc_transform
    from rulemorph_spark.errors import RuleError, TransformEngineError
    doc = _yaml.safe_load(rule_yaml)
    try:
        out = _doc_transform(spark, json.dumps(doc),
                             input_text=json.dumps(records))
    except (TransformEngineError, RuleError) as e:
        kind = getattr(e, "kind", getattr(e, "code", None))
        return "err", {"kind": kind,
                       "message": getattr(e, "message", str(e))}
    except Exception as e:
        m = _ERR.search(str(e))
        if not m:
            raise
        err = json.loads(m.group(1))
        return "err", {"kind": err["kind"],
                       "message": decode_dbg_message(err["message"])}
    res = {}
    for rec, o in zip(records, out):
        rid = rec["id"]
        res[rid] = ("__DOC_MISSING__" if "out" not in o
                    else _nrm(o.get("out")))
    return "ok", res


def test_fuzz_document_vs_table_tristate(spark):
    records = [
        {"id": 1, "i": 7, "n": None, "s": "x", "obj": {"a": 1, "b": "y"}},
        {"id": 2, "i": 0, "n": 3, "s": "", "obj": None},
        {"id": 3, "i": None, "n": 0, "s": None,
         "obj": {"a": None, "b": ""}},
    ]
    df = spark.createDataFrame(
        [(1, 7, None, "x", {"a": 1, "b": "y"}),
         (2, 0, 3, "", None),
         (3, None, 0, None, {"a": None, "b": ""})],
        "id long, i long, n long, s string, "
        "obj struct<a: long, b: string>")
    rng = random.Random(424242)
    compared = skipped = 0
    starts = ["@input.i", "@input.n", "@input.s", "@input.obj",
              "@input.absent"]
    for _ in range(25):
        start = rng.choice(starts)
        steps = []
        for _ in range(rng.randrange(1, 4)):
            tmpl, gen = rng.choice(_MISS_OPS)
            steps.append(tmpl if gen is None else tmpl % gen(rng))
        expr = f'"{start}", ' + ", ".join(steps)
        rule = RULE % expr
        dkind, dres = _run_doc(spark, records, rule)
        for mode in ("variant", "typed"):
            try:
                tkind, tres = _run(df, rule, mode)
            except TypedFallback:
                skipped += 1
                continue
            if dkind == "err" or tkind == "err":
                # per-row error sets can differ between a 3-record doc
                # run and a 3-row table run only in WHICH row fails
                # first; compare per-id
                for rec in records:
                    rid = rec["id"]
                    one_doc = _run_doc(spark, [rec], rule)
                    try:
                        tk, tr = _run(
                            df.filter(F.col("id") == rid), rule, mode)
                    except TypedFallback:
                        continue
                    assert one_doc[0] == tk, (expr, mode, rid,
                                              one_doc, tk, tr)
                    if tk == "err":
                        assert one_doc[1] == tr, (expr, mode, rid,
                                                  one_doc[1], tr)
                    else:
                        _assert_fold(one_doc[1][rid], tr[rid],
                                     expr, mode, rid)
                compared += 1
                continue
            for rid, dv in dres.items():
                _assert_fold(dv, tres[rid], expr, mode, rid)
            compared += 1
    assert compared >= 12, (compared, skipped)


def _assert_fold(doc_value, table_value, expr, mode, rid):
    """Documented tri-state fold: a table cell is NULL exactly when the
    document output is missing OR null; otherwise values match."""
    if doc_value == "__DOC_MISSING__" or doc_value is None:
        assert table_value is None, (expr, mode, rid, doc_value,
                                     table_value)
    else:
        assert table_value == doc_value, (expr, mode, rid, doc_value,
                                          table_value)


def test_per_operand_op_checks_are_positional(spark):
    """The reference interleaves OP-SPECIFIC per-arg checks with the
    missing short-circuit: v2 arith converts each arg — and checks
    each divisor for zero — INSIDE the per-arg loop
    (v2_eval.rs:1848-1928), and v1 concat value_to_strings per arg
    (transform.rs:1403-1432).  So an earlier arg's conversion/zero
    error beats a LATER arg's missing, while an earlier missing still
    suppresses everything after it.  r6 source-reading found BOTH
    engines returning missing for all of these."""
    df = spark.createDataFrame([(1, 8.0, "abc")],
                               "id long, x double, s string")
    cases = [
        ('"@input.x", {divide: [0, "@input.absent"]}',
         ("err", "division by zero")),
        ('"@input.x", {divide: ["@input.absent", 0]}',
         ("ok", {1: None})),
        ('"@input.s", {concat: [{lit: [1, 2]}, "@input.absent"]}',
         ("err", 'expected string, got '
                 'Object {"lit": Array [Number(1), Number(2)]}')),
        ('"@input.s", {add: ["@input.absent"]}',
         ("err", "failed to parse string as number")),
        ('"@input.x", {add: ["@input.absent"]}', ("ok", {1: None})),
        ('"@input.x", {divide: [2]}', ("ok", {1: 4.0})),
    ]
    for expr, (want_kind, want) in cases:
        rule = RULE % expr
        for mode in ("variant", "auto"):
            kind, res = _run(df, rule, mode)
            assert kind == want_kind, (expr, mode, kind, res)
            if want_kind == "err":
                assert res["message"] == want, (expr, mode, res)
            else:
                assert res == want, (expr, mode, res)


def test_identical_if_branches_still_evaluate_condition(spark):
    """Structurally identical then/else compile to identical
    expressions and SimplifyConditionals collapses the CASE, deleting
    the condition — but the reference evaluates the condition first
    (a gt over missing raises).  Both engines guard the shape (r6)."""
    df = spark.createDataFrame([(1,)], "id long")
    rule = RULE % ('"@input.absent", {if: {cond: {gt: ["$", 1]}, '
                   'then: ["lit:k"], else: ["lit:k"]}}')
    for mode in ("variant", "auto"):
        kind, res = _run(df, rule, mode)
        assert kind == "err", (mode, res)
        assert res["message"] == "cannot compare missing values", res
    ok = RULE % ('5, {if: {cond: {gt: ["$", 1]}, '
                 'then: ["lit:k"], else: ["lit:k"]}}')
    kind, res = _run(df, ok, "variant")
    assert (kind, res) == ("ok", {1: "k"}), (kind, res)
    # auto falls back (identical branches) — variant output, same value
    kind, res = _run(df, ok, "auto")
    assert kind == "ok", (kind, res)


_MIXED_OPS = _MISS_OPS + [
    ('{int: []}', None),
    ('{float: []}', None),
    ('{string: []}', None),
    ('{bool: []}', None),
    ('{round: [1]}', None),
    ('{to_base: [16]}', None),
    ('{replace: ["a", "X"]}', None),
    ('{split: ["-"]}', None),
    ('{pad_start: [8, "0"]}', None),
    ('{len: []}', None),
    ('{keys: []}', None),
    ('{first: []}', None),
    ('{sum: []}', None),
    ('{lowercase: []}', None),
    ('{not: []}', None),
    ('{subtract: [3]}', None),
]


def test_fuzz_cross_family_pipes(spark):
    """Cross-family chains (casts / numeric / string / object / array /
    logical ops mixed with missing-biased shapes) — families that the
    per-pool fuzzers never compose; value AND per-row error parity."""
    df = spark.createDataFrame(
        [(1, 7, None, "2024-03-05", {"a": 1, "b": "y"}, [3, 1]),
         (2, 0, 3, "not-a-date", None, []),
         (3, None, 0, None, {"a": None, "b": ""}, None)],
        "id long, i long, n long, s string, "
        "obj struct<a: long, b: string>, arr array<long>")
    compared, skipped = _fuzz(
        spark, df, (1, 2, 3), _MIXED_OPS,
        ["@input.i", "@input.n", "@input.s", "@input.obj",
         "@input.arr", "@input.absent"], seed=501, iters=30,
        depth=(2, 5))
    assert compared >= 12, (compared, skipped)
