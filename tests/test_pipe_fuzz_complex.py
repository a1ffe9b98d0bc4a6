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
        return "err", {"kind": err["kind"], "message": err["message"]}


def _fuzz(spark, df, ids, ops, starts, seed, iters):
    rng = random.Random(seed)
    compared = skipped = 0
    for _ in range(iters):
        start = rng.choice(starts)
        steps = []
        for _ in range(rng.randrange(1, 3)):
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
        assert res["message"] == "map requires an array", (mode, res)
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
