"""Three-way fuzz driver: interpreter (ground truth) vs typed vs variant.

Scratch campaign tool for round 7 — runs the same random v2 pipes through
the independent interpreter (rulemorph_spark.interp) and both Spark
engines, and prints every divergence for adjudication against the
reference source.  The pytest version lives in
tests/test_pipe_fuzz_threeway.py; this script exists to run BIG seed
batches fast and with full diagnostics.

Usage:
    python scripts/threeway_fuzz.py [pool] [seed] [iters]
    pool: miss | mixed | arr | obj | const | all (default all)
"""

from __future__ import annotations

import json
import random
import re
import sys

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rulemorph_spark import interp
from rulemorph_spark.compiler.typed import TypedFallback
from rulemorph_spark.engine import get_spark, transform_table
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

_ERR = re.compile(r"RULEMORPH_ERROR:(\{.*?\})")


# Since round 7 the engines render the reference's value-embedding
# messages exactly (``%%DBG%%`` markers decoded at the error boundary),
# so messages compare EXACTLY — no equivalence table.
def norm_message(msg: str) -> str:
    return msg


def _nrm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, list):
        return [_nrm(x) for x in v]
    if isinstance(v, dict):
        return {k: _nrm(x) for k, x in v.items()}
    return v


def run_spark(df, rule, mode):
    try:
        out = transform_table(df, rule, mode=mode)
        if "out" not in out.columns:
            return "ok", {r["id"]: None
                          for r in out.select(
                              F.col("id").try_cast("long").alias("id")
                          ).collect()}
        dt = out.schema["out"].dataType
        if mode == "variant" or isinstance(
                dt, (T.StructType, T.ArrayType, T.MapType)):
            rows = out.select(
                F.col("id").try_cast("long").alias("id"),
                F.to_json("out", {"ignoreNullFields": "false"})
                .alias("out")).collect()
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
                       "message": decode_dbg_message(err["message"]),
                       "path": err.get("path")}


def run_interp(rule_yaml, record):
    """→ ("ok", folded-value-or-None) | ("err", {kind, message})."""
    try:
        out = interp.transform_record(rule_yaml, record)
    except interp.InterpError as e:
        return "err", {"kind": e.kind, "message": e.message,
                       "path": e.path}
    if out is interp.MISSING:
        return "drop", None
    v = out.get("out", "__DOC_MISSING__") if isinstance(out, dict) else out
    if v == "__DOC_MISSING__" or v is None:
        return "ok", None
    return "ok", _nrm(v)


# --- pools (superset of tests/test_pipe_fuzz_complex.py) -------------------

ARR_OPS = [
    ("{take: [%d]}", lambda r: r.randrange(-3, 4)),
    ("{drop: [%d]}", lambda r: r.randrange(-3, 4)),
    ("{slice: [%d, %d]}", lambda r: (r.randrange(-2, 3), r.randrange(0, 4))),
    ("{chunk: [%d]}", lambda r: r.randrange(1, 4)),
    ("{flatten: []}", None),
    ("{unique: []}", None),
    ("{sum: []}", None),
    ("{avg: []}", None),
    ("{min: []}", None),
    ("{max: []}", None),
    ("{first: []}", None),
    ("{last: []}", None),
    ("{len: []}", None),
    ("{index_of: [%d]}", lambda r: r.randrange(0, 4)),
    ("{contains: [%d]}", lambda r: r.randrange(0, 4)),
    ("{map: [{multiply: [%d]}]}", lambda r: r.randrange(-2, 3)),
    # map STEP bodies (per-item [idx].step[k] paths)
    ("{map: [{add: [%d]}, {divide: [2]}]}", lambda r: r.randrange(0, 3)),
    ('{map: [{if: {cond: {gt: ["$", %d]}, then: [0]}}]}',
     lambda r: r.randrange(0, 3)),
    ('{filter: [["@item", {gt: [%d]}]]}', lambda r: r.randrange(0, 3)),
    ('{reduce: [["@acc", {add: ["@item"]}]]}', None),
    ('{sort_by: [["@item"]]}', None),
    ('{sort_by: [["@item"], ["lit:desc"]]}', None),
]

OBJ_OPS = [
    ("{keys: []}", None),
    ("{values: []}", None),
    ("{entries: []}", None),
    ("{len: []}", None),
    ('{get: ["%s"]}', lambda r: r.choice(["a", "b", "nope"])),
    ('{pick: ["%s"]}', lambda r: r.choice(["a", "b"])),
    ('{omit: ["%s"]}', lambda r: r.choice(["a", "c"])),
    ("{merge: [{z: 9}]}", None),
]

MISS_OPS = [
    ('{concat: ["@input.absent"]}', None),
    ('{concat: ["lit:-"]}', None),
    ('{coalesce: ["@input.absent", %d]}', lambda r: r.randrange(0, 3)),
    ('{get: ["nope"]}', None),
    ('{get: ["a"]}', None),
    ("{to_string: []}", None),
    ("{trim: []}", None),
    ("{add: [%d]}", lambda r: r.randrange(0, 3)),
    ("{divide: [%d]}", lambda r: r.randrange(0, 2)),
    ("{merge: [{z: 9}]}", None),
    ('{if: {cond: {gt: ["$", 1]}, then: ["@input.absent"], '
     'else: ["$"]}}', None),
    ('{if: {cond: {eq: ["$", "@input.absent"]}, '
     'then: ["lit:eq"], else: ["$"]}}', None),
]

MIXED_OPS = MISS_OPS + [
    ("{int: []}", None),
    ("{float: []}", None),
    ("{string: []}", None),
    ("{bool: []}", None),
    ("{round: [1]}", None),
    ("{to_base: [16]}", None),
    ('{replace: ["a", "X"]}', None),
    ('{split: ["-"]}', None),
    ('{pad_start: [8, "0"]}', None),
    ("{len: []}", None),
    ("{keys: []}", None),
    ("{first: []}", None),
    ("{sum: []}", None),
    ("{lowercase: []}", None),
    ("{not: []}", None),
    ("{subtract: [3]}", None),
]

# constant-biased pool (VERDICT r6 #2): all-literal pipes, raising ops at
# every depth, if-steps with distinct-but-equal branches
CONST_OPS = [
    ("{add: [1]}", None),
    ("{divide: [0]}", None),
    ("{divide: [2]}", None),
    ("{concat: [null]}", None),
    ("{to_string: []}", None),
    ("{int: []}", None),
    ("{not: []}", None),
    ("{len: []}", None),
    ('{if: {cond: {gt: ["$", 1]}, then: ["lit:k"], else: ["lit:k"]}}',
     None),
    ('{if: {cond: {gt: ["$", 1]}, then: [1], else: [0, {add: [1]}]}}',
     None),
    ('{if: {cond: {gt: ["@input.absent", 1]}, then: [1], else: [2]}}',
     None),
    ("{coalesce: [7]}", None),
    ('{first: []}', None),
]
CONST_STARTS = ["5", "0", '"lit:x"', "null", "true", "[1, 2]",
                "{a: 1}", '"@input.absent"', "2.5"]

# arg-position pool: ops whose ARGS are expressions (refs, null,
# computed) — exercises the reference's arg converters
# (eval_v2_key_expr_string, sort keys, per-arg casts) rather than the
# pipe-value protocol
ARGX_OPS = [
    ('{take: ["@input.i"]}', None),
    ('{take: ["@input.absent"]}', None),
    ('{take: ["@input.s"]}', None),
    ('{take: [null]}', None),
    ('{drop: ["@input.n"]}', None),
    ('{slice: ["@input.i", "@input.n"]}', None),
    ('{chunk: ["@input.i"]}', None),
    ('{index_of: ["@input.f"]}', None),
    ('{contains: ["@input.absent"]}', None),
    ('{contains: [null]}', None),
    ('{pad_start: ["@input.i", "lit:0"]}', None),
    ('{pad_end: [3, "@input.s"]}', None),
    ('{replace: ["@input.s", "lit:X"]}', None),
    ('{split: ["@input.s"]}', None),
    ('{round: ["@input.n"]}', None),
    ('{to_base: ["@input.i"]}', None),
    ('{concat: ["@input.f", "@input.obj"]}', None),
    ('{concat: ["@input.nums"]}', None),
    ('{add: ["@input.s"]}', None),
    ('{divide: ["@input.n"]}', None),
    ('{multiply: ["@input.f"]}', None),
    ('{get: ["@input.s"]}', None),
    ('{get: [null]}', None),
    # malformed literal path keys (path.rs per-class parse errors)
    ('{get: ["lit:a["]}', None),
    ('{get: ["lit:.a"]}', None),
    ('{get: ["lit:a..b"]}', None),
    ('{get: ["lit:a]x"]}', None),
    ('{get: ["lit:a."]}', None),
    # invalid literal regex patterns (v2 ~= wraps the compile error;
    # the python-re Display matches the interpreter oracle)
    ('{"~=": ["lit:["]}', None),
    ('{"~=": ["lit:("]}', None),
    ('{"~=": ["lit:a.*"]}', None),
    ('{if: {cond: {match: ["$", "lit:("]}, then: [1]}}', None),
    ('{if: {cond: {match: ["$", "lit:a+"]}, then: [1], else: [0]}}',
     None),
    ('{sort_by: [["@item", {get: ["a"]}]]}', None),
    ('{group_by: [["@item", {to_string: []}]]}', None),
    ('{key_by: [["@item"]]}', None),
    ('{distinct_by: [["@item", {get: ["a"]}]]}', None),
    ('{zip: ["@input.strs"]}', None),
    ('{zip_with: ["@input.nums", ["@item"]]}', None),
    ('{find: [["@item", {gt: ["@input.n"]}]]}', None),
]

# --- v1 pool: chains + standalone {op,args} (r7 v1_suffix paths) ----------

V1_RULE = """
version: 1
input: {format: json, json: {}}
mappings:
  - target: id
    source: id
  - target: out
    expr: {chain: [%s]}
"""

V1_OPS = [
    ('{op: concat, args: ["x"]}', None),
    ('{op: to_string, args: []}', None),
    ('{op: trim, args: []}', None),
    ('{op: "+", args: [%d]}', lambda r: r.randrange(0, 3)),
    ('{op: "/", args: [%d]}', lambda r: r.randrange(0, 2)),
    ('{op: round, args: [1]}', None),
    ('{op: to_base, args: [16]}', None),
    ('{op: take, args: [%d]}', lambda r: r.randrange(-2, 3)),
    ('{op: drop, args: [1]}', None),
    ('{op: slice, args: [0, 2]}', None),
    ('{op: len, args: []}', None),
    ('{op: get, args: ["a"]}', None),
    ('{op: get, args: [{ref: input.s}]}', None),
    ('{op: keys, args: []}', None),
    ('{op: merge, args: [{z: 9}]}', None),
    ('{op: unique, args: []}', None),
    ('{op: sum, args: []}', None),
    ('{op: "==", args: [1]}', None),
    ('{op: split, args: ["-"]}', None),
    ('{op: pad_start, args: [5, "0"]}', None),
    ('{op: flatten, args: []}', None),
    ('{op: contains, args: [%d]}', lambda r: r.randrange(0, 3)),
    ('{op: not, args: []}', None),
    ('{op: coalesce, args: [{ref: input.absent}, 7]}', None),
    ('{op: pick, args: [["a", "b"]]}', None),
    ('{op: from_entries, args: []}', None),
]
V1_STARTS = ['{ref: input.s}', '{ref: input.i}', '{ref: input.nums}',
             '{ref: input.obj}', '{ref: input.absent}', '{ref: input.n}',
             '{ref: input.strs}', '"xy"', '5', 'null']

RECORDS = [
    {"id": 1, "i": 7, "n": None, "s": "x",
     "obj": {"a": 1, "b": "y"}, "arr": [3, 1], "f": 2.5,
     "strs": ["b", "a"], "nums": [3, 1, 2]},
    {"id": 2, "i": 0, "n": 3, "s": "", "obj": None, "arr": [],
     "f": -0.0, "strs": [], "nums": []},
    {"id": 3, "i": None, "n": 0, "s": None,
     "obj": {"a": None, "b": ""}, "arr": None, "f": None,
     "strs": ["x"], "nums": [5, 5, -1, 0]},
    # edge row: numeric-string parses (leading +, whitespace,
    # exponent), serde float rendering zones, integral float
    {"id": 4, "i": -3, "n": 2, "s": "+15", "obj": {"a": 9, "b": "1e3"},
     "arr": [0], "f": 1e20, "strs": [" 1 ", "2.0", "abc", "nan", "inf"],
     "nums": [10, -10]},
]

SCHEMA = ("id long, i long, n long, s string, "
          "obj struct<a: long, b: string>, arr array<long>, f double, "
          "strs array<string>, nums array<long>")

STARTS = ["@input.i", "@input.n", "@input.s", "@input.obj", "@input.arr",
          "@input.f", "@input.absent"]
ARR_STARTS = ["@input.nums", "@input.strs"]
OBJ_STARTS = ["@input.obj"]


# --- random-bit-pattern double pool (round 8, VERDICT r7 #6) --------------
#
# The r7 f64 work (rust_f64_parse, serde float text, Rust {} Display,
# -0, over-render) was driven by CONSTRUCTED edge rows; this pool
# reinterprets random 64-bit patterns as doubles (non-finite patterns
# skipped — a JSON-modeled record cannot carry inf/NaN) and pushes
# them through stringify / arith / compare / casts in all three
# evaluators.  ``ds`` carries the shortest-repr text form so the Rust
# parse grammar sees round-trip inputs too.

DBL_OPS = [
    ("{to_string: []}", None),
    ("{string: []}", None),
    ('{concat: ["lit:|"]}', None),
    ("{float: []}", None),
    ("{int: []}", None),
    ("{round: [%d]}", lambda r: r.randrange(0, 3)),
    ('{add: ["@input.g"]}', None),
    ('{subtract: ["@input.g"]}', None),
    ('{multiply: ["@input.g"]}', None),
    ('{divide: ["@input.g"]}', None),
    ('{add: ["@input.gs"]}', None),
    ('{"==": ["@input.g"]}', None),
    ('{"!=": ["@input.gs"]}', None),
    ('{"<": ["@input.g"]}', None),
    ('{">=": ["@input.g"]}', None),
    ('{if: {cond: {gt: ["$", "@input.g"]}, then: ["lit:gt"], '
     'else: ["$", {to_string: []}]}}', None),
    ('{if: {cond: {eq: ["$", "@input.g"]}, then: [1], else: [0]}}',
     None),
]
DBL_STARTS = ["@input.d", "@input.g", "@input.ds", "@input.gs"]
DBL_SCHEMA = "id long, d double, g double, ds string, gs string"


def dbl_records(seed: int, count: int = 14) -> list[dict]:
    import struct as _struct
    rng = random.Random(seed)
    vals: list[float] = []
    while len(vals) < 2 * count:
        bits = rng.getrandbits(64)
        d = _struct.unpack("<d", _struct.pack("<Q", bits))[0]
        if d != d or d in (float("inf"), float("-inf")):
            continue
        vals.append(d)
    # pin the known display/parse zone edges alongside the random mass
    vals[:8] = [0.0, -0.0, 2.0, 2.0 ** 53, 2.0 ** 60, 1e-308, 5e-324,
                -1e16]
    return [{"id": i + 1, "d": vals[2 * i], "g": vals[2 * i + 1],
             "ds": repr(vals[2 * i]), "gs": repr(vals[2 * i + 1])}
            for i in range(count)]


def fold_eq(doc_value, table_value):
    """table NULL ⇔ doc missing-or-null; else exact."""
    if doc_value is None:
        return table_value is None
    return table_value == doc_value


def run_pool(spark, df, pool_name, ops, starts, seed, iters, depth,
             records=None):
    rng = random.Random(seed)
    recs = RECORDS if records is None else records
    divergences = []
    compared = skipped = 0
    for it in range(iters):
        start = rng.choice(starts)
        steps = []
        for _ in range(rng.randrange(*depth)):
            tmpl, gen = rng.choice(ops)
            steps.append(tmpl if gen is None else tmpl % gen(rng))
        if pool_name.startswith("v1"):
            expr = ", ".join([start] + steps)
            rule = V1_RULE % expr
        elif start.startswith("@") or start.startswith("lit:"):
            expr = f'"{start}", ' + ", ".join(steps)
            rule = RULE % expr
        else:
            expr = f"{start}, " + ", ".join(steps)
            rule = RULE % expr
        # interpreter per record (ground truth)
        interp_res = {}
        try:
            for rec in recs:
                interp_res[rec["id"]] = run_interp(rule, rec)
        except Exception as e:
            divergences.append((pool_name, expr, "interp-crash",
                                f"{type(e).__name__}: {e}"))
            continue
        for mode in ("typed", "variant"):
            try:
                kind, res = run_spark(df, rule, mode)
            except TypedFallback:
                skipped += 1
                continue
            except Exception as e:
                divergences.append((pool_name, expr, f"{mode}-crash",
                                    f"{type(e).__name__}: {str(e)[:200]}"))
                continue
            if kind == "err":
                # some row errors: per-row comparison
                for rec in recs:
                    rid = rec["id"]
                    one = df.filter(F.col("id") == rid)
                    try:
                        k1, r1 = run_spark(one, rule, mode)
                    except TypedFallback:
                        continue
                    except Exception as e:
                        divergences.append(
                            (pool_name, expr, f"{mode}-crash-row{rid}",
                             str(e)[:200]))
                        continue
                    k2, r2 = interp_res[rid]
                    if k2 == "err":
                        if k1 != "err":
                            divergences.append(
                                (pool_name, expr, f"{mode}-row{rid}",
                                 f"interp err {r2} vs {mode} {k1} {r1}"))
                        elif (r1["kind"] != r2["kind"]
                              or norm_message(r1["message"])
                              != norm_message(r2["message"])
                              or r1.get("path") != r2.get("path")):
                            divergences.append(
                                (pool_name, expr, f"{mode}-row{rid}",
                                 f"err mismatch interp={r2} {mode}={r1}"))
                    else:
                        if k1 == "err":
                            divergences.append(
                                (pool_name, expr, f"{mode}-row{rid}",
                                 f"interp ok {r2!r} vs {mode} err {r1}"))
                        elif k2 == "ok" and not fold_eq(r2, r1.get(rid)):
                            divergences.append(
                                (pool_name, expr, f"{mode}-row{rid}",
                                 f"value interp={r2!r} {mode}={r1.get(rid)!r}"))
                compared += 1
                continue
            # all rows ok on the Spark side
            for rec in recs:
                rid = rec["id"]
                k2, r2 = interp_res[rid]
                if k2 == "err":
                    divergences.append(
                        (pool_name, expr, f"{mode}-row{rid}",
                         f"interp err {r2} vs {mode} ok "
                         f"{res.get(rid)!r}"))
                elif k2 == "ok" and not fold_eq(r2, res.get(rid)):
                    divergences.append(
                        (pool_name, expr, f"{mode}-row{rid}",
                         f"value interp={r2!r} {mode}={res.get(rid)!r}"))
            compared += 1
    return compared, skipped, divergences


def main():
    pool = sys.argv[1] if len(sys.argv) > 1 else "all"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1001
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    spark = get_spark("threeway-fuzz", cpus=8)
    df = spark.createDataFrame(
        [(r["id"], r["i"], r["n"], r["s"],
          tuple(r["obj"].values()) if r["obj"] else None, r["arr"],
          r["f"], r["strs"], r["nums"]) for r in RECORDS], SCHEMA)
    if pool in ("dbl", "all"):
        recs = dbl_records(seed)
        ddf = spark.createDataFrame(
            [(r["id"], r["d"], r["g"], r["ds"], r["gs"]) for r in recs],
            DBL_SCHEMA)
        compared, skipped, divs = run_pool(
            spark, ddf, "dbl", DBL_OPS, DBL_STARTS, seed, iters, (1, 4),
            records=recs)
        print(f"[dbl] compared={compared} skipped={skipped} "
              f"divergences={len(divs)}", flush=True)
        if pool == "dbl":
            for d in divs:
                print("---")
                for part in d:
                    print("   ", part)
            print(f"TOTAL divergences: {len(divs)}")
            return
        _dbl_divs = divs
    else:
        _dbl_divs = []
    pools = {
        "miss": (MISS_OPS, STARTS, (2, 5)),
        "mixed": (MIXED_OPS, STARTS, (2, 5)),
        "arr": (ARR_OPS, ARR_STARTS, (1, 3)),
        "obj": (OBJ_OPS, OBJ_STARTS, (1, 3)),
        "const": (CONST_OPS, CONST_STARTS, (1, 4)),
        "argx": (ARGX_OPS, STARTS + ARR_STARTS, (1, 3)),
        "v1": (V1_OPS, V1_STARTS, (1, 4)),
    }
    names = list(pools) if pool == "all" else [pool]
    total_div = list(_dbl_divs)
    for name in names:
        ops, starts, depth = pools[name]
        compared, skipped, divs = run_pool(spark, df, name, ops, starts,
                                           seed, iters, depth)
        print(f"[{name}] compared={compared} skipped={skipped} "
              f"divergences={len(divs)}", flush=True)
        total_div.extend(divs)
    print(f"TOTAL divergences: {len(total_div)}")
    seen = set()
    for d in total_div:
        key = d[3][:100]
        if key in seen:
            continue
        seen.add(key)
        print("---")
        for part in d:
            print("   ", part)


if __name__ == "__main__":
    main()
