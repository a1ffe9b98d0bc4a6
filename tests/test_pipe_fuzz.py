"""Seeded op-pipe fuzzer: random 1–3-step pipes from the common op set
over random scalar columns, run through BOTH engines.  Parity contract
per (pipe, row):

- both produce a value → values must match (JSON-compared);
- both raise → the RULEMORPH {kind, message} must match;
- one raises while the other returns → that is a real divergence and
  the test FAILS.

TypedFallback pipes are skipped (auto mode falls back by design).
"""

from __future__ import annotations

import json
import random
import re

from pyspark.sql import functions as F

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

# (op template, arg generator) — literal args only, value flows on the
# pipe; shapes chosen to exercise string/number/bool/null behavior
_OPS = [
    ('{trim: []}', None),
    ('{uppercase: []}', None),
    ('{lowercase: []}', None),
    ('{len: []}', None),
    ('{to_string: []}', None),
    ('{concat: ["%s"]}', lambda r: r.choice(["x", "-", ""])),
    ('{add: [%d]}', lambda r: r.randrange(-5, 6)),
    ('{multiply: [%d]}', lambda r: r.randrange(-3, 4)),
    ('{subtract: [%d]}', lambda r: r.randrange(0, 5)),
    ('{round: [%d]}', lambda r: r.randrange(0, 3)),
    ('{coalesce: ["%s"]}', lambda r: r.choice(["fb", "0"])),
    ('{replace: ["a", "%s"]}', lambda r: r.choice(["A", ""])),
    ('{pad_start: [%d, "_"]}', lambda r: r.randrange(1, 8)),
    ('{default: ["%s"]}', lambda r: r.choice(["dflt"])),
]

_ERR = re.compile(r'RULEMORPH_ERROR:(\{.*?\})')


def _run(df, rule, mode):
    """→ ('ok', {id: json_value}) or ('err', {kind, message})."""
    try:
        out = transform_table(df, rule, mode=mode)
        if mode == "variant":
            rows = out.select(
                F.col("id").try_cast("long").alias("id"),
                F.to_json("out").alias("out")).collect()
            return "ok", {r["id"]: (None if r["out"] is None
                                    else json.loads(r["out"]))
                          for r in rows}
        vals = {}
        for r in out.collect():
            v = r["out"]
            vals[r["id"]] = v
        return "ok", vals
    except TypedFallback:
        raise
    except Exception as e:
        m = _ERR.search(str(e))
        if not m:
            raise
        err = json.loads(m.group(1))
        return "err", {"kind": err["kind"],
                       "message": decode_dbg_message(err["message"])}


def test_random_pipes_value_and_error_parity(spark):
    rng = random.Random(424242)
    df = spark.createDataFrame(
        [(1, "abc", 7, 2.5, True),
         (2, "A,b", -3, 0.0, False),
         (3, "", 0, -1.25, None),
         (4, None, None, None, True)],
        "id long, s string, i long, x double, b boolean")
    compared = skipped = 0
    for _ in range(25):
        start = rng.choice(["@input.s", "@input.i", "@input.x",
                            "@input.b"])
        steps = []
        for _ in range(rng.randrange(1, 4)):
            tmpl, gen = rng.choice(_OPS)
            steps.append(tmpl % gen(rng) if gen else tmpl)
        expr = f'"{start}", ' + ", ".join(steps)
        rule = RULE % expr
        try:
            tkind, tres = _run(df, rule, "typed")
        except TypedFallback:
            skipped += 1
            continue
        vkind, vres = _run(df, rule, "variant")
        if tkind == "err" or vkind == "err":
            # which failing ROW surfaces first is a task race; compare
            # outcome per single-row frame instead
            for rid in (1, 2, 3, 4):
                one = df.filter(F.col("id") == rid)
                tk, tr = _run(one, rule, "typed")
                vk, vr = _run(one, rule, "variant")
                assert tk == vk, (expr, rid, tk, tr, vk, vr)
                if tk == "err":
                    assert tr == vr, (expr, rid, tr, vr)
            compared += 1
            continue

        # typed floats may come back as float where variant JSON
        # yields int-rendered values; normalize numerics
        def nrm(d):
            return {k: (float(v) if isinstance(v, (int, float))
                        and not isinstance(v, bool) else v)
                    for k, v in d.items()}
        assert nrm(tres) == nrm(vres), (expr, tres, vres)
        compared += 1
    assert compared >= 10, (compared, skipped)
