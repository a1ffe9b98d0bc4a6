"""Three-way fuzz: the standalone interpreter (rulemorph_spark.interp,
a direct tree-walking mirror of transform.rs/v2_eval.rs sharing no code
with either engine) is the ground truth; the typed and variant engines
must match it on value, error kind AND exact error message.

Round-6's lesson (VERDICT r6 next-round #1): the typed-vs-variant
fuzzers missed the positional per-operand protocol because BOTH engines
were wrong identically.  A third implementation breaks that failure
mode — an agreement between the engines no longer masks a shared bug.

The BIG seed-batch driver with full diagnostics is
``scripts/threeway_fuzz.py`` (same pools; this module exec-imports it
so the pools and comparison logic stay single-sourced).  Regression
pins below cover every divergence the round-7 campaign found and
fixed.
"""

from __future__ import annotations

import importlib.util
import pathlib

import pytest

from rulemorph_spark import interp
from rulemorph_spark.errors import TransformEngineError

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_spec = importlib.util.spec_from_file_location(
    "threeway_fuzz", _ROOT / "scripts" / "threeway_fuzz.py")
tw = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(tw)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(r["id"], r["i"], r["n"], r["s"],
          tuple(r["obj"].values()) if r["obj"] else None, r["arr"],
          r["f"], r["strs"], r["nums"]) for r in tw.RECORDS], tw.SCHEMA)


@pytest.mark.parametrize("pool", ["miss", "mixed", "arr", "obj",
                                  "const", "argx", "v1"])
def test_threeway_pool(spark, df, pool):
    ops, starts, depth = {
        "miss": (tw.MISS_OPS, tw.STARTS, (2, 5)),
        "mixed": (tw.MIXED_OPS, tw.STARTS, (2, 5)),
        "arr": (tw.ARR_OPS, tw.ARR_STARTS, (1, 3)),
        "obj": (tw.OBJ_OPS, tw.OBJ_STARTS, (1, 3)),
        "const": (tw.CONST_OPS, tw.CONST_STARTS, (1, 4)),
        "argx": (tw.ARGX_OPS, tw.STARTS + tw.ARR_STARTS, (1, 3)),
        "v1": (tw.V1_OPS, tw.V1_STARTS, (1, 4)),
    }[pool]
    compared, _skipped, divs = tw.run_pool(
        spark, df, pool, ops, starts, seed=71, iters=8, depth=depth)
    assert compared > 0
    assert not divs, divs[:5]


def test_threeway_random_doubles(spark):
    """Round 8 (VERDICT r7 #6): random 64-bit patterns reinterpreted
    as doubles through stringify/arith/compare/casts in all three
    evaluators.  First campaign immediately convicted BOTH engines of
    returning inf where the reference's serde_json::json!(f64) emits
    NULL for non-finite v2 arithmetic results."""
    recs = tw.dbl_records(8801)
    ddf = spark.createDataFrame(
        [(r["id"], r["d"], r["g"], r["ds"], r["gs"]) for r in recs],
        tw.DBL_SCHEMA)
    compared, _skipped, divs = tw.run_pool(
        spark, ddf, "dbl", tw.DBL_OPS, tw.DBL_STARTS, seed=8801,
        iters=10, depth=(1, 4), records=recs)
    assert compared > 0
    assert not divs, divs[:5]


# --- regression pins: every divergence class the round-7 three-way
# campaign surfaced, each fixed in the engines and pinned here against
# the interpreter's (= the reference's) exact wording -----------------

RULE = """
version: 2
input: {format: json}
mappings:
  - target: id
    source: id
  - target: out
    expr: [%s]
"""

# (expr, record, want) — want: ("ok", value) | ("err", kind, message)
R7_PINS = [
    # typed swallowed a constant concat error once Catalyst folded the
    # distinct-but-equal if branches (VERDICT r6 "constant-fold
    # residual", the [1] vs [0,{add:[1]}] shape)
    ('{a: 1}, {concat: [null]}, {if: {cond: {gt: ["$", 1]}, then: [1], '
     'else: [0, {add: [1]}]}}, {add: [1]}',
     {"id": 1},
     ("err", "ExprError",
      'expected string, got Object {"a": Number(1)}')),
    # positional order on an all-constant pipe: the ÷0 at step 2 beats
    # the later if-condition's missing-compare and the not's type error
    ('5, {divide: [0]}, {if: {cond: {gt: ["@input.absent", 1]}, '
     'then: [1], else: [2]}}, {not: []}',
     {"id": 1}, ("err", "ExprError", "division by zero")),
    # v2 cast kind is ExprError (v1 cast_value's TypeCastFailed is the
    # mapping-level `type:` only) and the cast error fires first
    ('{a: 1}, {int: []}, {if: {cond: {gt: ["$", 1]}, then: [1], '
     'else: [0, {add: [1]}]}}, {if: {cond: {gt: ["@input.absent", 1]}, '
     'then: [1], else: [2]}}',
     {"id": 1}, ("err", "ExprError", "failed to cast to int")),
    # v2 null routes through each op's converter, not the generic
    # null protocol
    ('null, {not: []}', {"id": 1},
     ("err", "ExprError", "value must be a boolean")),
    ('null, {int: []}', {"id": 1},
     ("err", "ExprError", "failed to cast to int")),
    ('null, {trim: []}', {"id": 1},
     ("err", "ExprError", "expected string, got Null")),
    ('"lit:x", {len: []}, {concat: [null]}', {"id": 1},
     ("err", "ExprError", "expected string, got Null")),
    # v2 string conversion is serde Display: integral floats keep .0
    ('2.0, {concat: ["lit:x"]}', {"id": 1}, ("ok", "2.0x")),
    ('2.0, {to_string: []}', {"id": 1}, ("ok", "2.0")),
    ('2.5, {trim: []}', {"id": 1}, ("ok", "2.5")),
    # ... while the v2 `string` CAST is strict value_to_string:
    # integral trim, containers/null error
    ('2.0, {string: []}', {"id": 1}, ("ok", "2")),
    ('"@input.obj", {string: []}', {"id": 1, "obj": {"a": 1}},
     ("err", "ExprError", "value must be string/number/bool")),
    # v2 value-embedding messages render the serde Debug form
    ('2.5, {first: []}', {"id": 1},
     ("err", "ExprError", "first requires array, got Number(2.5)")),
    ('"@input.nums", {map: [{multiply: [2]}]}', {"id": 1, "nums": None},
     ("err", "ExprError", "map step requires array, got Null")),
    ('"@input.obj", {divide: [2]}', {"id": 1, "obj": {"a": 1}},
     ("err", "ExprError",
      'expected number, got Object {"a": Number(1)}')),
    ('"lit:abc", {add: [1]}', {"id": 1},
     ("err", "ExprError", "failed to parse string as number")),
    # v1-op arg protocols (v2 delegates these to transform.rs): the
    # array arg converts first, count null has the generic wording
    ('"@input.nums", {take: ["@input.s"]}', {"id": 1, "nums": [1, 2],
                                             "s": None},
     ("err", "ExprError", "expr arg must not be null")),
    ('"@input.i", {key_by: [["@item"]]}, {take: [2]}',
     {"id": 1, "i": 7},
     ("err", "ExprError", "expr arg must be an array")),
    ('"@input.obj", {split: ["@input.s"]}',
     {"id": 1, "obj": {"a": 1}, "s": None},
     ("err", "ExprError", "value must be a string")),
    ('"@input.strs", {round: ["@input.n"]}',
     {"id": 1, "strs": ["b", "a"], "n": None},
     ("err", "ExprError", "operand must be a number")),
    # dynamic get: empty path errors; dotted paths navigate
    ('"@input.obj", {get: ["@input.s"]}',
     {"id": 1, "obj": {"a": 1}, "s": ""},
     ("err", "ExprError", "path must be a non-empty string")),
    ('"@input.deep", {get: ["@input.s"]}',
     {"id": 1, "deep": {"a": {"b": 5}}, "s": "a.b"},
     ("ok", 5)),
    # sort_by key protocol: missing key → its own wording
    ('"@input.pairs", {sort_by: [["@item", {get: ["nope"]}]]}',
     {"id": 1, "pairs": [{"a": 1}, {"a": 2}]},
     ("err", "ExprError", "expr arg must not be missing")),
    # a downstream op's STATIC type error must not preempt an upstream
    # constant raise threading through coalesce (r7 const-campaign:
    # typed surfaced len's error; _terr_forced now probes the operand)
    ('0, {if: {cond: {gt: ["@input.absent", 1]}, then: [1], '
     'else: [2]}}, {coalesce: [7]}, {len: []}',
     {"id": 1}, ("err", "ExprError", "cannot compare missing values")),
    # mixed int/float if branches must keep the serde number KIND per
    # row — widening to double renders "1.0" where the reference's
    # Int(1) renders "1" (r7 const-campaign typed VALUE bug; typed now
    # falls back on mixed-kind unify)
    ('5, {if: {cond: {gt: ["$", 1]}, then: [1], '
     'else: [0, {add: [1]}]}}, {to_string: []}, {len: []}',
     {"id": 1}, ("ok", 1)),
]


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    return v


# (expr, record, kind, message, path) — the round-7 PATH-parity pins:
# per-operand error paths (``{step}.args[o]``), v2-native vs delegated
# numbering, lambda/let/cond sub-paths, dynamic map-step item indexes,
# eager let-binding evaluation, Rust f64 string grammar.  All verified
# against eval_v2_* / transform.rs path construction via the
# interpreter (which itself passes the reference goldens).
R7_PATH_PINS = [
    # delegated op: null count at the operand slot (pipe = args[0])
    ('"@input.strs", {take: ["@input.absent2"]}',
     {"id": 1, "strs": ["a"], "absent2": None},
     "ExprError", "expr arg must not be null",
     "mappings[1].expr[1].args[1]"),
    # delegated op: non-array pipe at args[0]
    ('"@input.i", {zip: ["@input.strs"]}', {"id": 1, "i": 7, "strs": []},
     "ExprError", "expr arg must be an array",
     "mappings[1].expr[1].args[0]"),
    # native op: arg j at .args[j] (0-based)
    ('"@input.s", {concat: [null]}', {"id": 1, "s": "x"},
     "ExprError", "expected string, got Null",
     "mappings[1].expr[1].args[0]"),
    # native op: the pipe errors at the STEP path
    ('"@input.s", {add: [1]}', {"id": 1, "s": "x"},
     "ExprError", "failed to parse string as number",
     "mappings[1].expr[1]"),
    # v2 divide: the DIVISOR's arg path (v2_eval.rs:1921)
    ('5, {divide: [0]}', {"id": 1},
     "ExprError", "division by zero", "mappings[1].expr[1].args[0]"),
    # dynamic get: key errors at the key operand (delegated args[1])
    ('"@input.obj", {get: ["@input.s"]}',
     {"id": 1, "obj": {"a": 1}, "s": ""},
     "ExprError", "path must be a non-empty string",
     "mappings[1].expr[1].args[1]"),
    # map STEP: per-item path with the RUNTIME item index
    ('"@input.strs", {map: [{add: [1]}]}',
     {"id": 1, "strs": ["1", "2", "abc"]},
     "ExprError", "failed to parse string as number",
     "mappings[1].expr[1][2].step[0]"),
    # if condition path is .cond; compare-ord errors at the cond path
    ('"@input.s", {if: {cond: {gt: [{divide: [5, 0]}, 1]}, then: [1]}}',
     {"id": 1, "s": "x"},
     "ExprError", "cannot compare values of different types",
     "mappings[1].expr[1].cond"),
    # let binding path is {step}.{name}; binding-internal step paths
    ('"@input.s", {let: {x: [5, {divide: [0]}]}}, "@x"',
     {"id": 1, "s": "x"},
     "ExprError", "division by zero", "mappings[1].expr[1].x[1].args[0]"),
    # eager let: an UNUSED raising binding still raises
    # (eval_v2_let_step evaluates every binding in order)
    ('"@input.s", {let: {x: [5, {divide: [0]}]}}, {trim: []}',
     {"id": 1, "s": " x "},
     "ExprError", "division by zero", "mappings[1].expr[1].x[1].args[0]"),
    # lambda body path: raw args index, then the body's own step/arg
    ('"@input.nums", {find: [["@item", {gt: ["@input.n"]}]]}',
     {"id": 1, "nums": [1], "n": None},
     "ExprError", "comparison operand must be a number",
     "mappings[1].expr[1].args[0][1].args[0]"),
    # round: the reference splits the scale range errors
    ('2.5, {round: [400]}', {"id": 1},
     "ExprError", "scale is too large", "mappings[1].expr[1].args[1]"),
    # Rust parse::<f64> rejects whitespace (Spark's cast trims)
    ('" 1 ", {add: [1]}', {"id": 1},
     "ExprError", "failed to parse string as number",
     "mappings[1].expr[1]"),
    # sort_by order literal errors at the order operand AFTER the
    # empty-array early return
    ('"@input.nums", {sort_by: [["@item"], ["lit:bad"]]}',
     {"id": 1, "nums": [2, 1]},
     "ExprError", "order must be asc or desc",
     "mappings[1].expr[1].args[1]"),
    # SPARK-33847 fold residual: a NON-nullable upstream error cell
    # (coalesce with a literal) must still beat a later constant raise
    # — Catalyst folds probe*0/substring(probe,1,0) over non-nullable
    # columns, which used to delete the int-cast raise entirely
    ('"lit:x", {int: []}, {coalesce: [7]}, {divide: [0]}', {"id": 1},
     "ExprError", "failed to cast to int", "mappings[1].expr[1]"),
    # value_to_i64 rejects floats that do not survive the saturating
    # as-i64 round-trip (1e20 → i64::MAX ≠ 1e20); Spark's floor would
    # have ANSI-thrown here before the % 1.0 fract test
    ('"@input.strs2", {take: ["@input.f2"]}',
     {"id": 1, "strs2": ["a"], "f2": 1e20},
     "ExprError", "count must be an integer",
     "mappings[1].expr[1].args[1]"),
    # a typed STATIC type error (the ~= string guard) must not drop
    # the upstream per-row error (campaign: add's got-Array error won)
    ('"@input.arr2", {add: ["@input.s2"]}, {"~=": ["lit:a.*"]}',
     {"id": 1, "arr2": [3, 1], "s2": "x"},
     "ExprError", "expected number, got Array [Number(3), Number(1)]",
     "mappings[1].expr[1]"),
]


# cast_to_int SATURATES (``f as i64``, transform.rs:5945): value pins
R7_VALUE_PINS = [
    ('"@input.f2", {int: []}, {to_base: [16]}',
     {"id": 1, "f2": 1e20}, "7fffffffffffffff"),
    ('"@input.f2", {int: []}', {"id": 1, "f2": 1e-17}, 0),
    # Rust {} f64 Display: positional, ryu-shortest.  (-0 renders as
    # "-0" over typed DOUBLE columns — fuzz-covered via the table
    # path; the JSON-document path parses "-0.0" into a variant
    # DECIMAL which has no signed zero, a documented bridge limit.)
    ('"@input.f2", {string: []}', {"id": 1, "f2": 1e20},
     "100000000000000000000"),
    ('"@input.f2", {string: []}',
     {"id": 1, "f2": 1152921504606846976.0}, "1152921504606847000"),
    ('"@input.f2", {to_string: []}',
     {"id": 1, "f2": 1152921504606846976.0}, "1.152921504606847e18"),
    # unused raising let binding must still raise — covered as an
    # error pin above; the USED binding value survives the weave
    ('"@input.s2", {let: {x: [5, {add: [1]}]}}, "@x"',
     {"id": 1, "s2": "q"}, 6.0),
    # round 8: serde_json::json!(f64) — a non-finite v2 arithmetic
    # result is JSON NULL (Number::from_f64 → None), not inf
    ('"@input.f2", {multiply: [1e308]}', {"id": 1, "f2": 1e308}, None),
    ('"@input.f2", {multiply: [-1e308]}', {"id": 1, "f2": 1e308}, None),
    # the emitted null is a PRESENT JSON null: v2 coalesce skips it
    ('"@input.f2", {multiply: [1e308]}, {coalesce: ["lit:was-null"]}',
     {"id": 1, "f2": 1e308}, "was-null"),
    # ... and a finite product stays a number
    ('"@input.f2", {multiply: [2]}', {"id": 1, "f2": 1e200}, 2e200),
]


@pytest.mark.parametrize("expr,record,want", R7_VALUE_PINS,
                         ids=[p[0][:48] for p in R7_VALUE_PINS])
def test_r7_value_pins(spark, expr, record, want):
    import json
    from rulemorph_spark.engine import transform
    rule = RULE % expr
    out = interp.transform_record(rule, record)
    assert _norm(out.get("out")) == _norm(want), out
    res = transform(spark, rule, input_text=json.dumps([record]))
    assert _norm(res[0].get("out")) == _norm(want), res


@pytest.mark.parametrize(
    "expr,record,kind,message,path", R7_PATH_PINS,
    ids=[p[0][:48] for p in R7_PATH_PINS])
def test_r7_path_pins(spark, expr, record, kind, message, path):
    import json
    from rulemorph_spark.engine import transform
    rule = RULE % expr
    try:
        interp.transform_record(rule, record)
        got_i = ("ok",)
    except interp.InterpError as e:
        got_i = ("err", e.kind, e.message, e.path)
    assert got_i == ("err", kind, message, path), (expr, got_i)
    try:
        transform(spark, rule, input_text=json.dumps([record]))
        got_e = ("ok",)
    except TransformEngineError as e:
        got_e = ("err", e.kind, e.message, e.path)
    assert got_e == got_i, (expr, got_e, got_i)


@pytest.mark.parametrize("expr,record,want",
                         R7_PINS, ids=[p[0][:48] for p in R7_PINS])
def test_r7_threeway_pins(spark, expr, record, want):
    import json
    from rulemorph_spark.engine import transform
    rule = RULE % expr
    # interpreter agrees with the pin (the pin IS the reference)
    try:
        out = interp.transform_record(rule, record)
        got_i = ("ok", _norm(out.get("out")) if isinstance(out, dict)
                 else out)
    except interp.InterpError as e:
        got_i = ("err", e.kind, e.message)
    assert got_i == (want if want[0] == "err" else ("ok", _norm(want[1]))), \
        (expr, got_i)
    # the engine agrees too (end-to-end through the real error boundary)
    try:
        res = transform(spark, rule, input_text=json.dumps([record]))
        got_e = ("ok", _norm(res[0].get("out")))
    except TransformEngineError as e:
        got_e = ("err", e.kind, e.message)
    assert got_e == got_i, (expr, got_e, got_i)
