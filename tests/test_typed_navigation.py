"""Typed-path static navigation over array indexes and map columns
(VERDICT r3 next #5, ``compiler/typed.py:_walk_tokens``): common typed
parquet shapes must compile natively — no TypedFallback — and match the
variant engine's path semantics (``variant.py:navigate``; reference
``transform.rs:1006-1080``):

- ``[i]`` on an array: 0-based; OOB / negative / null array → missing,
  stored NULL element → JSON null;
- key on a map: absent key / null map → missing, stored NULL value →
  JSON null;
- key on an array, index on a struct/map: statically missing.

The missing/JSON-null distinction is observable through strict ops: a
missing operand PROPAGATES (result missing), a JSON null ERRORS.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def _arr_df(spark):
    return spark.createDataFrame(
        [(1, [("a", 3), ("b", 7)]),
         (2, [("c", 1)]),
         (3, None),
         (4, []),
         (5, [(None, None), ("e", 9)])],
        "id long, items array<struct<sku:string,qty:long>>")


def _map_df(spark):
    return spark.createDataFrame(
        [(1, {"color": "red", "size": "L"}),
         (2, {"size": "M"}),
         (3, None),
         (4, {"color": None})],
        "id long, attrs map<string,string>")


def _parity(spark, df, expr, expect_typed):
    rule = RULE % expr
    typed = transform_table(df, rule, mode="typed")
    got = {r["id"]: r["out"] for r in typed.collect()}
    assert got == expect_typed, expr
    vgot = {r["id"]: r["out"] for r in
            transform_table(df, rule, mode="variant")
            .select(F.to_json("id").cast("long").alias("id"),
                    F.to_json("out").alias("out")).collect()}
    # variant renders strings quoted and conflates nothing; compare
    # through the JSON text of the typed expectation
    import json
    want = {k: (None if v is None and vgot.get(k) in (None, "null")
                else json.dumps(v))
            for k, v in expect_typed.items()}
    for k in expect_typed:
        if want[k] is None:
            assert vgot[k] in (None, "null"), (expr, k, vgot[k])
        else:
            assert vgot[k] == want[k], (expr, k, vgot[k])


def test_array_index_navigation(spark):
    df = _arr_df(spark)
    _parity(spark, df, '"@input.items[0].sku"',
            {1: "a", 2: "c", 3: None, 4: None, 5: None})
    _parity(spark, df, '"@input.items[1].qty"',
            {1: 7, 2: None, 3: None, 4: None, 5: 9})
    # OOB is runtime-missing (NULL column)
    _parity(spark, df, '"@input.items[9].sku"',
            {1: None, 2: None, 3: None, 4: None, 5: None})
    # Key on an array is STATICALLY missing: the typed engine drops
    # the target from the output schema (missing keys are omitted from
    # a JSON document); the variant engine keeps the dynamic column
    # with every value missing
    out = transform_table(df, RULE % '"@input.items.sku"', mode="typed")
    assert "out" not in [f.name for f in out.schema.fields]
    vout = (transform_table(df, RULE % '"@input.items.sku"',
                            mode="variant")
            .select(F.to_json("out").alias("out")).collect())
    assert all(r["out"] is None for r in vout)


def test_array_index_missing_propagates_null_element_errors(spark):
    """OOB → missing → coalesce fills; row 5's [0].sku is a STORED
    null (JSON null) — coalesce also skips it, but a strict concat
    must error on it while eating missing silently."""
    df = _arr_df(spark)
    _parity(spark, df, '"@input.items[9].sku", {coalesce: ["filler"]}',
            {1: "filler", 2: "filler", 3: "filler", 4: "filler",
             5: "filler"})
    # concat over row-5 [0].sku (JSON null) errors in BOTH engines;
    # restrict to row 5 so the error row is the only row
    df5 = df.filter("id = 5")
    rule = RULE % '"@input.items[0].sku", {concat: ["!"]}'
    for mode in ("typed", "variant"):
        with pytest.raises(Exception, match="expected string, got Null"):
            transform_table(df5, rule, mode=mode).collect()
    # the same concat over a MISSING path (null array, row 3) must NOT
    # error: missing propagates to a missing (NULL) output
    df3 = df.filter("id = 3")
    for mode in ("typed", "variant"):
        out = transform_table(df3, rule, mode=mode)
        if mode == "variant":
            out = out.select(F.col("id").try_cast("string").alias("id"),
                             F.to_json("out").alias("out"))
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["out"] is None


def test_map_key_navigation(spark):
    df = _map_df(spark)
    _parity(spark, df, '"@input.attrs.color"',
            {1: "red", 2: None, 3: None, 4: None})
    _parity(spark, df, '"@input.attrs.color", {coalesce: ["none"]}',
            {1: "red", 2: "none", 3: "none", 4: "none"})
    # absent key is MISSING: strict concat propagates; stored NULL
    # value is JSON null: strict concat errors
    rule = RULE % '"@input.attrs.color", {concat: ["!"]}'
    for mode in ("typed", "variant"):
        out = transform_table(df.filter("id = 2"), rule, mode=mode)
        if mode == "variant":
            out = out.select(F.to_json("out").alias("out"))
        assert out.collect()[0]["out"] is None
        with pytest.raises(Exception, match="expected string, got Null"):
            transform_table(df.filter("id = 4"), rule,
                            mode=mode).collect()


def test_map_value_containers_navigate_through(spark):
    """map values that are structs keep navigating statically."""
    df = spark.createDataFrame(
        [(1, {"a": (1, "x")}), (2, {"b": (2, "y")})],
        "id long, m map<string,struct<n:long,s:string>>")
    rule = RULE % '"@input.m.a.s"'
    got = {r["id"]: r["out"] for r in
           transform_table(df, rule, mode="typed").collect()}
    assert got == {1: "x", 2: None}


def test_int_keyed_map_is_missing_not_fallback(spark):
    """non-castable key segment on an int-keyed map → missing (the
    bridge stringifies keys, so 'color' is equally absent on the
    variant side — see test_variant_bridge_stringifies...)."""
    df = spark.createDataFrame([(1, {5: "v"})],
                               "id long, m map<bigint,string>")
    got = transform_table(df, RULE % '"@input.m.color"',
                          mode="typed").collect()
    assert got[0]["out"] is None


def test_item_index_navigation_in_hof(spark):
    """@item paths with [i] inside map/filter compile typed (a bare
    ``@item[1]`` is NOT a valid ref in the reference grammar —
    ``v2_parser.rs:28-97`` requires a dot after the namespace — so the
    indexed path hangs off a struct field)."""
    df = spark.createDataFrame(
        [(1, [([("p", 1), ("q", 2)],), ([("r", 3)],)])],
        "id long, rows array<struct<pair:array<struct<k:string,"
        "v:long>>>>")
    rule = RULE % '"@input.rows", {map: ["@item.pair[1].k"]}'
    got = transform_table(df, rule, mode="typed").collect()
    # inner [1] OOB on the second element → v2 map drops missing
    assert got[0]["out"] == ["q"]
    vgot = (transform_table(df, rule, mode="variant")
            .select(F.to_json("out").alias("out")).collect())
    assert vgot[0]["out"] == '["q"]'


def test_variant_column_still_falls_back(spark):
    df = spark.createDataFrame([(1, '{"a": 1}')], "id long, j string") \
        .select("id", F.parse_json("j").alias("v"))
    with pytest.raises(TypedFallback):
        transform_table(df, RULE % '"@input.v.a"', mode="typed")


def test_get_op_with_index_and_map_paths(spark):
    """the object op `get` shares the static walk: bracket indexes and
    map keys in the path compile typed, with variant parity."""
    df = spark.createDataFrame(
        [(1, ([("a", 3), ("b", 7)], {"c": "x"})),
         (2, ([], {}))],
        "id long, o struct<items:array<struct<sku:string,qty:long>>,"
        "attrs:map<string,string>>")
    for expr, expect in [
        ('"@input.o", {get: ["items[1].sku"]}', {1: "b", 2: None}),
        ('"@input.o", {get: ["items[9].sku"]}, {coalesce: ["f"]}',
         {1: "f", 2: "f"}),
        ('"@input.o", {get: ["attrs.c"]}', {1: "x", 2: None}),
    ]:
        rule = RULE % expr
        got = {r["id"]: r["out"] for r in
               transform_table(df, rule, mode="typed").collect()}
        assert got == expect, expr
        vgot = {r["id"]: r["out"] for r in
                transform_table(df, rule, mode="variant")
                .select(F.to_json("id").cast("long").alias("id"),
                        F.to_json("out").alias("out")).collect()}
        for k, v in expect.items():
            if v is None:
                assert vgot[k] in (None, "null"), (expr, k)
            else:
                assert vgot[k] == f'"{v}"', (expr, k, vgot[k])


def test_numeric_keyed_map_numeric_path_segment(spark):
    """`@input.m.5` (Key('5') token) on map<bigint,string> casts the
    segment to the key type; the variant bridge stringifies map keys
    (to_variant_object rejects non-string keys), so both engines find
    key 5 under segment '5'."""
    df = spark.createDataFrame([(1, {5: "five"}), (2, {7: "seven"})],
                               "id long, m map<bigint,string>")
    rule = RULE % '"@input.m.5", {coalesce: ["absent"]}'
    got = {r["id"]: r["out"] for r in
           transform_table(df, rule, mode="typed").collect()}
    assert got == {1: "five", 2: "absent"}
    vgot = {r["id"]: r["out"] for r in
            transform_table(df, rule, mode="variant")
            .select(F.to_json("id").cast("long").alias("id"),
                    F.to_json("out").alias("out")).collect()}
    assert vgot == {1: '"five"', 2: '"absent"'}


def test_randomized_navigation_parity_sweep(spark):
    """Seeded random sweep: nested struct/array/map schemas × random
    ref paths (valid, invalid, OOB) — typed and variant engines must
    agree on every JSON-comparable result.  Typed-only shapes
    (TypedFallback) are skipped but counted; the sweep must exercise a
    healthy number of comparable cases."""
    import json as _json
    import random

    rng = random.Random(20260814)
    SCALARS = [("long", lambda: rng.randrange(100)),
               ("string", lambda: rng.choice(["a", "b", "zz"])),
               ("boolean", lambda: rng.random() < 0.5),
               ("date", None)]

    def gen_type(depth):
        roll = rng.random()
        if depth <= 0 or roll < 0.35:
            return rng.choice(SCALARS)[0]
        if roll < 0.6:
            n = rng.randrange(1, 3)
            return {f"f{j}": gen_type(depth - 1) for j in range(n)}
        if roll < 0.8:
            return [gen_type(depth - 1)]
        return ("map", gen_type(depth - 1),
                rng.choice(["string", "bigint"]))

    def ddl(t):
        if isinstance(t, str):
            return t
        if isinstance(t, dict):
            inner = ",".join(f"{k}:{ddl(v)}" for k, v in t.items())
            return f"struct<{inner}>"
        if isinstance(t, list):
            return f"array<{ddl(t[0])}>"
        return f"map<{t[2]},{ddl(t[1])}>"

    def gen_value(t, null_p=0.25):
        if rng.random() < null_p:
            return None
        if t == "long":
            return rng.randrange(100)
        if t == "string":
            return rng.choice(["a", "b", "zz"])
        if t == "boolean":
            return rng.random() < 0.5
        if t == "date":
            import datetime
            return datetime.date(2020, rng.randrange(1, 13),
                                 rng.randrange(1, 28))
        if isinstance(t, dict):
            return {k: gen_value(v) for k, v in t.items()}
        if isinstance(t, list):
            return [gen_value(t[0]) for _ in range(rng.randrange(0, 3))]
        pool = (["k1", "k2", "k3"] if t[2] == "string"
                else [1, 2, 3])
        keys = rng.sample(pool, rng.randrange(0, 3))
        return {k: gen_value(t[1]) for k in keys}

    def gen_path(t):
        segs = []
        while not isinstance(t, str):
            if isinstance(t, dict):
                if rng.random() < 0.12:
                    segs.append(f".nope{rng.randrange(3)}")
                    break
                k = rng.choice(list(t))
                segs.append(f".{k}")
                t = t[k]
            elif isinstance(t, list):
                segs.append(f"[{rng.randrange(0, 4)}]")
                t = t[0]
            else:
                if t[2] == "string":
                    segs.append(f".k{rng.randrange(1, 5)}")
                else:
                    segs.append(f".{rng.randrange(1, 5)}")
                t = t[1]
            if rng.random() < 0.25:
                break
        return "".join(segs).lstrip(".")

    compared = skipped = 0
    for si in range(8):
        schema = {f"c{j}": gen_type(2) for j in range(2)}
        schema_ddl = ", ".join(f"{k} {ddl(v)}" for k, v in schema.items())
        pyrows = [[i] + [gen_value(schema[f"c{j}"]) for j in range(2)]
                  for i in range(6)]
        df = spark.createDataFrame(
            [tuple(r) for r in pyrows], f"id long, {schema_ddl}")
        for _ in range(6):
            root = rng.choice(list(schema))
            sub = gen_path(schema[root])
            ref = f"@input.{root}" + (("." + sub) if sub
                                      and not sub.startswith("[") else sub)
            rule = RULE % f'"{ref}"'
            try:
                typed = transform_table(df, rule, mode="typed")
            except TypedFallback:
                skipped += 1
                continue
            variant = transform_table(df, rule, mode="variant")
            tcols = [f.name for f in typed.schema.fields]

            def norm(v):
                if hasattr(v, "asDict"):
                    return {k: norm(x)
                            for k, x in v.asDict(recursive=False).items()}
                if isinstance(v, dict):
                    return {k: norm(x) for k, x in v.items()}
                if isinstance(v, list):
                    return [norm(x) for x in v]
                return v

            if "out" in tcols:
                tg = {r["id"]: norm(r["out"])
                      for r in typed.collect()}
            else:  # statically missing: typed drops the column
                tg = {r["id"]: None for r in df.select("id").collect()}
            vg = {}
            for r in variant.select(
                    F.col("id").try_cast("long").alias("id"),
                    F.to_json("out").alias("out")).collect():
                vg[r["id"]] = (None if r["out"] is None
                               else _json.loads(r["out"]))
            # variant JSON-null and missing both land as None here,
            # matching typed's SQL NULL conflation in table mode
            assert tg == vg, (ref, schema_ddl, tg, vg)
            compared += 1
    assert compared >= 20, (compared, skipped)


def test_variant_bridge_stringifies_nonstring_map_keys(spark):
    """to_variant_object refuses map<bigint,...>; the bridge casts
    keys to string first (JSON objects are string-keyed anyway), so
    the VARIANT engine works on these tables too and agrees with the
    typed key-cast navigation — incl. nested maps and null structs."""
    df = spark.createDataFrame(
        [(1, {5: "five"}, ({7: 70},)),
         (2, {9: "nine"}, None)],
        "id long, m map<bigint,string>, "
        "s struct<inner:map<bigint,bigint>>")
    rule = RULE % '"@input.m.5", {coalesce: ["absent"]}'
    for mode in ("typed", "variant"):
        out = transform_table(df, rule, mode=mode)
        if mode == "variant":
            got = {r["id"]: r["out"] for r in out.select(
                F.to_json("id").cast("long").alias("id"),
                F.to_json("out").alias("out")).collect()}
            assert got == {1: '"five"', 2: '"absent"'}
        else:
            got = {r["id"]: r["out"] for r in out.collect()}
            assert got == {1: "five", 2: "absent"}
    # nested under a struct + a NULL struct row stays missing
    rule2 = RULE % '"@input.s.inner.7", {coalesce: [-1]}'
    vgot = {r["id"]: r["out"] for r in
            transform_table(df, rule2, mode="variant").select(
                F.to_json("id").cast("long").alias("id"),
                F.to_json("out").alias("out")).collect()}
    assert vgot == {1: "70", 2: "-1"}
    tgot = {r["id"]: r["out"] for r in
            transform_table(df, rule2, mode="typed").collect()}
    assert tgot == {1: 70, 2: -1}


def test_temporal_columns_enter_rules_as_strings(spark):
    """date/timestamp columns cross into the rules domain as their
    Spark string rendering in BOTH engines (the data model is JSON —
    dates are strings), so date ops work on typed parquet tables."""
    import datetime
    df = spark.createDataFrame(
        [(1, datetime.date(2020, 1, 2),
          datetime.datetime(2020, 1, 2, 3, 4, 5),
          [datetime.date(2021, 6, 7)],
          (datetime.date(2022, 3, 4),)),
         (2, None, None, [], None)],
        "id long, d date, ts timestamp_ntz, ds array<date>, "
        "s struct<when:date>")
    # strict date ops over row 2's NULL date would (correctly) raise
    # the reference's null-pipe error, so op cases run on row 1 only
    cases = [
        (df, '"@input.d"', {1: "2020-01-02", 2: None}),
        (df.filter("id = 1"),
         '"@input.d", {date_format: ["%Y/%m/%d", "%Y-%m-%d"]}',
         {1: "2020/01/02"}),
        (df.filter("id = 1"), '"@input.ts", {to_unixtime: ["s"]}',
         {1: 1577934245}),
        (df, '"@input.ds[0]"', {1: "2021-06-07", 2: None}),
        (df, '"@input.s.when"', {1: "2022-03-04", 2: None}),
    ]
    import json as _json
    for frame, expr, expect in cases:
        rule = RULE % expr
        tgot = {r["id"]: r["out"] for r in
                transform_table(frame, rule, mode="typed").collect()}
        assert tgot == expect, ("typed", expr, tgot)
        vgot = {r["id"]: (None if r["out"] is None
                          else _json.loads(r["out"]))
                for r in transform_table(frame, rule, mode="variant")
                .select(F.to_json("id").cast("long").alias("id"),
                        F.to_json("out").alias("out")).collect()}
        assert vgot == expect, ("variant", expr, vgot)


def test_v2_eq_number_kinds_serde_semantics(spark):
    """v2 condition equality follows serde_json Number PartialEq
    (v2_eval.rs:1140 via serde `l == r`): integer vs float NEVER equal
    even when numerically equal; floats compare by f64 value (1e2 ==
    100.0); null ≡ missing.  Both engines, document and table modes."""
    import json as _json

    from rulemorph_spark.engine import transform

    rule = """
version: 2
input: {format: json}
record_when: {eq: ["@input.x", %s]}
mappings:
  - target: x
    source: x
"""
    cases = [
        ("100.0", [{"x": 100}, {"x": 100.0}], [{"x": 100.0}]),
        ("100", [{"x": 100}, {"x": 100.0}], [{"x": 100}]),
        ("1.5", [{"x": 1.5}, {"x": 2}], [{"x": 1.5}]),
    ]
    for lit, data, expect in cases:
        got = transform(spark, rule % lit,
                        input_text=_json.dumps(data))
        assert got == expect, (lit, got)
    # scientific float == plain float (both serde Float 100.0; the
    # scientific form comes from the JSON data — YAML 1.1 reads a bare
    # 1e2 literal as a string)
    got = transform(spark, rule % "100.0",
                    input_text='[{"x": 1e2}, {"x": 100}]')
    assert got == [{"x": 100.0}], got
    # typed table parity incl. a decimal column (float class)
    import decimal
    df = spark.createDataFrame(
        [(1, 100, 100.0, decimal.Decimal("100.00")),
         (2, 7, 7.5, decimal.Decimal("7.50"))],
        "id long, i long, d double, dec decimal(10,2)")
    r2 = """
version: 2
input: {format: json}
record_when: {eq: ["@input.%s", %s]}
mappings:
  - target: id
    source: id
"""
    for col, lit, expect in [("i", "100.0", 0), ("i", "100", 1),
                             ("d", "100.0", 1), ("d", "100", 0),
                             ("dec", "100.0", 1), ("dec", "100", 0)]:
        t = transform_table(df, r2 % (col, lit), mode="typed").count()
        v = transform_table(df, r2 % (col, lit), mode="variant").count()
        assert t == v == expect, (col, lit, t, v)


def test_v2_eq_u64_boundary_fuzz(spark):
    """Number-kind equality across the u64 boundary (round-5 fix,
    VERDICT r4 "what's wrong" #1): serde parses integer literals in
    (i64::MAX, u64::MAX] as PosInt — still *integer* kind — while
    Spark's variant stores them as DECIMAL(p,0); both engines must
    classify those as integer (exact compare) and keep everything
    else in the float class.  Oracle: serde_json Number PartialEq
    reimplemented in Python.  Floats are generated in scientific
    form (-> DOUBLE), so the documented-unrecoverable
    ``<huge>.0``-literal ambiguity is not exercised here."""
    import random

    from rulemorph_spark.engine import transform_table

    rng = random.Random(64646464)
    df = spark.createDataFrame([(1,)], "id long")

    def serde_eq(a, b):
        def kind(v):
            if isinstance(v, int) and not isinstance(v, bool):
                if -(2 ** 63) <= v <= 2 ** 64 - 1:
                    return "int", v
                return "float", float(v)  # serde overflow -> Float
            return "float", float(v)
        (ka, va), (kb, vb) = kind(a), kind(b)
        return ka == kb and va == vb

    def yaml_num(v):
        if isinstance(v, float):
            return repr(v)  # scientific for huge -> variant DOUBLE
        return str(v)

    cases = [
        (2 ** 64 - 1, 1.8446744073709552e19),   # the VERDICT pin
        (2 ** 64 - 1, 2 ** 64 - 1),
        (2 ** 63, 2 ** 63),
        (2 ** 63 - 1, 2 ** 63),
        (2 ** 64, 2 ** 64 - 1),                 # > u64 -> float kind
        (-(2 ** 63) - 1, float(-(2 ** 63) - 1)),
    ]
    for _ in range(60):
        base = rng.randrange(2 ** 62, 2 ** 65)
        a = base if rng.random() < 0.5 else float(base)
        b = rng.choice([base, base + rng.randrange(-2, 3),
                        float(base), -base])
        if not isinstance(b, float) and rng.random() < 0.4:
            b = float(b)
        cases.append((a, b))

    rule = """
version: 2
input: {format: json}
record_when: {eq: [%s, %s]}
mappings:
  - target: id
    source: id
"""
    for a, b in cases:
        expect = 1 if serde_eq(a, b) else 0
        r = rule % (yaml_num(a), yaml_num(b))
        t = transform_table(df, r, mode="typed").count()
        v = transform_table(df, r, mode="variant").count()
        assert t == expect, ("typed", a, b, t, expect)
        assert v == expect, ("variant", a, b, v, expect)
