"""Typed fast-path object ops (compiler/typed.py): struct-native
merge/deep_merge/get/pick/omit/keys/values/entries/len must match the
variant engine over the SAME typed table (VERDICT r2 next #4), and the
maybe-missing protocol must defer to the variant engine wherever a
runtime NULL could mean *missing* rather than JSON null.

Comparison is order-insensitive on object keys (the variant renderer
sorts keys; typed structs keep declaration order — JSON objects are
unordered) and keeps null fields (to_json drops them by default).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rulemorph_spark.engine import transform_table


def _df(spark):
    return spark.createDataFrame(
        [(1, ("bob", 30), ("x", 1.5), (("inner", 7), "l1")),
         (2, ("ann", None), ("y", 2.5), ((None, 8), None)),
         (3, (None, 4), ("z", 3.5), (None, "l3"))],
        "id long, u struct<name:string,age:long>, "
        "m struct<tag:string,score:double>, "
        "n struct<sub:struct<s:string,k:long>,label:string>")


def _rows(out):
    """Rows as JSON-comparable dicts: containers via to_json with
    nulls kept, then parsed (dict compare ignores key order)."""
    sel = []
    for f in out.schema.fields:
        if isinstance(f.dataType, (T.StructType, T.ArrayType,
                                   T.VariantType)):
            sel.append(F.to_json(F.col(f.name),
                                 {"ignoreNullFields": "false"})
                       .alias(f.name))
        else:
            sel.append(F.col(f.name))
    parsed = []
    for r in out.select(*sel).collect():
        d = {}
        for f in out.schema.fields:
            v = r[f.name]
            if isinstance(f.dataType, (T.StructType, T.ArrayType,
                                       T.VariantType)) and v is not None:
                v = json.loads(v)
            d[f.name] = v
        parsed.append(d)
    return sorted(parsed, key=lambda d: json.dumps(d, sort_keys=True,
                                                   default=str))


RULE = """
version: 2
input: {format: json}
mappings:
  - target: id
    source: id
  - target: out
    expr: [%s]
"""


def _assert_parity(spark, expr, df=None, rule=None):
    df = df if df is not None else _df(spark)
    rule = rule or (RULE % expr)
    typed = transform_table(df, rule, mode="typed")
    plan = typed._jdf.queryExecution().executedPlan().toString()
    assert "variant" not in plan.lower(), expr
    variant = transform_table(df, rule, mode="variant")
    tr, vr = _rows(typed), _rows(variant)
    assert tr == vr, f"{expr}\n typed={tr}\n variant={vr}"
    return typed


def test_merge_struct_refs_and_literals(spark):
    _assert_parity(spark, '"@input.u", {merge: ["@input.m"]}')
    _assert_parity(spark, '"@input.u", {merge: [{lit: {extra: true}}]}')
    # rightmost wins on overlapping keys, including a NULL-valued key
    _assert_parity(
        spark, '"@input.u", {merge: [{lit: {name: "zz"}}, "@input.u"]}')
    _assert_parity(
        spark, '{merge: [{lit: {a: 1, b: "x"}}, {lit: {b: "y", c: 2.5}}]}')


def test_merge_errors_match(spark):
    df = _df(spark)
    for expr in ('"@input.u", {merge: [null]}',
                 '"@input.u", {merge: ["hello"]}',
                 '"@input.id", {merge: ["@input.u"]}'):
        rule = RULE % expr
        errs = {}
        for mode in ("typed", "variant"):
            with pytest.raises(Exception) as ei:
                transform_table(df, rule, mode=mode).collect()
            errs[mode] = str(ei.value)
        for key in ("ExprError",):
            assert (key in errs["typed"]) == (key in errs["variant"]), \
                (expr, errs)
        # same message payload
        for msg in ("must not be null", "must be object"):
            assert (msg in errs["typed"]) == (msg in errs["variant"]), \
                (expr, errs)


def test_deep_merge_nested(spark):
    df = _df(spark)
    # nested-object recursion + null-subtree replacement (row 3: n.sub
    # is NULL → right subtree replaces wholesale)
    _assert_parity(
        spark,
        '"@input.n", {deep_merge: [{lit: {sub: {s: "S2"}, extra: 9}}]}',
        df=df)
    # right-side null VALUE replaces (objects are values too)
    _assert_parity(spark, '"@input.n", {deep_merge: [{lit: {sub: null}}]}',
                   df=df)
    # arrays replaced, not concatenated
    _assert_parity(
        spark,
        '{deep_merge: [{lit: {a: [1, 2], b: {x: 1}}}, '
        '{lit: {a: [3], b: {y: 2}}}]}', df=df)


def test_get_literal_paths(spark):
    _assert_parity(spark, '"@input.u", {get: ["name"]}')
    _assert_parity(spark, '"@input.n", {get: ["sub.k"]}')
    # get over non-object → missing in both engines (not an error);
    # typed drops the statically-missing column, variant keeps a
    # null one — values agree, schema differs by contract
    df = _df(spark)
    rule = RULE % '"@input.id", {get: ["x"]}'
    typed = transform_table(df, rule, mode="typed")
    assert typed.columns == ["id"]
    variant = transform_table(df, rule, mode="variant")
    assert all(r["out"] is None for r in variant.collect())


def test_get_absent_key_is_missing(spark):
    df = _df(spark)
    rule = RULE % '"@input.u", {get: ["nope"]}'
    variant = transform_table(df, rule, mode="variant")
    assert all(r["out"] is None for r in variant.collect())
    # typed mode drops the statically-missing target column — the
    # JSON contract drops missing keys, so only the schema differs
    typed = transform_table(df, rule, mode="typed")
    assert typed.columns == ["id"]


def test_pick_omit_keys_values_entries_len(spark):
    _assert_parity(spark, '"@input.u", {pick: ["age"]}')
    _assert_parity(spark, '"@input.u", {pick: ["age", "name"]}')
    _assert_parity(spark, '"@input.u", {pick: ["age", "ghost"]}')
    _assert_parity(spark, '"@input.u", {omit: ["age"]}')
    _assert_parity(spark, '"@input.u", {keys: []}')
    _assert_parity(spark, '"@input.u", {len: []}')
    # same-typed fields unify for values/entries (mixed types defer
    # to the variant engine — covered in the fallback test)
    df2 = _df(spark).select(
        "id", F.struct(F.col("u.name").alias("a"),
                       F.lit("zz").alias("b")).alias("u"), "m", "n")
    _assert_parity(spark, '"@input.u", {values: []}', df=df2)
    _assert_parity(spark, '"@input.u", {entries: []}', df=df2)


def test_struct_output_and_literal_objects(spark):
    # struct-valued source mapping + object literal value
    rule = """
version: 2
input: {format: json}
mappings:
  - target: id
    source: id
  - target: user
    source: u
  - target: fixed
    expr: [{lit: {k: 1, s: "x"}}]
"""
    _assert_parity(spark, "struct source", rule=rule)


def test_mixed_value_types_fall_back(spark):
    from rulemorph_spark.compiler.typed import TypedFallback
    df = _df(spark)
    with pytest.raises(TypedFallback):
        transform_table(df, RULE % '"@input.m", {values: []}',
                        mode="typed")
    # auto mode silently reruns on the variant engine
    out = transform_table(df, RULE % '"@input.m", {values: []}',
                          mode="auto")
    assert out.count() == 3


def test_tri_state_nested_ref_strict_op(spark):
    """Nested refs through a nullable struct STAY TYPED via the
    missing_when tri-state: the null-intermediate row propagates
    missing through strict ops instead of mis-raising 'must not be
    null' — and the plan remains variant-free."""
    df = spark.createDataFrame([(1, ("bob",)), (2, None)],
                               "id long, s struct<name:string>")
    rule = RULE % '"@input.s.name", {concat: ["!"]}'
    typed = transform_table(df, rule, mode="typed")
    plan = typed._jdf.queryExecution().executedPlan().toString()
    assert "variant" not in plan.lower()
    got = {r["id"]: r["out"] for r in typed.collect()}
    assert got == {1: "bob!", 2: None}
    variant = transform_table(df, rule, mode="variant")
    vgot = {r["id"]: r["out"] for r in
            variant.select(F.to_json("id").cast("long").alias("id"),
                           F.to_json("out").alias("out")).collect()}
    assert vgot == {1: '"bob!"', 2: None}
    # a true JSON null leaf still ERRORS in both engines
    df2 = spark.createDataFrame([(3, (None,))],
                                "id long, s struct<name:string>")
    for mode in ("typed", "variant"):
        with pytest.raises(Exception, match="expected string, got Null"):
            transform_table(df2, rule, mode=mode).collect()


def test_tri_state_default_and_required(spark):
    """default substitutes on exactly the runtime-missing rows;
    required raises the reference's missing-vs-null messages — all on
    the typed path."""
    df = spark.createDataFrame(
        [(1, ("bob",)), (2, None), (3, (None,))],
        "id long, s struct<name:string>")
    rule_d = """
version: 2
input: {format: json}
mappings:
  - target: id
    source: id
  - target: name
    source: input.s.name
    default: "anon"
"""
    typed = transform_table(df, rule_d, mode="typed")
    got = {r["id"]: r["name"] for r in typed.collect()}
    # row 2: s null → name missing → default; row 3: name IS null
    # (present) → default does not apply (cast/copy keeps null)
    assert got == {1: "bob", 2: "anon", 3: None}
    vgot = {r["id"]: r["name"] for r in
            transform_table(df, rule_d, mode="variant")
            .select(F.to_json("id").cast("long").alias("id"),
                    F.to_json("name").alias("name")).collect()}
    assert vgot == {1: '"bob"', 2: '"anon"', 3: "null"}
    rule_r = rule_d.replace('default: "anon"', "required: true")
    for mode in ("typed", "variant"):
        with pytest.raises(Exception, match="required value is"):
            (transform_table(df.filter("id = 2"), rule_r, mode=mode)
             .collect())
    # message parity: missing vs null
    errs = {}
    for mode in ("typed", "variant"):
        for rid, want in ((2, "missing"), (3, "null")):
            with pytest.raises(Exception) as ei:
                (transform_table(df.filter(f"id = {rid}"), rule_r,
                                 mode=mode).collect())
            errs[(mode, rid)] = str(ei.value)
            assert f"required value is {want}" in str(ei.value), \
                (mode, rid, str(ei.value)[:200])


def test_tri_state_first_of_empty(spark):
    """first([]) piped into concat stays typed: empty → missing →
    propagates (NULL out); null ELEMENT still errors."""
    df = spark.createDataFrame([(1, []), (2, ["a"])],
                               "id long, arr array<string>")
    rule = RULE % '"@input.arr", {first: []}, {concat: ["y"]}'
    typed = transform_table(df, rule, mode="typed")
    got = {r["id"]: r["out"] for r in typed.collect()}
    assert got == {1: None, 2: "ay"}
    dfn = spark.createDataFrame([(3, [None, "x"])],
                                "id long, arr array<string>")
    for mode in ("typed", "variant"):
        with pytest.raises(Exception, match="expected string, got Null"):
            transform_table(dfn, rule, mode=mode).collect()


def test_tri_state_coalesce_all_absent(spark):
    """coalesce skips null AND missing; ALL absent → missing, which
    must propagate through a following strict op (not error)."""
    df = spark.createDataFrame([(1, "x", None), (2, None, None)],
                               "id long, a string, b string")
    rule = RULE % '"@input.a", {coalesce: ["@input.b"]}, {concat: ["!"]}'
    typed = transform_table(df, rule, mode="typed")
    got = {r["id"]: r["out"] for r in typed.collect()}
    assert got == {1: "x!", 2: None}
    vgot = {r["id"]: r["out"] for r in
            transform_table(df, rule, mode="variant")
            .select(F.to_json("id").cast("long").alias("id"),
                    F.to_json("out").alias("out")).collect()}
    assert vgot == {1: '"x!"', 2: None}


def test_array_of_struct_item_navigation(spark):
    """array<struct> columns are typed-referencable; @item.field
    navigates statically inside filter and the map step, with v2
    map's drop-missing for null elements.

    Reference predicate semantics (``docs/rules_spec_en.md:341-355``,
    ``v2_parser.rs:438-482``): filter predicates are PIPES; a lone
    condition dict parses as an object LITERAL, whose evaluation on a
    non-empty array raises "value must be a boolean" at runtime.  A
    bare comparison over a null operand raises "comparison operand
    must be a number" (v1 comparison semantics) — so the counting
    shape pre-filters null qty with the spec's own ``!=`` example."""
    df = spark.createDataFrame(
        [(1, [("a", 3), ("b", 7), (None, None)]),
         (2, [])],
        "id long, items array<struct<sku:string,qty:long>>")
    # careful: element 3 of row 1 is a present struct with null fields
    rule_f = RULE % ('"@input.items", '
                     '{filter: [["@item.qty", {"!=": null}]]}, '
                     '{filter: [["@item.qty", {gte: [5]}]]}, {len: []}')
    typed = transform_table(df, rule_f, mode="typed")
    got = {r["id"]: r["out"] for r in typed.collect()}
    assert got == {1: 1, 2: 0}
    vgot = {r["id"]: r["out"] for r in
            transform_table(df, rule_f, mode="variant")
            .select(F.to_json("id").cast("long").alias("id"),
                    F.to_json("out").alias("out")).collect()}
    assert vgot == {1: "1", 2: "0"}
    # lone-dict predicate = object literal → reference runtime error
    # on the non-empty array (variant engine; typed raises
    # TypedFallback at compile since the literal is mixed-type)
    rule_lit = RULE % ('"@input.items", '
                       '{filter: [{gte: ["@item.qty", 5]}]}, {len: []}')
    with pytest.raises(Exception, match="value must be a boolean"):
        transform_table(df, rule_lit, mode="variant").collect()
    # bare comparison over the null-qty element → reference v1 error
    # in BOTH engines
    rule_gte = RULE % ('"@input.items", '
                       '{filter: [["@item.qty", {gte: [5]}]]}, {len: []}')
    for mode in ("typed", "variant"):
        with pytest.raises(Exception,
                           match="comparison operand must be a number"):
            transform_table(df, rule_gte, mode=mode).collect()
    # map step extracting a field: NULL STRUCT elements drop (missing)
    dfn = spark.createDataFrame(
        [(1, [("a", 1), None, ("c", 2)])],
        "id long, items array<struct<sku:string,qty:long>>")
    rule_m = """
version: 2
input: {format: json}
mappings:
  - target: id
    source: id
  - target: skus
    expr: ["@input.items", {map: ["@item.sku"]}]
"""
    tg = {r["id"]: r["skus"] for r in
          transform_table(dfn, rule_m, mode="typed").collect()}
    vg = {r["id"]: r["skus"] for r in
          transform_table(dfn, rule_m, mode="variant")
          .select(F.to_json("id").cast("long").alias("id"),
                  F.to_json("skus").alias("skus")).collect()}
    assert tg == {1: ["a", "c"]}
    assert vg == {1: '["a","c"]'}


def test_v1_comparison_null_and_missing_parity(spark):
    """v1 pipe comparisons: eq treats missing ≡ null (is_absent);
    orderings ERROR on JSON null but yield null on missing; ~= errors
    on null — all matching the variant engine on the typed path."""
    df = spark.createDataFrame([(1, 3.0, "x")],
                               "id long, a double, s string")
    # eq with statically-missing operand ≡ null: "x" == missing → false
    rule_eq = RULE % '"@input.s", {"==": ["@input.nope"]}'
    t = {r["id"]: r["out"] for r in
         transform_table(df, rule_eq, mode="typed").collect()}
    v = {r["id"]: r["out"] for r in
         transform_table(df, rule_eq, mode="variant")
         .select(F.to_json("id").cast("long").alias("id"),
                 F.to_json("out").alias("out")).collect()}
    assert t == {1: False} and v == {1: "false"}
    # ordering with a JSON-null operand errors in BOTH engines
    dfn = spark.createDataFrame([(2, None, "x")],
                                "id long, a double, s string")
    rule_lt = RULE % '"@input.a", {"<": [5]}'
    for mode in ("typed", "variant"):
        with pytest.raises(Exception, match="must be a number"):
            transform_table(dfn, rule_lt, mode=mode).collect()
    # ordering with a statically-MISSING operand → null result, both
    rule_lt_m = RULE % '"@input.nope", {"<": [5]}'
    t = {r["id"]: r["out"] for r in
         transform_table(df, rule_lt_m, mode="typed").collect()}
    v = {r["id"]: str(r["out"]) for r in
         transform_table(df, rule_lt_m, mode="variant")
         .select(F.to_json("id").cast("long").alias("id"),
                 F.to_json("out").alias("out")).collect()}
    assert t == {1: None} and v == {1: "None"}
    # ~= with a null operand errors in both engines
    rule_re = RULE % '"@input.s", {"~=": ["@input.p"]}'
    dfr = spark.createDataFrame([(3, "x", None)],
                                "id long, s string, p string")
    for mode in ("typed", "variant"):
        with pytest.raises(Exception, match="must be a string"):
            transform_table(dfr, rule_re, mode=mode).collect()


def test_pipe_op_arity_enforced(spark):
    """A 2-arg pipe `eq` is an EVAL error in the reference
    ("expr.args must contain exactly one item", fired per evaluation —
    round 9 eval-surface arity parity), not a compile rejection; the
    typed path defers the anomalous shape to the variant engine and
    both evaluate to the same raising column."""
    df = _df(spark)
    rule = RULE % '{eq: ["@input.id", "@input.id"]}'
    for mode in ("auto", "variant"):
        out = transform_table(df, rule, mode=mode)
        with pytest.raises(Exception,
                           match="expr.args must contain exactly one"):
            out.collect()
