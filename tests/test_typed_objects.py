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


def test_maybe_missing_defers_to_variant(spark):
    """Nested refs through a nullable struct: runtime NULL could be
    missing (null intermediate) — strict ops and default/required
    must NOT run typed (regression for the mis-raised 'must not be
    null')."""
    from rulemorph_spark.compiler.typed import TypedFallback
    df = spark.createDataFrame([(1, ("bob",)), (2, None)],
                               "id long, s struct<name:string>")
    rule = RULE % '"@input.s.name", {concat: ["!"]}'
    with pytest.raises(TypedFallback):
        transform_table(df, rule, mode="typed")
    out = transform_table(df, rule, mode="auto")
    got = {r["id"]: r["out"] for r in
           out.select(F.to_json("id").cast("long").alias("id"),
                      F.to_json("out").alias("out")).collect()}
    assert got == {1: '"bob!"', 2: None}
    # default over maybe-missing: row 2 must get the default
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
    with pytest.raises(TypedFallback):
        transform_table(df, rule_d, mode="typed")
    got = {r["id"]: r["name"] for r in
           transform_table(df, rule_d, mode="auto")
           .select(F.to_json("id").cast("long").alias("id"),
                   F.to_json("name").alias("name")).collect()}
    assert got == {1: '"bob"', 2: '"anon"'}


def test_first_of_empty_then_strict_op_defers(spark):
    """first([]) is runtime-missing; piping it into concat must fall
    back (regression: typed raised 'must not be null' where the
    variant engine propagates missing)."""
    from rulemorph_spark.compiler.typed import TypedFallback
    df = spark.createDataFrame([(1, []), (2, ["a"])],
                               "id long, arr array<string>")
    rule = RULE % '"@input.arr", {first: []}, {concat: ["y"]}'
    with pytest.raises(TypedFallback):
        transform_table(df, rule, mode="typed")
    got = {r["id"]: r["out"] for r in
           transform_table(df, rule, mode="auto")
           .select(F.to_json("id").cast("long").alias("id"),
                   F.to_json("out").alias("out")).collect()}
    assert got == {1: None, 2: '"ay"'}


def test_pipe_op_arity_enforced(spark):
    """The typed path validates op arity exactly like the variant
    compiler (regression: 2-arg pipe `eq` was silently accepted)."""
    from rulemorph_spark.errors import RuleError
    df = _df(spark)
    rule = RULE % '{eq: ["@input.id", "@input.id"]}'
    for mode in ("typed", "variant"):
        with pytest.raises(RuleError, match="between 1 and 1"):
            transform_table(df, rule, mode=mode)
