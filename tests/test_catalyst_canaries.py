"""Canaries for the three Catalyst rewrites that can legally DELETE or
re-order error-bearing subexpressions (VERDICT r6 next-round #3).

The engines defend against each with specific machinery (``_force``
collapse-proof probes, ``fold_anchor``-anchored raises, if-condition
forcing).  Each canary pair asserts BOTH directions:

- the RAW (unguarded) shape still mis-optimizes on the current Spark —
  proving the hazard is real and the guard is load-bearing;
- the GUARDED shape survives optimization with its raise intact.

If a Spark upgrade changes an optimizer rule, a canary flips instead of
the hazard silently re-opening (or a guard silently becoming dead
weight).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rulemorph_spark.compiler.typed import (TVal, _chk, _force, _probe0,
                                            anchor_probe, fold_anchor,
                                            _terr)
from pyspark.sql import types as T


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame([(1, 5)], "id long, x long")


# --- hazard 1: SimplifyConditionals collapses identical branches,
# deleting the (raising) condition ----------------------------------------

def test_identical_branch_collapse_reproduces_raw(base):
    """``If(c, k, k) → k`` (SimplifyConditionals): the raw CASE loses
    the condition — and the raise inside it."""
    cond = F.raise_error(F.lit("boom")).cast("boolean")
    raw = base.select(F.when(cond, F.lit("k")).otherwise(F.lit("k"))
                      .alias("out"))
    assert "raise_error" not in _optimized(raw), \
        "SimplifyConditionals no longer collapses identical branches " \
        "— the typed if-condition _force guard may be removable"


def test_identical_branch_collapse_guarded_survives(base):
    """``_force(_chk(c), col)``: the unreachable-raise then-branch keeps
    the branches distinct, so the condition (and its raise) survives."""
    cond = F.raise_error(F.concat(F.lit("boom"), F.col("x").cast("string"))
                         ).cast("boolean")
    c = F.coalesce(cond, F.lit(False))
    col = F.when(c, F.lit("k")).otherwise(F.lit("k"))
    guarded = base.select(_force(_chk(c), col).alias("out"))
    assert "raise_error" in _optimized(guarded)


# --- hazard 2: ConstantFolding deletes/evaluates foldable probes and
# raises (an all-constant pipe loses its error ordering) -------------------

def test_literal_raise_survives_constant_folding(base):
    """GROUND-TRUTH PIN: on this Spark, ``raise_error`` over a pure
    literal is NOT constant-folded — a probe of a literal raise
    survives optimization intact, so the ordered-CASE machinery works
    on all-constant pipes even without the fold anchor.  If a Spark
    upgrade makes raises foldable (evaluating or deleting them at plan
    time), this flips and the ``fold_anchor`` machinery becomes
    LOAD-BEARING rather than defense-in-depth — do not remove the
    anchor while this pin exists."""
    lit_raise = F.raise_error(F.lit("boom")).cast("string")
    probe = F.coalesce(F.substring(lit_raise, 1, 0), F.lit(""))
    raw = base.select(
        F.when(F.length(probe) >= 1,
               F.raise_error(F.lit("unreachable"))).otherwise(F.lit("v"))
        .alias("out"))
    assert "boom" in _optimized(raw)


def test_constant_raise_anchored_survives(base):
    """The anchored raise (real-column probe in the message) is
    non-foldable BY CONSTRUCTION — this must hold on every Spark, so
    the anchor keeps constant errors in-plan even if the pin above
    flips on an upgrade."""
    probe = anchor_probe(F.col("x"), T.LongType())
    with fold_anchor(probe):
        anchored = _terr(T.StringType(), "expr_error", "boom", "p")
    chk = F.coalesce(F.substring(anchored, 1, 0), F.lit(""))
    guarded = base.select(
        F.when(F.length(chk) >= 1,
               F.raise_error(F.lit("unreachable"))).otherwise(F.lit("v"))
        .alias("out"))
    plan = _optimized(guarded)   # optimizes WITHOUT throwing
    assert "raise_error" in plan and "x#" in plan


# --- hazard 3: IsNull over a statically non-nullable CASE folds to
# false, deleting the null guard that forced operand evaluation ------------

def test_isnull_nonnullable_folds_raw(base):
    """``IsNull(coalesce(x, lit))`` → false (NullPropagation): a null
    guard over a non-nullable operand vanishes, and with it the only
    reference to an error-bearing subtree."""
    op = F.coalesce(F.col("x"), F.lit(1))
    raw = base.select(
        F.when(F.isnull(op),
               F.raise_error(F.lit("boom")).cast("long"))
        .otherwise(F.lit(2)).alias("out"))
    assert "raise_error" not in _optimized(raw), \
        "IsNull(non-nullable) no longer folds — _seq's _probe0 " \
        "forcing may be removable"


def test_isnull_fold_guarded_by_probe0(base):
    """``_seq`` forces an errs-carrying operand with ``_probe0`` wrapped
    via ``_force`` — the operand reference survives even when its
    isNull guard folds away."""
    err_op = TVal(
        F.when(F.col("x") > 3,
               F.raise_error(F.concat(F.lit("boom"),
                                      F.col("x").cast("string"))
                             ).cast("long")).otherwise(F.col("x")),
        T.LongType())
    value_path = F.lit(2)  # operand dropped from the value entirely
    guarded = base.select(_force(_probe0(err_op), value_path).alias("out"))
    assert "raise_error" in _optimized(guarded)


# --- end-to-end canary: the exact r6 "constant-fold residual" shape ------

def test_constant_pipe_error_order_end_to_end(spark):
    """The full rule-level regression for the fold residual: an
    all-constant pipe whose structurally-different if branches fold to
    the same constant must still surface the EARLIER step's error, in
    both engines (pinned via tests/test_pipe_fuzz_threeway.py R7_PINS
    as well; this copy documents the optimizer linkage)."""
    import json
    from rulemorph_spark.engine import transform
    from rulemorph_spark.errors import TransformEngineError
    rule = """
version: 2
input: {format: json}
mappings:
  - target: out
    expr: [{a: 1}, {concat: [null]}, {if: {cond: {gt: ["$", 1]},
           then: [1], else: [0, {add: [1]}]}}, {add: [1]}]
"""
    with pytest.raises(TransformEngineError) as ei:
        transform(spark, rule, input_text=json.dumps([{"id": 1}]))
    assert ei.value.message == \
        'expected string, got Object {"a": Number(1)}'


# --- hazard 4 (round 7): SimplifyArithmetic / substring folding over
# NON-NULLABLE columns deletes zero-length probes -------------------------

def test_nonnullable_probe_folds_raw(base):
    """INTEGER ``a * 0 → 0`` folds when ``a`` is deterministic and
    NON-nullable (SPARK-33847 SimplifyArithmetic; doubles keep the
    multiply for NaN semantics) — a ``_probe0``-style probe of a
    coalesce-with-literal LONG column vanishes, raise included."""
    err = F.raise_error(F.concat(F.lit("boom"),
                                 F.col("x").cast("string"))).cast("long")
    nonnull = F.coalesce(err, F.lit(7))          # non-nullable long
    raw_probe = F.substring((nonnull * 0).cast("string"), 1, 0)
    raw = base.select(F.concat(F.lit("m"), raw_probe).alias("out"))
    assert "raise_error" not in _optimized(raw), \
        "nonnullable-long * 0 no longer folds — V.as_nullable may be " \
        "removable"


def test_nonnullable_probe_guarded_survives(base):
    """``V.as_nullable`` (try_element_at over slice(array(..)))
    restores nullability without a simplification rule, so the probe
    — and the raise it forces — survives optimization."""
    from rulemorph_spark.compiler import variant as V
    err = F.raise_error(F.concat(F.lit("boom"),
                                 F.col("x").cast("string"))).cast("long")
    nonnull = F.coalesce(err, F.lit(7))
    probe = F.substring((V.as_nullable(nonnull) * 0).cast("string"), 1, 0)
    guarded = base.select(F.concat(F.lit("m"), probe).alias("out"))
    assert "boom" in _optimized(guarded)


def test_fold_residual_nonnullable_end_to_end(spark):
    """int("x") → coalesce(…, 7) → divide(0): the int-cast raise rides
    a NON-nullable coalesce output; the ÷0 constant raise must not win
    (r7 fuzz; fixed by routing every probe through V.as_nullable)."""
    import json
    from rulemorph_spark.engine import transform
    from rulemorph_spark.errors import TransformEngineError
    rule = (
        "version: 2\n"
        "input: {format: json}\n"
        "mappings:\n"
        "  - target: out\n"
        "    expr: [\"lit:x\", {int: []}, {coalesce: [7]}, {divide: [0]}]\n")
    with pytest.raises(TransformEngineError) as ei:
        transform(spark, rule, input_text=json.dumps([{"id": 1}]))
    assert ei.value.message == "failed to cast to int"
    assert ei.value.path == "mappings[0].expr[1]"
