"""SQL-function fast path for the arithmetic ops (``+ - * /``).

``_numeric_fold``'s build (per-operand number conversion, positional
check probes, the fold, finiteness, v1 integral re-emission, the
missing/null protocol weave) costs ~0.2-0.6 s of py4j round trips per
op instance.  Outside Catalyst lambda scopes the whole op compiles
instead to ONE session SQL function ``f(o0 VARIANT, …) RETURNS
VARIANT`` (``sqlfn.py``) whose body is the SQL rendering of exactly
the same construction — the text mirrors ``variant.to_number_strict``
/ ``as_number_v2`` / ``num_to_variant`` and ``ops_scalar.seq_strict``
/ ``_chk`` clause for clause (each cites its Column twin), is
lambda-free (text duplication instead of ``V.let``; codegen's
subexpression elimination dedupes it at runtime, and the lambda-free
body keeps whole-stage codegen), and is validated against the Column
path by the three-way fuzzers plus a direct cross-path parity test
(tests/test_sqlfn.py).

Argument-evaluation order note: SQL-function arguments bind EAGERLY
(left-to-right) in the analyzer's injected Project — which is the
reference's own order (v1 ``op_add`` evaluates every arg expression
before converting any, so an arg-expression error fires before a
later conversion error).  The one divergence hazard — a raising
step-bearing arg evaluating on rows where an EARLIER operand already
decides the op (missing short-circuit, null error, or a CONVERSION
error whose message must win) — is closed at the call site by
guarding each heavy arg on ``ops_scalar.arith_decided`` of every
earlier operand (r6 fuzz class: ``concat(missing, ÷0-chain)`` must be
missing; ADVICE r8 #4 extended the predicate from missing/null to
conversion failures).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import variant as V
from .backend import SqlB
from .core import arg_path, lenient_on

_LONG_MAX = 9223372036854775807


def _sql_is_number(b, v):
    """``variant.is_number``."""
    t = b.fn("schema_of_variant", v)
    return b.or_(b.isin(t, "BIGINT", "DOUBLE"),
                 b.fn("startswith", t, b.lit("DECIMAL")))


def _sql_rust_f64_parse(b, s):
    """``variant.rust_f64_parse``."""
    low = b.fn("lower", s)
    special = b.case(
        [(b.isin(low, "inf", "infinity", "+inf", "+infinity"),
          b.lit(float("inf"))),
         (b.isin(low, "-inf", "-infinity"), b.lit(float("-inf"))),
         (b.isin(low, "nan", "+nan", "-nan"), b.lit(float("nan")))],
        b.null("double"))
    return b.case([(b.rlike(s, V.RUST_F64_NUM_RE), b.try_cast(s, "double"))],
                  special)


def _sql_to_number_strict(b, v, path, msg):
    """``variant.to_number_strict`` (v1 ``value_to_number``)."""
    err = b.err("expr_error", msg, path, "double")
    parsed = _sql_rust_f64_parse(b, b.try_cast(v, "string"))
    finite = b.and_(
        b.isnotnull(parsed),
        b.and_(b.not_(b.fn("isnan", parsed)),
               b.ne(b.fn("abs", parsed), b.lit(float("inf")))))
    return b.case(
        [(b.isnull(v), b.null("double")),
         (_sql_is_number(b, v), b.try_cast(v, "double")),
         (b.eq(b.fn("schema_of_variant", v), b.lit("STRING")),
          b.case([(finite, parsed)], err))],
        err)


def _sql_err_got(b, kind, prefix, v, path, t):
    """``variant.raise_err_got`` — message embeds the value's Debug
    rendering via the ``%%DBG:<hex-of-json>%%`` marker."""
    from ..errors import encode_engine_error_msg_parts
    if b.lenient:
        return b.null(t)
    pre, suf = encode_engine_error_msg_parts(kind, prefix, path)
    dbg = b.concat(
        b.lit("%%DBG:"),
        b.fn("hex", b.fn("encode",
                         b.fn("coalesce", b.fn("to_json", v),
                              b.lit("null")),
                         b.lit("UTF-8"))),
        b.lit("%%"))
    return b.err_raw([b.slot(pre), dbg, b.slot(suf)], t)


def _sql_as_number_v2(b, v, path, prefix="expected number, got "):
    """``variant.as_number_v2`` (``eval_value_as_number``)."""
    parsed = _sql_rust_f64_parse(b, b.try_cast(v, "string"))
    return b.case(
        [(b.isnull(v), b.null("double")),
         (_sql_is_number(b, v), b.try_cast(v, "double")),
         (b.eq(b.fn("schema_of_variant", v), b.lit("STRING")),
          b.case([(b.isnotnull(parsed), parsed)],
                 b.err("expr_error", "failed to parse string as number",
                       path, "double")))],
        _sql_err_got(b, "expr_error", prefix, v, path, "double"))


def _sql_num_to_variant(b, d):
    """``variant.num_to_variant`` (v1 integral re-emission)."""
    return b.case(
        [(b.isnull(d), b.null("variant")),
         (b.and_(b.eq(d, b.fn("floor", d)),
                 b.le(b.fn("abs", d), b.lit(float(_LONG_MAX) / 2))),
          b.cast(b.cast(d, "long"), "variant"))],
        b.cast(d, "variant"))


def _arith_body(b, op: str, version: int, n: int, path) -> str:
    """The full op body over parameters ``o0..o{n-1}`` — the SQL twin
    of ``ops_scalar._numeric_fold.build`` + ``seq_strict``.

    Instead of the Column path's zero-length check probes (which exist
    only because separately-woven Columns can't sequence), the body
    LAYERS the reference's per-arg protocol directly: for each operand
    in order — missing short-circuits the op, null errors, then the
    conversion binds through an EAGERLY-evaluated let (the transform's
    array argument evaluates before the body), so a conversion error
    for arg i fires before arg i+1's missing check exactly like the
    reference loop (v2_eval.rs:1848-1928; op_concat
    transform.rs:1403-1432).  Each conversion appears ONCE and
    evaluates once."""
    o = [f"o{i}" for i in range(n)]
    null_msg = ("expected number, got Null" if version >= 2
                else "expr arg must not be null")

    def conv(i):
        if version >= 2:
            c = _sql_as_number_v2(b, o[i], arg_path(path, i))
            if op == "/" and i >= 1:
                # per-divisor zero check at the divisor's arg path,
                # when that arg is reached (v2_eval.rs:1919-1925)
                c = b.let(c, lambda v: b.case(
                    [(b.eq(v, b.lit(0.0)),
                      b.err("expr_error", "division by zero",
                            arg_path(path, i), "double"))], v))
            return c
        return _sql_to_number_strict(b, o[i], arg_path(path, i),
                                     "operand must be a number")

    def result(nums):
        acc = nums[0]
        for i in range(1, n):
            acc = b.op(op, acc, nums[i])
        if version >= 2:
            # v2-native arithmetic: f64, no int re-emission — but
            # serde_json's Number::from_f64 of a NON-FINITE value is
            # None, so the reference emits JSON NULL for overflow/inf
            # results (round-8 double fuzz)
            return b.case(
                [(b.or_(b.fn("isnan", acc),
                        b.eq(b.fn("abs", acc), b.lit(float("inf")))),
                  b.fn("parse_json", b.lit("null")))],
                b.cast(acc, "variant"))
        if op == "/":
            # IEEE: x/0 → ±inf in Rust; Spark double /0 → NULL
            acc = b.case(
                [(b.eq(nums[1], b.lit(0.0)),
                  b.op("*", b.lit(float("inf")),
                       b.fn("signum", nums[0])))],
                acc)
        finite = b.not_(b.or_(b.fn("isnan", acc),
                              b.eq(b.fn("abs", acc),
                                   b.lit(float("inf")))))
        return b.case(
            [(finite, _sql_num_to_variant(b, acc))],
            b.err("expr_error", "number result is not finite", path,
                  "variant"))

    def layer(i, nums):
        if i == n:
            return result(nums)
        return b.case(
            [(b.isnull(o[i]), b.null("variant")),
             (b.fn("coalesce", b.fn("is_variant_null", o[i]), "false"),
              b.err("expr_error", null_msg, arg_path(path, i),
                    "variant"))],
            b.let(conv(i), lambda v: layer(i + 1, nums + [v])))

    return b.cast(layer(0, []), "variant")


def arith_sqlfn(scope, cur, args, path, op: str, version: int):
    """The fast path; None → caller builds the Column tree inline."""
    from . import sqlfn
    from .ops_scalar import _operands
    if V.lambda_depth() > 0 or V.dyn_marker_depth() > 0 \
            or not sqlfn.available():
        return None
    b = SqlB(lenient_on())
    cols = _operands(scope, cur, args, path)
    body = _arith_body(b, op, version, len(cols), path)
    params = ", ".join(f"o{i} VARIANT" for i in range(len(cols)))
    if b.slots:
        params += ", " + b.slot_params()
    name = sqlfn.ensure_fn(params, "VARIANT", body, "ar")
    if name is None:
        return None
    # absent-guard for step-bearing args (see module doc): a heavy
    # arg's embedded raises must not evaluate on rows an earlier
    # operand already DECIDES — missing short-circuit, null error, or
    # a conversion error (bool/container/unparseable string), whose
    # error must fire first per the reference's per-operand order
    # (ADVICE r8 #4)
    from .ops_scalar import arith_decided
    guarded = list(cols)
    for h in (i for i, a in enumerate(args, start=1) if a.steps):
        pre = arith_decided(cols[0], version)
        for j in range(1, h):
            pre = pre | arith_decided(cols[j], version)
        guarded[h] = F.when(~pre, cols[h])
    return sqlfn.call(name, *guarded, *b.slot_args())
