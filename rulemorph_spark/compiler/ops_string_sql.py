"""SQL-function fast path for the string / stringify ops (round 9,
VERDICT r8 next-round #2 — extends the r8 arith/date mechanism).

Outside Catalyst lambda scopes, ``trim/lowercase/uppercase``,
``to_string``, ``concat``, ``split``, ``pad_start/pad_end``,
``replace``, ``to_base`` and ``round`` compile to ONE session SQL
function ``f(o0 VARIANT, …) RETURNS VARIANT`` (``sqlfn.py``) instead
of a construction-heavy Column tree: the call site costs O(1) py4j
round trips, the analyzer binds each argument once, and the optimizer
inlines the body.

Unlike the arith bodies (which sequence the per-operand protocol with
EAGER ``b.let`` transform-lambdas), these bodies are **lambda-free**:
they mirror ``ops_scalar.seq_strict`` textually — per operand, in
order, a missing short-circuit, the variant-null error, then a
zero-length CHECK PROBE of the operand's conversion
(``substring(<as_nullable(conv)>, 1, 0)`` — raises the conversion's
embedded errors without contributing bytes; the ``as_nullable`` wrap
is ``try_element_at(slice(array(x), 1, 1), 1)``, the exact Column twin
of ``variant.as_nullable``, so SimplifyConditionals cannot fold the
probe away).  Lambda-free bodies keep the final projection inside
whole-stage codegen (the r8 codegen audit's variant-path gap —
pinned in tests/test_string_sqlfn.py).

Textual duplication of the CONVERSIONS (probe + result references,
parts × serde-render chains) multiplied into 150 kB bodies that OOM'd
the ANTLR parser (the known 70 kB class), so the heavy conversions
live in shared HELPER session functions registered once per session
(``_ensure_helpers`` — a SQL UDF body may call other SQL UDFs): each
value reference inside a helper is a free PARAMETER reference, and op
bodies shrink to a few hundred bytes of helper calls while staying
lambda-free.  Error payloads (and the ``%%DBG%%`` prefix/suffix of
value-embedding messages) pass as call-site slot parameters; a NULL
payload renders the lenient (when-condition) typed NULL instead of
raising.

``round`` is the exception: its intermediates multiply through the
power/scale math, so it keeps arith-style ``b.let`` bindings (its
Column twin had lambdas too — round sites stay CodegenFallback).

The fast path engages only when NO argument carries pipe steps
(except ``round``, whose numeric-first protocol reuses the arith
``decided`` guard) — a step-bearing argument's embedded raises need
the Column path's absent-guard machinery; those shapes fall back
inline.  Cross-path parity is pinned branch-for-branch in
tests/test_string_sqlfn.py and by the three-way fuzzers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import variant as V
from .backend import SqlB
from .core import arg_path, cur_version, lenient_on
from .ops_arith_sql import _sql_is_number

_F64_EPS = 2.220446049250313e-16
_I64_MAX = 9223372036854775807


# --- serde / Rust render chains (helper-body internals) -----------------


def _typeof(b, v):
    return b.fn("schema_of_variant", v)


def _is_string(b, v):
    return b.eq(_typeof(b, v), b.lit("STRING"))


def _sql_serde_int_kind(b, v):
    """``variant._serde_int_kind``."""
    t = _typeof(b, v)
    d = b.try_cast(v, "decimal(38,0)")
    huge = b.and_(
        b.rlike(t, r"^DECIMAL\(\d+,0\)$"),
        b.and_(b.gt(d, b.cast(b.lit("9223372036854775807"),
                              "decimal(38,0)")),
               b.le(d, b.cast(b.lit("18446744073709551615"),
                              "decimal(38,0)"))))
    return b.or_(b.eq(t, b.lit("BIGINT")),
                 b.fn("coalesce", huge, "false"))


def _sci_probe_body(b, d):
    """Shortest round-tripping ``%.pE`` rendering of ``d`` (the
    16-candidate probe chain of ``variant._sci_efmt`` /
    ``_sci_positional``).

    r10: registered as its OWN helper function and handed to the two
    render helpers as a STRING parameter — SQL-UDF parameters are
    let-bound by the analyzer (one Project alias), so the probe chain
    appears ONCE per call site instead of being textually copied into
    every mantissa/exponent/digit reference of the renders.  That
    blowup made ``tostr1`` a 24.7 kB body whose ~2.9 s analysis was
    the longest link of the extended-anchor first-compile chain
    (VERDICT r9 #4); values are identical — each former textual copy
    evaluated the same deterministic expression the parameter now
    binds once."""
    pairs = []
    for p in range(0, 16):
        cand = b.fn("format_string", b.lit(f"%.{p}E"), d)
        pairs.append((b.eq(b.try_cast(cand, "double"), d), cand))
    return b.case(pairs, b.fn("format_string", b.lit("%.16E"), d))


def _sci_efmt_render_body(b, sci):
    """``variant._sci_efmt``'s render over an already-probed ``sci``."""
    mant = b.fn("regexp_extract", sci, b.lit(r"^(-?[^eE]+)"), "1")
    exp = b.fn("regexp_extract", sci, b.lit(r"[eE]([+-]?\d+)$"), "1")
    mant = b.fn("regexp_replace", mant, b.lit(r"\.0$"), b.lit(""))
    exp = b.fn("regexp_replace",
               b.fn("regexp_replace", exp, b.lit(r"^\+"), b.lit("")),
               b.lit(r"^(-?)0+(\d)"), b.lit(r"$1$2"))
    return b.concat(mant, b.lit("e"), exp)


def _sci_pos_render_body(b, sci, d):
    """``variant._sci_positional``'s render over a probed ``sci``."""
    zeros = "0" * 330
    sign = b.case(
        [(b.fn("startswith", b.cast(d, "string"), b.lit("-")),
          b.lit("-"))], b.lit(""))
    mant_int = b.fn("regexp_extract", sci, b.lit(r"^-?(\d+)"), "1")
    mant_frac = b.fn("regexp_extract", sci, b.lit(r"\.(\d+)[eE]"),
                     "1")
    exp = b.cast(b.fn("regexp_extract", sci,
                      b.lit(r"[eE]([+-]?\d+)$"), "1"), "int")
    digits = b.concat(mant_int, mant_frac)
    shift = b.op("-", exp, b.fn("length", mant_frac))
    big = b.concat(sign, digits,
                   b.fn("substring", b.lit(zeros), "1", shift))
    lead = b.op("-", b.op("-", "0", exp), b.fn("length", mant_int))
    tiny = b.concat(sign, b.lit("0."),
                    b.fn("substring", b.lit(zeros), "1", lead),
                    digits)
    return b.case([(b.ge(exp, "0"), big)], tiny)


def _sql_sci_efmt(b, d, H):
    """``variant._sci_efmt`` (ryu bare-``e`` scientific form) as two
    helper calls: render(probe(d))."""
    return b.fn(H["sciefr"], b.fn(H["sci"], d))


def _sql_sci_positional(b, d, H):
    """``variant._sci_positional`` (positional digit-shift expansion)
    as two helper calls: render(probe(d), d)."""
    return b.fn(H["sciposr"], b.fn(H["sci"], d), d)


def _sql_serde_float_text(b, s, d, H):
    """``variant.serde_float_text`` (serde/ryu float Display)."""
    has_e = b.rlike(s, "[eE]")
    plain_zone = b.and_(b.ge(b.fn("abs", d), b.lit(1e-4)),
                        b.lt(b.fn("abs", d), b.lit(1e16)))
    dec = b.fn("regexp_replace",
               b.cast(b.try_cast(d, "decimal(38,21)"), "string"),
               b.lit(r"(\.\d*?)0+$"), b.lit(r"$1"))
    dec = b.fn("regexp_replace", dec, b.lit(r"\.$"), b.lit(".0"))
    dec = b.case([(b.fn("contains", dec, b.lit(".")), dec)],
                 b.concat(dec, b.lit(".0")))
    return b.case(
        [(b.not_(has_e),
          b.case([(b.fn("contains", s, b.lit(".")), s)],
                 b.concat(s, b.lit(".0")))),
         (plain_zone, dec)],
        _sql_sci_efmt(b, d, H))


def _sql_serde_num_str(b, v, H):
    """``variant.serde_num_str`` (serde ``Number`` Display)."""
    flt = _sql_serde_float_text(b, b.try_cast(v, "string"),
                                b.try_cast(v, "double"), H)
    return b.case(
        [(_sql_serde_int_kind(b, v),
          b.cast(b.try_cast(v, "decimal(38,0)"), "string"))], flt)


def _sql_rust_f64_display(b, d, H):
    """``variant.rust_f64_display`` (Rust ``{}`` of a finite f64)."""
    s = b.cast(d, "string")
    dec = b.fn("regexp_replace",
               b.cast(b.try_cast(d, "decimal(38,21)"), "string"),
               b.lit(r"(\.\d*?)0+$"), b.lit(r"$1"))
    dec = b.fn("regexp_replace", dec, b.lit(r"\.$"), b.lit(""))
    neg_zero = b.and_(b.eq(d, b.lit(0.0)),
                      b.fn("startswith", s, b.lit("-")))
    integral = b.eq(b.fn("abs", b.op("%", d, b.lit(1.0))), b.lit(0.0))
    small_int = b.and_(integral,
                       b.lt(b.fn("abs", d), b.lit(9007199254740992.0)))
    return b.case(
        [(b.fn("isnan", d), b.lit("NaN")),
         (b.eq(d, b.lit(float("inf"))), b.lit("inf")),
         (b.eq(d, b.lit(float("-inf"))), b.lit("-inf")),
         (neg_zero, b.lit("-0")),
         (small_int, b.cast(b.try_cast(d, "long"), "string")),
         (b.and_(b.ge(b.fn("abs", d), b.lit(1e-3)),
                 b.lt(b.fn("abs", d), b.lit(1e16))), dec)],
        _sql_sci_positional(b, d, H))


# --- helper session functions -------------------------------------------


def _cond_err(e, t):
    """Raise the encoded payload in param ``e``; a NULL payload is the
    lenient typed NULL (``core.rerr``'s two modes, at runtime)."""
    return (f"(CASE WHEN {e} IS NULL THEN CAST(NULL AS {t}) "
            f"ELSE CAST(raise_error({e}) AS {t}) END)")


def _dbg(b, v):
    """``%%DBG:<hex-of-json>%%`` value marker (``variant.raise_err_got``)."""
    return b.concat(
        b.lit("%%DBG:"),
        b.fn("hex", b.fn("encode",
                         b.fn("coalesce", b.fn("to_json", v),
                              b.lit("null")),
                         b.lit("UTF-8"))),
        b.lit("%%"))


def _h_asstr1(b):
    """``ops_scalar._as_string`` (v1 ``value_as_string``)."""
    return b.case([(_is_string(b, "v"), b.try_cast("v", "string"))],
                  _cond_err("e", "STRING"))


def _h_tostr1(b, H):
    """``variant.to_string_strict`` (v1 ``value_to_string``)."""
    t = _typeof(b, "v")
    return b.case(
        [(b.isnull("v"), b.null("string")),
         (b.eq(t, b.lit("STRING")), b.try_cast("v", "string")),
         (b.eq(t, b.lit("BOOLEAN")), b.try_cast("v", "string")),
         (b.eq(t, b.lit("BIGINT")), b.try_cast("v", "string")),
         (b.and_(_sql_is_number(b, "v"), _sql_serde_int_kind(b, "v")),
          b.cast(b.try_cast("v", "decimal(38,0)"), "string")),
         (_sql_is_number(b, "v"),
          _sql_rust_f64_display(b, b.try_cast("v", "double"), H))],
        _cond_err("e", "STRING"))


def _h_asstr2(b, numstr_name):
    """``variant.as_string_v2`` (``eval_value_as_string``); the error
    arm renders ``expected string, got {:?}`` from the pre/suf payload
    parts around the value's debug marker."""
    t = _typeof(b, "v")
    err = (f"(CASE WHEN pre IS NULL THEN CAST(NULL AS STRING) ELSE "
           f"CAST(raise_error("
           f"{b.fn('concat', 'pre', _dbg(b, 'v'), 'suf')}) AS STRING) "
           f"END)")
    return b.case(
        [(b.isnull("v"), b.null("string")),
         (b.eq(t, b.lit("STRING")), b.try_cast("v", "string")),
         (b.eq(t, b.lit("BOOLEAN")), b.try_cast("v", "string")),
         (_sql_is_number(b, "v"), b.fn(numstr_name, "v"))],
        err)


def _h_asi64(b):
    """``ops_scalar._as_i64`` (``value_to_i64``, transform.rs:5819)."""
    t = _typeof(b, "v")
    d = b.try_cast("v", "double")
    s = b.try_cast("v", "string")
    parsed = b.case(
        [(b.rlike(s, r"^[+-]?[0-9]+$"), b.try_cast(s, "long"))],
        b.null("long"))
    i = b.fn("coalesce", b.try_cast(d, "long"),
             b.case([(b.gt(d, b.lit(0.0)),
                      b.cast(str(_I64_MAX), "long"))],
                    b.cast("(-9223372036854775807 - 1)", "long")))
    f_ok = b.and_(
        b.lt(b.fn("abs", b.op("%", d, b.lit(1.0))), b.lit(_F64_EPS)),
        b.lt(b.fn("abs", b.op("-", b.cast(i, "double"), d)),
             b.lit(_F64_EPS)))
    return b.case(
        [(b.eq(t, b.lit("BIGINT")), b.try_cast("v", "long")),
         (b.and_(_sql_is_number(b, "v"), f_ok), i),
         (b.and_(_is_string(b, "v"), b.isnotnull(parsed)), parsed)],
        _cond_err("e", "BIGINT"))


def _ensure_helpers():
    """Register the shared conversion helpers (idempotent per session);
    returns the tag→name map, or None when SQL UDFs are unavailable."""
    from . import sqlfn
    H = {}

    def reg(tag, params, returns, body):
        name = sqlfn.ensure_fn(params, returns, body, f"h{tag}")
        if name is not None:
            H[tag] = name
        return name

    b = SqlB(False)
    if reg("asstr1", "v VARIANT, e STRING", "STRING",
           _h_asstr1(b)) is None:
        return None
    # r10 (VERDICT r9 #4): the sci probe chain and its two renders are
    # standalone helpers — the probe result binds ONCE as a let-bound
    # STRING parameter instead of being textually duplicated into
    # every mantissa/exponent reference, collapsing tostr1/numstr from
    # ~25 kB bodies (the first-compile analysis wall) to ~2 kB ones.
    reg("sci", "d DOUBLE", "STRING", _sci_probe_body(b, "d"))
    reg("sciefr", "sci STRING", "STRING", _sci_efmt_render_body(b, "sci"))
    reg("sciposr", "sci STRING, d DOUBLE", "STRING",
        _sci_pos_render_body(b, "sci", "d"))
    reg("tostr1", "v VARIANT, e STRING", "STRING", _h_tostr1(b, H))
    reg("numstr", "v VARIANT", "STRING", _sql_serde_num_str(b, "v", H))
    reg("asstr2", "v VARIANT, pre STRING, suf STRING", "STRING",
        _h_asstr2(b, H["numstr"]))
    reg("asi64", "v VARIANT, e STRING", "BIGINT", _h_asi64(b))
    return H if len(H) == 8 else None


# --- conversion emitters (tiny helper calls) -----------------------------


def _err_slot(b, msg, path):
    from ..errors import encode_engine_error
    return b.slot(None if b.lenient
                  else encode_engine_error("expr_error", msg, path))


def _as_string(b, H, v, path):
    return b.fn(H["asstr1"], v,
                _err_slot(b, "value must be a string", path))


def _to_string_strict(b, H, v, path,
                      msg="value must be string/number/bool"):
    return b.fn(H["tostr1"], v, _err_slot(b, msg, path))


def _as_string_v2(b, H, v, path, prefix="expected string, got "):
    from ..errors import encode_engine_error_msg_parts
    if b.lenient:
        pre, suf = None, None
    else:
        pre, suf = encode_engine_error_msg_parts("expr_error", prefix,
                                                 path)
    return b.fn(H["asstr2"], v, b.slot(pre), b.slot(suf))


def _as_i64(b, H, v, path, msg):
    return b.fn(H["asi64"], v, _err_slot(b, msg, path))


# --- the seq_strict twin (lambda-free sequencing) -----------------------


def _probe(b, conv):
    """Zero-length check probe of a conversion — raises its embedded
    errors, contributes nothing (``ops_scalar._chk`` +
    ``variant.as_nullable``, textual)."""
    nullable = b.fn("try_element_at",
                    b.fn("slice", b.fn("array", conv), "1", "1"), "1")
    return b.fn("coalesce",
                b.fn("substring", b.cast(nullable, "string"), "1", "0"),
                b.lit(""))


_UNREACHABLE = "CAST(raise_error('unreachable probe') AS VARIANT)"


def _layers(b, names, paths, result, *, checks,
            null_msg="expr arg must not be null"):
    """``ops_scalar.seq_strict``, textual: per operand in order —
    missing short-circuits the op, variant-null errors at the
    operand's path, then the operand's conversion probe raises before
    anything later evaluates."""
    for i in reversed(range(len(names))):
        inner = result
        if checks[i] is not None:
            inner = b.case(
                [(b.ge(b.fn("length", _probe(b, checks[i])), "1"),
                  _UNREACHABLE)], inner)
        inner = b.case(
            [(b.fn("coalesce", b.fn("is_variant_null", names[i]),
                   "false"),
              b.err("expr_error", null_msg, paths[i], "variant"))],
            inner)
        result = b.case([(b.isnull(names[i]), b.null("variant"))], inner)
    return b.cast(result, "variant")


# --- op bodies ----------------------------------------------------------


def _body_unary_string(b, H, path, version, sql_fn_name):
    """``ops_scalar._unary_string`` (trim/lowercase/uppercase)."""
    p0 = arg_path(path, 0)
    if version >= 2:
        conv = _as_string_v2(b, H, "o0", p0)
        return _layers(b, ["o0"], [p0],
                       b.cast(b.fn(sql_fn_name, conv), "variant"),
                       checks=[None],
                       null_msg="expected string, got Null")
    conv = _as_string(b, H, "o0", p0)
    return _layers(b, ["o0"], [p0],
                   b.cast(b.fn(sql_fn_name, conv), "variant"),
                   checks=[None])


def _body_to_string(b, H, path, version):
    """``ops_scalar.op_to_string``."""
    if version >= 2:
        # v2-native to_string never errors
        t = _typeof(b, "o0")
        return b.cast(b.case(
            [(b.isnull("o0"), b.null("string")),
             (b.fn("coalesce", b.fn("is_variant_null", "o0"), "false"),
              b.lit("null")),
             (b.or_(b.fn("startswith", t, b.lit("ARRAY")),
                    b.fn("startswith", t, b.lit("STRUCT"))),
              b.fn("to_json", "o0")),
             (_sql_is_number(b, "o0"), b.fn(H["numstr"], "o0"))],
            b.try_cast("o0", "string")), "variant")
    conv = _to_string_strict(b, H, "o0", arg_path(path, 0))
    return _layers(b, ["o0"], [arg_path(path, 0)],
                   b.cast(conv, "variant"), checks=[None])


def _body_concat(b, H, path, version, n, safe):
    """``ops_scalar.op_concat`` (positional per-arg stringify)."""
    names = [f"o{i}" for i in range(n)]
    paths = [arg_path(path, i) for i in range(n)]
    if version >= 2:
        parts = [_as_string_v2(b, H, o, paths[i])
                 for i, o in enumerate(names)]
        return _layers(b, names, paths,
                       b.cast(b.concat(*parts), "variant"),
                       checks=[None if safe[i] else parts[i]
                               for i in range(n)],
                       null_msg="expected string, got Null")
    parts = [_to_string_strict(b, H, o, paths[i])
             for i, o in enumerate(names)]
    return _layers(b, names, paths,
                   b.cast(b.concat(*parts), "variant"),
                   checks=[None if safe[i] else parts[i]
                           for i in range(n)],
                   null_msg="concat does not accept null")


def _body_split(b, H, path):
    """``ops_scalar.op_split`` (literal delim, keeps empties)."""
    p0, p1 = arg_path(path, 0), arg_path(path, 1)
    value = _as_string(b, H, "o0", p0)
    delim = _as_string(b, H, "o1", p1)
    delim_checked = b.case(
        [(b.eq(delim, b.lit("")),
          b.err("expr_error", "split delimiter must not be empty", p1,
                "string"))], delim)
    escaped = b.fn("regexp_replace", delim_checked,
                   b.lit(r"([\\.\[\]\{\}\(\)\*\+\?\^\$\|])"),
                   b.lit(r"\\$1"))
    parts = b.fn("split", value, escaped, "-1")
    return _layers(b, ["o0", "o1"], [p0, p1],
                   b.cast(parts, "variant"),
                   checks=[value, delim_checked])


def _body_pad(b, H, path, n, start):
    """``ops_scalar._pad``."""
    p0, p1, p2 = (arg_path(path, i) for i in range(3))
    value = _as_string(b, H, "o0", p0)
    length = _as_i64(b, H, "o1", p1,
                     "pad length must be a non-negative integer")
    length = b.case(
        [(b.lt(length, "0"),
          b.err("expr_error", "pad length must be a non-negative "
                "integer", p1, "long"))], length)
    pad = _as_string(b, H, "o2", p2) if n == 3 else b.lit(" ")
    fn = "lpad" if start else "rpad"
    padded = b.fn(fn, value, b.cast(length, "int"), pad)
    result = b.case(
        [(b.or_(b.ge(b.fn("length", value), length),
                b.eq(pad, b.lit(""))), value)], padded)
    names = ["o0", "o1"] + (["o2"] if n == 3 else [])
    paths = [p0, p1] + ([p2] if n == 3 else [])
    checks = [value, length] + ([pad] if n == 3 else [])
    return _layers(b, names, paths, b.cast(result, "variant"),
                   checks=checks)


def _body_replace(b, H, path, n):
    """``ops_scalar.op_replace`` (4 modes incl. literal-first)."""
    p = [arg_path(path, i) for i in range(4)]
    value = _as_string(b, H, "o0", p[0])
    pattern = _as_string(b, H, "o1", p[1])
    replacement = _as_string(b, H, "o2", p[2])
    mode = (_as_string(b, H, "o3", p[3]) if n == 4
            else b.lit("__first__"))

    # _replace_literal_first
    pos = b.fn("instr", value, pattern)
    lit_first = b.case(
        [(b.eq(pattern, b.lit("")), b.concat(replacement, value)),
         (b.eq(pos, "0"), value)],
        b.concat(
            b.fn("substring", value, "1", b.op("-", pos, "1")),
            replacement,
            b.fn("substring", value,
                 b.op("+", pos, b.fn("length", pattern)),
                 b.fn("length", value))))
    lit_all = b.fn("replace", value, pattern, replacement)
    # _replace_regex_first
    rpos = b.fn("regexp_instr", value, pattern)
    matched = b.fn("regexp_extract", value, pattern, "0")
    head = b.fn("substring", value, "1", b.op("-", rpos, "1"))
    tail = b.fn("substring", value,
                b.op("+", rpos, b.fn("length", matched)),
                b.fn("length", value))
    replaced = b.fn("regexp_replace", matched, pattern, replacement)
    rx_first = b.case([(b.eq(rpos, "0"), value)],
                      b.concat(head, replaced, tail))
    rx_all = b.fn("regexp_replace", value, pattern, replacement)

    result = b.case(
        [(b.eq(mode, b.lit("__first__")), lit_first),
         (b.eq(mode, b.lit("all")), lit_all),
         (b.eq(mode, b.lit("regex")), rx_first),
         (b.eq(mode, b.lit("regex_all")), rx_all)],
        b.err("expr_error", "replace mode must be all|regex|regex_all",
              p[3], "string"))
    names = [f"o{i}" for i in range(n)]
    checks = [value, pattern, replacement] + ([mode] if n == 4 else [])
    return _layers(b, names, p[:n], b.cast(result, "variant"),
                   checks=checks)


def _body_to_base(b, H, path):
    """``ops_scalar.op_to_base`` (int → base-2..36, lowercase)."""
    p0, p1 = arg_path(path, 0), arg_path(path, 1)
    number = _as_i64(b, H, "o0", p0, "value must be an integer")
    base = _as_i64(b, H, "o1", p1, "base must be an integer")
    base = b.case(
        [(b.or_(b.lt(base, "2"), b.gt(base, "36")),
          b.err("expr_error", "base must be between 2 and 36", p1,
                "long"))], base)
    digits = b.fn("lower",
                  b.fn("conv", b.cast(b.fn("abs", number), "string"),
                       "10", b.cast(base, "int")))
    result = b.case([(b.lt(number, "0"),
                      b.concat(b.lit("-"), digits))], digits)
    return _layers(b, ["o0", "o1"], [p0, p1],
                   b.cast(result, "variant"),
                   checks=[number, base])


def _body_round(b, H, path, n):
    """``ops_scalar.op_round`` (half-away-from-zero, optional scale);
    round is v1-delegated even from v2 pipes, so conversions are the
    v1 ones in both versions."""
    from .ops_arith_sql import _sql_num_to_variant, _sql_to_number_strict
    p0, p1 = arg_path(path, 0), arg_path(path, 1)
    number = _sql_to_number_strict(b, "o0", p0,
                                   "operand must be a number")
    if n == 2:
        scale = _as_i64(b, H, "o1", p1,
                        "scale must be a non-negative integer")
        scale = b.case(
            [(b.lt(scale, "0"),
              b.err("expr_error", "scale must be a non-negative "
                    "integer", p1, "long")),
             (b.gt(scale, "308"),
              b.err("expr_error", "scale is too large", p1, "long"))],
            scale)
    else:
        scale = b.cast("0", "long")

    def with_scaled(num_v, factor_v, scaled):
        rounded = b.case(
            [(b.ge(b.fn("abs", scaled), b.lit(9007199254740992.0)),
              scaled)],
            b.cast(b.case(
                [(b.ge(scaled, "0"),
                  b.fn("floor", b.op("+", scaled, b.lit(0.5))))],
                b.fn("ceil", b.op("-", scaled, b.lit(0.5)))), "double"))
        return _sql_num_to_variant(b, b.op("/", rounded, factor_v))

    result = b.let(number, lambda num_v: b.let(
        b.fn("pow", b.lit(10.0), b.cast(scale, "double")),
        lambda factor_v: b.let(b.op("*", num_v, factor_v),
                               lambda s: with_scaled(num_v, factor_v,
                                                     s))))
    names = ["o0"] + (["o1"] if n == 2 else [])
    paths = [p0] + ([p1] if n == 2 else [])
    # number's conversion error fires BEFORE the scale's null/int
    # checks (eval_round, transform.rs:2437-2476)
    checks = [number] + ([scale] if n == 2 else [])
    return _layers(b, names, paths, b.cast(result, "variant"),
                   checks=checks)


_BODIES = {
    "trim": lambda b, H, path, version, args: _body_unary_string(
        b, H, path, version, "trim"),
    "lowercase": lambda b, H, path, version, args: _body_unary_string(
        b, H, path, version, "lower"),
    "uppercase": lambda b, H, path, version, args: _body_unary_string(
        b, H, path, version, "upper"),
    "to_string": lambda b, H, path, version, args: _body_to_string(
        b, H, path, version),
    "split": lambda b, H, path, version, args: _body_split(b, H, path),
    "pad_start": lambda b, H, path, version, args: _body_pad(
        b, H, path, 1 + len(args), True),
    "pad_end": lambda b, H, path, version, args: _body_pad(
        b, H, path, 1 + len(args), False),
    "replace": lambda b, H, path, version, args: _body_replace(
        b, H, path, 1 + len(args)),
    "to_base": lambda b, H, path, version, args: _body_to_base(
        b, H, path),
    "round": lambda b, H, path, version, args: _body_round(
        b, H, path, 1 + len(args)),
}

# ops whose numeric first operand lets the arith ``decided`` guard
# cover step-bearing later args (round's scale arg; the reference
# converts operand 0 before evaluating arg 1 — eval_round,
# transform.rs:2437-2476)
_NUMERIC_GUARDED = {"round"}


def string_sqlfn(op: str, scope, cur, args, path, *, safe=None):
    """The fast path for ``op``; None → caller builds the Column tree
    inline (lambda scope, SQL UDFs unavailable, or a step-bearing
    argument needing the Column path's absent-guard machinery)."""
    from . import sqlfn
    from .core import in_flat_rule
    from .ops_scalar import _operands
    if not in_flat_rule():
        # composed rules (steps / record_when / mapping gates): the
        # optimizer multiplies inlined bodies through the @out-chaining
        # projections (see core.flat_rule) — keep the Column path there
        return None
    has_steps = any(a.steps for a in args)
    if V.lambda_depth() > 0 or V.dyn_marker_depth() > 0 \
            or not sqlfn.available() \
            or (has_steps and op not in _NUMERIC_GUARDED):
        return None
    H = _ensure_helpers()
    if H is None:
        return None
    version = cur_version()
    b = SqlB(lenient_on())
    if op == "concat":
        n = 1 + len(args)
        safe = safe or ([False] * n)
        # every NON-literal part inlines the stringify helper twice
        # (check probe + result); the optimizer's tree copies grow
        # multiplicatively with parts (a 16-part numeric concat OOM'd
        # a 2g driver, and even 4 heavy v1 parts cost ~6 s of optimizer
        # churn — the v1 tostr1 helper carries the full ryu probe
        # chain).  Heavy-part-rich concats keep the Column path, whose
        # V.let bindings share each conversion subtree once.  The
        # common literal-rich shapes (the t13 anchor) stay here.
        heavy = sum(1 for s in safe if not s)
        if heavy > (2 if version < 2 else 4):
            return None
        body = _body_concat(b, H, path, version, n, safe)
    else:
        body = _BODIES[op](b, H, path, version, args)
    cols = _operands(scope, cur, args, path)
    params = ", ".join(f"o{i} VARIANT" for i in range(len(cols)))
    if b.slots:
        params += ", " + b.slot_params()
    name = sqlfn.ensure_fn(params, "VARIANT", body, "st")
    if name is None:
        return None
    guarded = list(cols)
    if has_steps:
        # numeric-first ops: a step-bearing later arg's embedded raises
        # must not evaluate on rows operand 0 already decides
        # (missing / null / conversion error) — same machinery as
        # ops_arith_sql.arith_sqlfn; round is v1-delegated so the v1
        # finite rule applies
        from .ops_scalar import arith_decided
        for h in (i for i, a in enumerate(args, start=1) if a.steps):
            pre = arith_decided(cols[0], 1)
            for j in range(1, h):
                pre = pre | arith_decided(cols[j], 1)
            guarded[h] = F.when(~pre, cols[h])
    return sqlfn.call(name, *guarded, *b.slot_args())
