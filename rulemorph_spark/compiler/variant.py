"""Variant-column helpers: the engine's dynamic value representation.

Every rule-expression value compiles to ONE Spark ``VariantType`` Column
with the convention:

- **SQL NULL**  = the reference's ``missing`` (path absent)
- **variant null** = JSON ``null`` (present and null)

This natively carries the reference's tri-state
(``crates/rulemorph/src/v2_eval.rs:25-49``; spec ``rules_spec_en.md:426-430``)
through arbitrary Spark expressions: ``F.coalesce`` skips missing,
higher-order functions propagate it, and ``to_json(struct(...))`` drops
missing keys from output objects while keeping explicit nulls.
"""

from __future__ import annotations

import json as _json
import threading
from contextlib import contextmanager

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import encode_engine_error

VT = "variant"
ARR_T = "array<variant>"
MAP_T = "map<string,variant>"

# --- compile-time Column cache (round 7, VERDICT r6 #4) --------------------
# Every pyspark Column construction is one-or-more py4j ROUND TRIPS;
# profiling the t13 extended-rule compile showed ~40% of its wall time
# in socket round trips, with ~850 of ~1040 literal constructions
# being duplicates (lit(None)/lit(0)/lit("")/identical encoded error
# strings).  Columns are immutable expression handles, so identical
# ones are safely shared within one JVM; the cache keys on the active
# SparkContext id so a restarted context never serves stale handles.

_COL_CACHE: dict = {}


def _ctx_key():
    from pyspark import SparkContext
    sc = SparkContext._active_spark_context
    return id(sc) if sc is not None else None


def cached_col(tag: str, key, build) -> Column:
    """Memoize an immutable Column under (context, tag, key)."""
    k = (_ctx_key(), tag, key)
    col = _COL_CACHE.get(k)
    if col is None:
        col = _COL_CACHE[k] = build()
    return col


def clit(v) -> Column:
    """Cached ``F.lit`` for immutable scalars."""
    return cached_col("lit", (type(v).__name__, v), lambda: F.lit(v))


def missing() -> Column:
    return cached_col("missing", None, lambda: F.lit(None).cast(VT))


def vnull() -> Column:
    return cached_col("vnull", None,
                      lambda: F.parse_json(F.lit("null")))


def lit_variant(py_value) -> Column:
    """Compile-time JSON literal → variant Column."""
    return F.parse_json(F.lit(_json.dumps(py_value)))


# --- per-item dynamic path markers (map STEP; r7 path parity) -----------
#
# The reference's ``{map: [steps...]}`` attributes per-item errors to
# ``{step}[{item_index}].step[{k}]`` (eval_v2_map_step) — the item index
# is runtime data.  Bodies compile with a MARKER in the path string
# (``@@I{depth}@@``); every raise built inside the registered context
# splices the item-index Column in place of the marker.

_dynpath_state = threading.local()


@contextmanager
def dyn_path_marker(marker: str, idx: Column):
    stack = getattr(_dynpath_state, "stack", None)
    if stack is None:
        stack = _dynpath_state.stack = []
    stack.append((marker, idx))
    try:
        yield
    finally:
        stack.pop()


def dyn_marker_depth() -> int:
    return len(getattr(_dynpath_state, "stack", []))


def splice_markers(s: str) -> "list[Column] | None":
    """None when ``s`` carries no registered marker; else the Columns
    rendering ``s`` with each marker replaced by ``[{idx}]``."""
    stack = getattr(_dynpath_state, "stack", None)
    if not stack or not any(m in s for m, _ in stack):
        return None

    def build(part: str) -> list[Column]:
        for m, c in stack:
            i = part.find(m)
            if i >= 0:
                return (build(part[:i])
                        + [F.lit("["), c.cast("string"), F.lit("]")]
                        + build(part[i + len(m):]))
        return [F.lit(part)] if part else []

    return build(s)


# --- dot-path grammar as an in-plan DFA (path.rs:28-166) -----------------
#
# For DYNAMIC (per-row) path strings: classify parse failures with the
# reference's EXACT scan order (round 8, VERDICT r7 #5 — the previous
# regex classes only approximated it).  The reference parser is a
# character scan; ``aggregate`` over the key's characters runs the
# same automaton JVM-side.  States:
#
#   0 SEG    expecting a segment (start / after '.')
#   1 BARE   inside a bare key (']' is a plain char here)
#   2 POST   after a completed bracket (expect '[' loop, '.', or end)
#   3 BROPEN after '[' (quote → 5/8, ascii digit → 4, else syntax)
#   4 INDEX  digits; ']' closes
#   5/8 QE   inside "–/'–quoted key, buffer still EMPTY
#   6/9 QN   inside quoted key, buffer non-empty
#   7/10 QESC after backslash (only '\\' / the quote may follow)
#   11 POSTQ closing quote seen (only ']' may follow)
#   90/91/92 absorbed: syntax / escape / segment-empty
#
# End-of-input classes mirror path.rs exactly: BARE/POST → ok; QE →
# "path segment is empty" (value-empty check precedes the closed
# check); QESC → "path escape is invalid"; everything else →
# "path syntax is invalid".

_DFA_OK_STATES = (1, 2)
_DFA_EMPTYKEY = (92, 5, 8)
_DFA_ESCAPE = (91, 7, 10)


def _path_dfa_step(s: Column, c: Column) -> Column:
    digit = (c >= "0") & (c <= "9")
    # quoted-key scan order mirrors parse_quoted: escape → bracket →
    # closing quote (an empty buffer on close is segment-empty) → char
    return (
        F.when(s == 0, F.when(c == ".", clit(92))
               .when(c == "[", clit(3)).otherwise(clit(1)))
        .when(s == 1, F.when(c == ".", clit(0))
              .when(c == "[", clit(3)).otherwise(clit(1)))
        .when(s == 2, F.when(c == "[", clit(3))
              .when(c == ".", clit(0)).otherwise(clit(90)))
        .when(s == 3, F.when(c == '"', clit(5)).when(c == "'", clit(8))
              .when(digit, clit(4)).otherwise(clit(90)))
        .when(s == 4, F.when(digit, clit(4))
              .when(c == "]", clit(2)).otherwise(clit(90)))
        .when(s == 5, F.when(c == "\\", clit(7))
              .when((c == "[") | (c == "]"), clit(90))
              .when(c == '"', clit(92)).otherwise(clit(6)))
        .when(s == 6, F.when(c == "\\", clit(7))
              .when((c == "[") | (c == "]"), clit(90))
              .when(c == '"', clit(11)).otherwise(clit(6)))
        .when(s == 7, F.when((c == "\\") | (c == '"'), clit(6))
              .otherwise(clit(91)))
        .when(s == 8, F.when(c == "\\", clit(10))
              .when((c == "[") | (c == "]"), clit(90))
              .when(c == "'", clit(92)).otherwise(clit(9)))
        .when(s == 9, F.when(c == "\\", clit(10))
              .when((c == "[") | (c == "]"), clit(90))
              .when(c == "'", clit(11)).otherwise(clit(9)))
        .when(s == 10, F.when((c == "\\") | (c == "'"), clit(9))
              .otherwise(clit(91)))
        .when(s == 11, F.when(c == "]", clit(2)).otherwise(clit(90)))
        .otherwise(s)  # 90/91/92 absorb
    )


def path_parse_guard(key: Column, raise_fn) -> Column:
    """Pass a VALID dot-path key through; malformed keys raise with
    the reference's exact per-row wording AND scan order (the DFA
    above IS path.rs).  ``raise_fn(msg) → Column`` builds the raise.
    Callers handle the empty key separately (their ops have a
    dedicated wording)."""
    st = F.aggregate(F.split(key, ""), clit(0).cast("int"), _path_dfa_step)
    return let(st, lambda s: (
        F.when(s.isin(*_DFA_OK_STATES), key)
        .when(s.isin(*_DFA_EMPTYKEY), raise_fn("path segment is empty"))
        .when(s.isin(*_DFA_ESCAPE), raise_fn("path escape is invalid"))
        .otherwise(raise_fn("path syntax is invalid"))))


def as_nullable(col: Column) -> Column:
    """The same value through a NULLABLE expression.

    Zero-length probes (``substring(x,1,0)``, ``x*0``) force a
    column's embedded raises to evaluate — but Spark's arithmetic
    simplification (SPARK-33847 family) folds ``a*0 → 0`` and
    ``substring(a,1,0) → ""`` when ``a`` is deterministic and
    NON-NULLABLE, silently deleting the probe (r7 fuzz:
    ``int("x") → coalesce(…, 7) → divide(0)`` — coalesce with a
    literal is non-nullable, so the ÷0 raise beat the int-cast
    raise).  ``try_element_at`` over a ``slice`` is always nullable
    and has no simplification rule (a bare ``element_at(array(x), 1)``
    would be unwrapped back to ``x`` by SimplifyExtractValueOps,
    restoring the non-nullability), so probes built over it
    survive."""
    return F.try_element_at(F.slice(F.array(col), 1, 1), F.lit(1))


def raise_err(kind: str, message: str, path: str | None = None,
              code: str | None = None) -> Column:
    encoded = encode_engine_error(kind, message, path, code)
    parts = splice_markers(encoded)
    if parts is not None:
        return F.raise_error(F.concat(*parts))
    return cached_col("raise", encoded,
                      lambda: F.raise_error(F.lit(encoded)))


def raise_err_dyn(kind: str, message: str, path_col: Column,
                  code: str | None = None) -> Column:
    """``raise_err`` with a data-dependent path Column (e.g. the
    offending entry index spliced into ``...args[0][i]``)."""
    from ..errors import encode_engine_error_parts
    prefix, suffix = encode_engine_error_parts(kind, message, code)
    return F.raise_error(F.concat(F.lit(prefix), path_col,
                                  F.lit(suffix)))


def typeof(v: Column) -> Column:
    """Per-row variant type tag (``schema_of_variant``): ``BIGINT``,
    ``DECIMAL(p,s)``, ``DOUBLE``, ``STRING``, ``BOOLEAN``, ``VOID``,
    ``ARRAY<VARIANT>``, ``OBJECT<...>``."""
    return F.schema_of_variant(v)


def is_missing(v: Column) -> Column:
    return v.isNull()


def is_vnull(v: Column) -> Column:
    return F.coalesce(F.is_variant_null(v), F.lit(False))


def is_absent(v: Column) -> Column:
    """missing OR null."""
    return v.isNull() | is_vnull(v)


def is_number(v: Column) -> Column:
    t = typeof(v)
    return t.isin("BIGINT", "DOUBLE") | t.startswith("DECIMAL")


def is_string(v: Column) -> Column:
    return typeof(v) == "STRING"


def is_bool(v: Column) -> Column:
    return typeof(v) == "BOOLEAN"


def is_array(v: Column) -> Column:
    return typeof(v).startswith("ARRAY")


def is_object(v: Column) -> Column:
    return typeof(v).startswith("OBJECT")


def as_array(v: Column) -> Column:
    """variant → array<variant> (NULL if not an array / missing / null)."""
    return F.when(is_array(v), v.try_cast(ARR_T))


def as_map(v: Column) -> Column:
    """variant → map<string,variant> (NULL if not an object)."""
    return F.when(is_object(v), v.try_cast(MAP_T))


def arr_to_variant(a: Column) -> Column:
    """array<variant> → variant (direct cast, supported by Spark 4)."""
    return a.cast(VT)


def map_to_variant(m: Column) -> Column:
    """map<string,variant> → variant object.

    Spark has no direct map→variant cast; round-trip through canonical
    JSON text (``to_json`` drops SQL-NULL map values = missing keys).
    """
    return F.parse_json(F.to_json(m))


def bool_to_variant(b: Column) -> Column:
    return b.cast(VT)


_LONG_MAX = 9223372036854775807


def num_to_variant(d: Column) -> Column:
    """double → variant with the reference's integral re-emission:
    ``json_number_from_f64`` (``transform.rs:5846-5859``) re-emits an
    integral f64 as an integer JSON number.

    ``d`` is let-bound: it is referenced 5× below, and callers pass
    whole arithmetic accumulators — inlining multiplied the t13 arith
    mappings ~6× (round 8 plan-size audit)."""
    return let(d, lambda x: (
        F.when(x.isNull(), F.lit(None).cast(VT))
        .when((x == F.floor(x)) & (F.abs(x) <= F.lit(float(_LONG_MAX) / 2)),
              x.cast("long").cast(VT))
        .otherwise(x.cast(VT))
    ))


_ZEROS330 = "0" * 330  # > max double exponent span


def rust_f64_display(d: Column) -> Column:
    """Rust ``{}`` Display of a finite f64 (``number_to_string``'s
    float arm, transform.rs:5903-5923): ALWAYS positional (no
    exponent), shortest digits, trailing fraction zeros trimmed,
    ``-0`` preserved.

    Zones: integral |d| < 2^53 → exact long; 1e-3 ≤ |d| < 1e16 →
    decimal expansion of the shortest repr; outside → digit-shift
    expansion of the shortest round-tripping scientific form.

    The common zones render inline; only the RARE scientific zones
    reference the ~35-reference probe chain, behind one let binding
    (CASE-lazy: common rows never execute it)."""
    s = d.cast("string")
    # exact decimal of the SHORTEST repr (Spark's double→decimal goes
    # through Double.toString); scale 21 holds 17 significant digits
    # down to the 1e-3 zone edge
    dec = F.regexp_replace(d.try_cast("decimal(38,21)").cast("string"),
                           r"(\.\d*?)0+$", r"$1")
    dec = F.regexp_replace(dec, r"\.$", "")
    neg_zero = (d == 0.0) & s.startswith("-")
    integral = F.abs(d % F.lit(1.0)) == 0.0
    small_int = integral & (F.abs(d) < F.lit(9007199254740992.0))
    return (
        F.when(F.isnan(d), F.lit("NaN"))
        .when(d == F.lit(float("inf")), F.lit("inf"))
        .when(d == F.lit(float("-inf")), F.lit("-inf"))
        .when(neg_zero, F.lit("-0"))
        .when(small_int, d.try_cast("long").cast("string"))
        .when((F.abs(d) >= 1e-3) & (F.abs(d) < 1e16), dec)
        .otherwise(let(d, _sci_positional))
    )


def _sci_positional(d: Column) -> Column:
    """Positional expansion for |d| >= 1e16 or < 1e-3: ryu-shortest
    digits via a round-trip probe chain — Java 17's Double.toString
    sometimes emits MORE digits than ryu (2^60 → "…698E18" vs ryu
    "…47e18"), so find the fewest %.pE digits that parse back
    exactly."""
    sci = F.format_string("%.16E", d)
    for _p in reversed(range(0, 16)):
        cand = F.format_string(f"%.{_p}E", d)
        sci = F.when(cand.try_cast("double") == d, cand).otherwise(sci)
    sign = F.when(d.cast("string").startswith("-"),
                  F.lit("-")).otherwise(F.lit(""))
    mant_int = F.regexp_extract(sci, r"^-?(\d+)", 1)
    mant_frac = F.regexp_extract(sci, r"\.(\d+)[eE]", 1)
    exp = F.regexp_extract(sci, r"[eE]([+-]?\d+)$", 1).cast("int")
    digits = F.concat(mant_int, mant_frac)
    shift = exp - F.length(mant_frac)
    big = F.concat(sign, digits,
                   F.substring(F.lit(_ZEROS330), 1, shift))
    lead = (-exp) - F.length(mant_int)
    tiny = F.concat(sign, F.lit("0."),
                    F.substring(F.lit(_ZEROS330), 1, lead), digits)
    return F.when(exp >= 0, big).otherwise(tiny)


def to_string_strict(v: Column, path: str,
                     msg: str = "value must be string/number/bool") -> Column:
    """``value_to_string`` (``transform.rs:5774-5800``): string/number/bool →
    string with the Rust ``{}`` float rendering (``number_to_string``
    ``transform.rs:5903-5923`` — positional, integral trim, ``-0``);
    null/object/array → error.  Missing input propagates as SQL NULL
    (callers decide)."""
    t = typeof(v)
    return (
        F.when(v.isNull(), F.lit(None).cast("string"))
        .when(t == "STRING", v.try_cast("string"))
        .when(t == "BOOLEAN", v.try_cast("string"))
        .when(t == "BIGINT", v.try_cast("string"))
        .when(is_number(v) & _serde_int_kind(v),
              v.try_cast("decimal(38,0)").cast("string"))
        .when(is_number(v), rust_f64_display(v.try_cast("double")))
        .otherwise(raise_err("expr_error", msg, path).cast("string"))
    )


def to_number_strict(v: Column, path: str,
                     msg: str = "value must be a number") -> Column:
    """``value_to_number``: numbers or FINITE Rust-grammar numeric
    strings → double; anything else errors (transform.rs:5804-5817 —
    no whitespace, "nan"/"inf" parse but fail the finite check).
    Missing propagates as SQL NULL."""
    err = raise_err("expr_error", msg, path).cast("double")
    # the Rust-grammar parse subtree appears ONCE, let-bound under the
    # STRING branch (was inlined 4× via the finite guard — round 8
    # plan-size audit); CASE keeps it unevaluated for non-string rows
    return (
        F.when(v.isNull(), F.lit(None).cast("double"))
        .when(is_number(v), v.try_cast("double"))
        .when(typeof(v) == "STRING",
              let(rust_f64_parse(v.try_cast("string")),
                  lambda p: F.when(
                      p.isNotNull() & ~F.isnan(p)
                      & (F.abs(p) != F.lit(float("inf"))), p)
                  .otherwise(err)))
        .otherwise(err)
    )


def to_bool_strict(v: Column, path: str,
                   msg: str = "value must be a boolean") -> Column:
    """Strict boolean: only JSON true/false. Missing → SQL NULL."""
    return (
        F.when(v.isNull(), F.lit(None).cast("boolean"))
        .when(is_bool(v), v.try_cast("boolean"))
        .otherwise(raise_err("expr_error", msg, path).cast("boolean"))
    )


# --- v2-native converters (``v2_eval.rs:1257-1304``) -----------------------

def dbg_marker(v: Column) -> Column:
    """``%%DBG:<hex-of-json>%%`` message fragment: the value's
    canonical JSON, hex-encoded (JSON-string-safe), rendered to the
    exact serde Debug form (``Object {"a": Number(1)}``) by
    ``errors.decode_dbg_message`` at the error boundary — the plan
    carries one ``to_json``+``hex`` instead of a ~30 KB recursive
    renderer per error site."""
    return F.concat(F.lit("%%DBG:"),
                    F.hex(F.encode(strict_json(v), "UTF-8")),
                    F.lit("%%"))


def raise_err_got(kind: str, message_prefix: str, v: Column,
                  path: str | None = None,
                  extra: "Column | None" = None) -> Column:
    """``raise_err`` whose message embeds the offending value's Debug
    rendering (reference ``format!("…, got {:?}", v)``).  ``extra``:
    optional zero-length probe appended to keep the raise non-foldable
    (typed fold anchor)."""
    from ..errors import encode_engine_error_msg_parts
    prefix, suffix = encode_engine_error_msg_parts(kind, message_prefix,
                                                   path)
    head = splice_markers(prefix) or [F.lit(prefix)]
    parts = [*head, dbg_marker(v), F.lit(suffix)]
    if extra is not None:
        parts.append(extra)
    return F.raise_error(F.concat(*parts))


def serde_float_text(s: Column, d: Column) -> Column:
    """serde_json float Display (ryu) from a number's text ``s`` and
    double value ``d``: integral floats KEEP ``.0`` (``2.0``),
    exponents bare-``e`` shortest (``1e20``, ``1.23e-7``).

    Spark renders DOUBLE via Java ``Double.toString`` (scientific from
    1e7 / below 1e-3); ryu keeps plain text for exponents in [-4, 16) —
    expand through an exact decimal in that zone, and normalize Java's
    ``1.0E20`` to ryu's ``1e20`` outside it."""
    has_e = s.rlike("[eE]")
    plain_zone = (F.abs(d) >= 1e-4) & (F.abs(d) < 1e16)
    dec = F.regexp_replace(d.try_cast("decimal(38,21)").cast("string"),
                           r"(\.\d*?)0+$", r"$1")
    dec = F.regexp_replace(dec, r"\.$", ".0")
    dec = F.when(dec.contains("."), dec).otherwise(
        F.concat(dec, F.lit(".0")))
    # exponent zone: ryu-shortest mantissa via the round-trip probe
    # chain (Java 17's Double.toString over-renders 2^60-like values —
    # see rust_f64_display), behind a let only the rare rows evaluate
    efmt = let(d, _sci_efmt)
    return (F.when(~has_e,
                   F.when(s.contains("."), s).otherwise(
                       F.concat(s, F.lit(".0"))))
            .when(plain_zone, dec)
            .otherwise(efmt))


def _sci_efmt(d: Column) -> Column:
    """ryu's bare-``e`` scientific form (``1e20``, ``1.23e-7``) from
    the shortest round-tripping ``%.pE`` rendering."""
    sci = F.format_string("%.16E", d)
    for _p in reversed(range(0, 16)):
        cand = F.format_string(f"%.{_p}E", d)
        sci = F.when(cand.try_cast("double") == d, cand).otherwise(sci)
    mant = F.regexp_extract(sci, r"^(-?[^eE]+)", 1)
    exp = F.regexp_extract(sci, r"[eE]([+-]?\d+)$", 1)
    mant = F.regexp_replace(mant, r"\.0$", "")
    exp = F.regexp_replace(F.regexp_replace(exp, r"^\+", ""),
                           r"^(-?)0+(\d)", r"$1$2")
    return F.concat(mant, F.lit("e"), exp)


def serde_num_str(v: Column) -> Column:
    """serde_json ``Number`` Display of a variant number (``n.to_string()``
    in ``eval_value_as_string``, ``v2_eval.rs:1266``): integers plain,
    floats via ryu — integral floats KEEP ``.0`` (``2.0`` → ``"2.0"``,
    unlike v1's ``number_to_string`` integral trim)."""
    flt = serde_float_text(v.try_cast("string"), v.try_cast("double"))
    int_kind = _serde_int_kind(v)
    return F.when(int_kind, v.try_cast("decimal(38,0)").cast("string")) \
        .otherwise(flt)


def as_string_v2(v: Column, path: str, prefix: str = "expected string, got "
                 ) -> Column:
    """``eval_value_as_string`` (``v2_eval.rs:1257-1276``): string as-is,
    number via serde Display (``2.0`` → ``"2.0"``), bool text; null /
    array / object → ``expected string, got {:?}``.  Missing → SQL NULL
    (callers run the positional protocol)."""
    t = typeof(v)
    return (
        F.when(v.isNull(), F.lit(None).cast("string"))
        .when(t == "STRING", v.try_cast("string"))
        .when(t == "BOOLEAN", v.try_cast("string"))
        .when(is_number(v), serde_num_str(v))
        .otherwise(raise_err_got("expr_error", prefix, v, path)
                   .cast("string"))
    )


# Rust ``str::parse::<f64>`` grammar (core::num::dec2flt): optional
# sign, then inf/infinity/nan (case-insensitive) or decimal digits
# with optional fraction/exponent — NO leading/trailing whitespace
# (Spark's double cast trims; r7 fuzz: add(" 1 ") must error)
RUST_F64_RE = (r"^[+-]?([iI][nN][fF]([iI][nN][iI][tT][yY])?"
               r"|[nN][aA][nN]"
               r"|[0-9]+(\.[0-9]*)?([eE][+-]?[0-9]+)?"
               r"|\.[0-9]+([eE][+-]?[0-9]+)?)$")


# plain decimal forms (no inf/nan) — the overwhelmingly common case;
# checked first so the special-constant CASE never evaluates for them
RUST_F64_NUM_RE = (r"^[+-]?([0-9]+(\.[0-9]*)?([eE][+-]?[0-9]+)?"
                   r"|\.[0-9]+([eE][+-]?[0-9]+)?)$")


def rust_f64_parse(s: Column) -> Column:
    """Parse a string column with the Rust f64 grammar → double,
    NULL when the grammar rejects it."""
    low = F.lower(s)
    special = (
        F.when(low.isin("inf", "infinity", "+inf", "+infinity"),
               F.lit(float("inf")))
        .when(low.isin("-inf", "-infinity"), F.lit(float("-inf")))
        .when(low.isin("nan", "+nan", "-nan"), F.lit(float("nan")))
    )
    return F.when(s.rlike(RUST_F64_NUM_RE), s.try_cast("double")) \
            .otherwise(special)


def as_number_v2(v: Column, path: str, prefix: str = "expected number, got "
                 ) -> Column:
    """``eval_value_as_number`` (``v2_eval.rs:1278-1304``): numbers →
    f64; strings parse with the RUST grammar (else ``failed to parse
    string as number``); null / bool / array / object → ``expected
    number, got {:?}``.  Missing → SQL NULL (callers run the
    positional protocol)."""
    # parse subtree once, let-bound under the STRING branch (round 8)
    return (
        F.when(v.isNull(), F.lit(None).cast("double"))
        .when(is_number(v), v.try_cast("double"))
        .when(typeof(v) == "STRING",
              let(rust_f64_parse(v.try_cast("string")),
                  lambda p: F.when(p.isNotNull(), p).otherwise(
                      raise_err("expr_error",
                                "failed to parse string as number",
                                path).cast("double"))))
        .otherwise(raise_err_got("expr_error", prefix, v, path)
                   .cast("double"))
    )


def get_key(v: Column, key: str | Column) -> Column:
    """Navigate one object key: missing if absent / not an object."""
    k = F.lit(key) if isinstance(key, str) else key
    return F.try_element_at(v.try_cast(MAP_T), k)


def get_index(v: Column, index: int) -> Column:
    """Navigate one array index (0-based): missing if OOB / not an array.
    Guarded against Spark's negative-index wrap-around in element_at."""
    if index < 0:
        return missing()
    return F.try_element_at(as_array(v), F.lit(index + 1))


def navigate(v: Column, tokens) -> Column:
    """Walk Key/Index path tokens; absent anywhere → missing."""
    from ..paths import Key

    cur = v
    for tok in tokens:
        if isinstance(tok, Key):
            cur = get_key(cur, tok.name)
        else:
            cur = get_index(cur, tok.index)
    return cur


# --- Catalyst-lambda scope tracking (round 8) ---------------------------
# SQL-function call sites (compiler/sqlfn.py) fail analysis when their
# argument references a lambda variable (ResolveSQLFunctions binds args
# with a Project, and lambda vars cannot escape their function).  Every
# op build runs inside compile_step's ``let`` lambda — tracking depth
# here tells SQL-function-backed ops whether a free lambda var may be
# in scope (depth > 0 → build inline instead).

_lam_state = threading.local()


def lambda_depth() -> int:
    return getattr(_lam_state, "depth", 0)


def _lam_fn(fn):
    # pyspark derives the Catalyst lambda's arity from the Python
    # signature, so the wrapper must keep positional parameters
    def wrapped(x):
        _lam_state.depth = getattr(_lam_state, "depth", 0) + 1
        try:
            return fn(x)
        finally:
            _lam_state.depth -= 1
    return wrapped


def let(col: Column, fn) -> Column:
    """Pure-expression let-binding: embed ``col`` ONCE, give ``fn`` a
    lambda variable to reference freely.

    Ops dispatch on operand type, so a naive compile references each
    operand 5-10×; over a pipe of S steps that multiplies to k^S tree
    nodes and OOMs the driver during analysis.  Binding through a
    single-element ``transform`` lambda keeps the tree linear while
    preserving per-row laziness of error branches.
    """
    return F.try_element_at(F.transform(F.array(col), _lam_fn(fn)),
                            F.lit(1))


def let_many(cols: list[Column], fn) -> Column:
    """let() for several operands at once (bound via one struct)."""
    if not cols:
        return fn()
    if len(cols) == 1:
        return let(cols[0], fn)
    s = F.struct(*[c.alias(f"_b{i}") for i, c in enumerate(cols)])
    return F.try_element_at(
        F.transform(F.array(s),
                    _lam_fn(lambda b: fn(*[b[f"_b{i}"]
                                           for i in range(len(cols))]))),
        F.lit(1))


def strict_json(v: Column) -> Column:
    """Canonical JSON text of a variant for strict (v2) equality.

    ``parse_json`` normalizes object key order, so ``to_json`` text is a
    canonical form; missing is canonicalized to the same text as null
    (v2 eq treats missing == null, ``v2_eval.rs:1140-1147``)."""
    return F.coalesce(F.to_json(v), F.lit("null"))


_I64_MAX_DEC = "9223372036854775807"        # i64::MAX
_U64_MAX_DEC = "18446744073709551615"       # u64::MAX


def _serde_int_kind(v: Column) -> Column:
    """True when the variant number is serde *integer* kind: BIGINT,
    or a scale-0 DECIMAL in (i64::MAX, u64::MAX] (PosInt territory —
    see v2_eq docstring)."""
    t = typeof(v)
    d = v.try_cast("decimal(38,0)")
    huge_posint = (
        t.rlike(r"^DECIMAL\(\d+,0\)$")
        & (d > F.lit(_I64_MAX_DEC).cast("decimal(38,0)"))
        & (d <= F.lit(_U64_MAX_DEC).cast("decimal(38,0)")))
    return (t == "BIGINT") | F.coalesce(huge_posint, F.lit(False))


def v2_eq(l: Column, r: Column) -> Column:
    """v2 strict equality (``compare_values_eq``, ``v2_eval.rs:
    1140-1147``) with serde_json's KIND-AWARE number semantics
    (``serde_json`` ``Number`` PartialEq: PosInt/NegInt vs Float are
    distinct variants, so an integer NEVER equals a float even when
    numerically equal, while floats compare by f64 value — ``1e2 ==
    100.0`` is true, ``100 == 100.0`` is false).

    Kinds map onto variant schemas: BIGINT = serde integer; DECIMAL /
    DOUBLE = serde float (non-scientific JSON floats parse as DECIMAL,
    scientific as DOUBLE — both Float in serde) — EXCEPT scale-0
    decimals in (i64::MAX, u64::MAX]: serde parses an integer literal
    there as PosInt(u64), still *integer* kind, while Spark's variant
    stores it as DECIMAL(19..20, 0) (round-5 fix; VERDICT r4 "what's
    wrong" #1).  Negative literals below i64::MIN and magnitudes above
    u64::MAX overflow serde's integer reprs and are Float, matching
    the default float class here.  Residual ambiguity: Spark's variant
    normalizes ``18446744073709551615.0`` (serde Float) to the SAME
    DECIMAL(20,0) as the bare integer literal, so the written-as-float
    bit is unrecoverable in that zone; huge scale-0 decimals classify
    as integer (every huge *integer* literal is exact; the ``.0``
    variant is the documented loss — pinned in
    tests/test_typed_navigation.py's u64-boundary sweep).  Below
    i64::MAX the classes stay faithful: a bare integer parses to
    BIGINT, so a small DECIMAL(p,0) can only come from a float-written
    literal (``100.0`` → DECIMAL(3,0)).  Integer pairs compare by
    exact canonical text, float pairs by f64 value; everything else
    (strings, bools, containers, null≡missing) keeps the canonical-text
    compare."""
    ln, rn = is_number(l), is_number(r)
    l_int = _serde_int_kind(l)
    r_int = _serde_int_kind(r)
    text_eq = strict_json(l) == strict_json(r)
    num_eq = (
        F.when(l_int != r_int, F.lit(False))
        .when(l_int, text_eq)                     # int/int: exact text
        .otherwise(l.try_cast("double").eqNullSafe(
            r.try_cast("double"))))               # float/float: f64
    return F.when(F.coalesce(ln & rn, F.lit(False)), num_eq) \
        .otherwise(text_eq)
