"""Date ops: ``date_format`` and ``to_unixtime``.

The reference treats dates as strings parsed on demand with chrono
(``transform.rs:2576-2731``): RFC3339/RFC2822 first, then 8 offset-bearing
default patterns (``:5522-5531``), then 12 naive patterns (``:5533-5546``),
or an explicit chrono format list; an optional fixed-offset timezone
applies to naive values and selects the rendering offset.

Here each chrono pattern is translated **at compile time** to a Spark
datetime pattern and the parse becomes a ``coalesce(try_to_timestamp...)``
chain — Catalyst evaluates it vectorized, versus the reference's
per-record sequential parse attempts.

Format/timezone arguments must be compile-time literals (they are in every
reference fixture and benchmark); dynamic formats raise at compile time.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import RuleError
from ..expr_ir import Pipe, StartLiteral
from . import variant as V
from .core import Scope, arg_path, compile_pipe, register, rerr
from .ops_scalar import _as_string, _operands, seq_strict

# chrono strftime token → Spark (java.time) pattern token
_CHRONO_TOKENS = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%M": "mm", "%S": "ss",
    "%y": "yy", "%b": "MMM", "%B": "MMMM",
    "%a": "EEE", "%A": "EEEE",
    "%e": "d", "%j": "DDD",
    "%F": "yyyy-MM-dd", "%T": "HH:mm:ss", "%R": "HH:mm",
    "%z": "xx", "%:z": "XXX",
    "%3f": "SSS", "%6f": "SSSSSS", "%9f": "SSSSSSSSS",
    "%%": "%",
}

_HAS_OFFSET = ("%z", "%:z", "%#z")
_DATE_ONLY_TOKENS = {"%Y", "%m", "%d", "%y", "%b", "%B", "%a", "%A", "%e",
                     "%j", "%F", "%%"}


def chrono_to_spark(fmt: str, path: str) -> list[str]:
    """Translate a chrono format → one or more Spark patterns.

    Returns several candidates when a chrono token is variable-width
    (``%.f`` matches 1-9 fractional digits; Spark's ``S`` counts are fixed).
    """
    variants = [""]
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            for tok_len in (3, 2):
                tok = fmt[i:i + tok_len]
                if tok in _CHRONO_TOKENS:
                    variants = [v + _CHRONO_TOKENS[tok] for v in variants]
                    i += tok_len
                    break
            else:
                if fmt[i:i + 3] == "%.f":
                    variants = [v + ".".join(["", "S" * n])
                                for v in variants
                                for n in (3, 6, 1, 2, 4, 5, 7, 8, 9)]
                    i += 3
                else:
                    raise RuleError("expr_error",
                                    f"unsupported date format token at "
                                    f"{fmt[i:i + 3]!r} in {fmt!r}", path)
        elif c.isalpha():
            variants = [v + f"'{c}'" for v in variants]
            i += 1
        elif c == "'":
            variants = [v + "''" for v in variants]
            i += 1
        else:
            variants = [v + c for v in variants]
            i += 1
    return variants


def _fmt_has_offset(fmt: str) -> bool:
    return any(t in fmt for t in _HAS_OFFSET)


def _fmt_has_time(fmt: str) -> bool:
    i, has_time = 0, False
    while i < len(fmt):
        if fmt[i] == "%":
            tok3, tok2 = fmt[i:i + 3], fmt[i:i + 2]
            tok = tok3 if tok3 in _CHRONO_TOKENS or tok3 == "%.f" else tok2
            if tok not in _DATE_ONLY_TOKENS:
                has_time = True
            i += len(tok)
        else:
            i += 1
    return has_time


# The reference's default parse order (transform.rs:5601-5633):
# RFC3339, RFC2822, 8 offset formats, then 12 naive formats.
_DEFAULT_WITH_TZ = [
    "%Y-%m-%dT%H:%M:%S%:z", "%Y-%m-%d %H:%M:%S%:z",
    "%Y-%m-%dT%H:%M:%S%.f%:z", "%Y-%m-%d %H:%M:%S%.f%:z",
    "%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%d %H:%M:%S%z",
    "%Y/%m/%d %H:%M:%S%:z", "%Y/%m/%d %H:%M:%S%z",
]
_DEFAULT_NAIVE = [
    "%Y-%m-%d", "%Y/%m/%d", "%Y%m%d",
    "%Y-%m-%d %H:%M", "%Y/%m/%d %H:%M",
    "%Y-%m-%d %H:%M:%S", "%Y/%m/%d %H:%M:%S",
    "%Y-%m-%dT%H:%M", "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M:%S%.f", "%Y-%m-%d %H:%M:%S%.f", "%Y/%m/%d %H:%M:%S%.f",
]
# RFC3339 variants (chrono accepts 'Z' and fractional seconds)
_RFC3339 = ["%Y-%m-%dT%H:%M:%S%:z", "%Y-%m-%dT%H:%M:%S%.f%:z"]
# RFC2822: Spark forbids 'E' in parse patterns, so the optional weekday
# prefix is stripped before parsing "d MMM yyyy HH:mm:ss xx"
_RFC2822_SPARK = ["d MMM yyyy HH:mm:ss xx"]


def _lit_str_arg(arg: Pipe, path: str, what: str):
    if isinstance(arg.start, StartLiteral) and not arg.steps:
        return arg.start.value
    raise RuleError("expr_error",
                    f"{what} must be a literal (dynamic {what}s are not "
                    f"supported by the Spark compiler)", path)


_TZ_RE = re.compile(r"^([+-])(\d{2}):?(\d{2})?$")


def parse_tz_literal(value: str, path: str) -> int:
    """→ offset seconds (``transform.rs:5681-5772``)."""
    if value.upper() == "UTC" or value == "Z":
        return 0
    m = _TZ_RE.match(value)
    if not m:
        raise RuleError("expr_error",
                        "timezone must be UTC or an offset like +09:00", path)
    sign = 1 if m.group(1) == "+" else -1
    hours = int(m.group(2))
    minutes = int(m.group(3) or 0)
    if hours > 23 or minutes > 59:
        raise RuleError("expr_error",
                        "timezone must be UTC or an offset like +09:00", path)
    return sign * (hours * 3600 + minutes * 60)


def looks_like_timezone(value: str) -> bool:
    return value.upper() == "UTC" or value == "Z" or value[:1] in "+-"


def _offset_str(seconds: int) -> str:
    sign = "+" if seconds >= 0 else "-"
    seconds = abs(seconds)
    return f"{sign}{seconds // 3600:02d}:{(seconds % 3600) // 60:02d}"


def _try_parse(value: Column, chrono_fmt: str, path: str,
               tz_seconds: int | None) -> Column:
    """One chrono format → timestamp-UTC Column (NULL on parse failure)."""
    cands = []
    for spark_fmt in chrono_to_spark(chrono_fmt, path):
        if _fmt_has_offset(chrono_fmt):
            cands.append(F.try_to_timestamp(value, F.lit(spark_fmt)))
        elif _fmt_has_time(chrono_fmt):
            naive = F.try_to_timestamp(value, F.lit(spark_fmt))
            off = _offset_str(tz_seconds or 0)
            cands.append(F.to_utc_timestamp(naive, off))
        else:
            d = F.call_function("try_to_date", value, F.lit(spark_fmt))
            naive = d.cast("timestamp")
            off = _offset_str(tz_seconds or 0)
            cands.append(F.to_utc_timestamp(naive, off))
    return F.coalesce(*cands) if len(cands) > 1 else cands[0]


def _fmt_gate_regex(chrono_fmt: str) -> str:
    """Loose structural regex for one chrono format: digit tokens →
    ``\\d+``, month names → letters, offsets → ``Z|±hh[:]mm``,
    literals escaped.  Used to SKIP formats in the default chain whose
    shape can't match — each skipped format saves an exception-driven
    ``try_to_timestamp`` attempt per row (the default chain is ~23
    formats; ungated, a late-chain match paid every earlier failure).
    Deliberately LOOSER than the real parser: a false positive only
    costs the parse attempt it would have made anyway; it must never
    reject a value the format would parse."""
    out = ["^"]
    i, n = 0, len(chrono_fmt)
    while i < n:
        ch = chrono_fmt[i]
        if ch == "%" and i + 1 < n:
            if chrono_fmt[i:i + 3] == "%.f":
                out.append(r"(\.\d+)?")
                i += 3
                continue
            if chrono_fmt[i:i + 3] == "%:z":
                out.append(r"(Z|z|[+-]\d{2}:?\d{2})")
                i += 3
                continue
            tok = chrono_fmt[i:i + 2]
            if tok == "%z":
                out.append(r"(Z|z|[+-]\d{2}:?\d{2})")
            elif tok in ("%b", "%B", "%a", "%A"):
                out.append(r"[A-Za-z.]+")
            else:  # %Y %m %d %H %M %S %y … all numeric
                out.append(r"\d+")
            i += 2
            continue
        out.append(re.escape(ch))
        i += 1
    out.append("$")
    return "".join(out)


def _gated_parse(value: Column, chrono_fmt: str, path: str,
                 tz_seconds: int | None) -> Column:
    gate = _fmt_gate_regex(chrono_fmt)
    return F.when(value.rlike(gate),
                  _try_parse(value, chrono_fmt, path, tz_seconds)) \
        .otherwise(F.lit(None).cast("timestamp"))


def parse_datetime_utc(value: Column, formats: list[str] | None,
                       tz_seconds: int | None, path: str) -> Column:
    """Full default/explicit parse chain → (ts_utc, input_offset_seconds).

    ``input_offset_seconds`` recovers the offset the input string itself
    carried (chrono keeps it for rendering); NULL when the format was naive.
    """
    cands: list[Column] = []
    offset_cands: list[tuple[Column, Column]] = []
    if formats is None:
        chain = _RFC3339 + _DEFAULT_WITH_TZ
        for f in chain:
            c = _gated_parse(value, f, path, tz_seconds)
            cands.append(c)
            offset_cands.append((c, _extract_offset_seconds(value)))
        # RFC2822 (spark patterns directly, weekday prefix stripped)
        no_weekday = F.regexp_replace(value, r"^[A-Za-z]{3},\s*", "")
        for sf in _RFC2822_SPARK:
            c = F.try_to_timestamp(no_weekday, F.lit(sf))
            cands.append(c)
            offset_cands.append((c, _extract_offset_seconds(value)))
        for f in _DEFAULT_NAIVE:
            c = _gated_parse(value, f, path, tz_seconds)
            cands.append(c)
            offset_cands.append((c, F.lit(None).cast("int")))
    else:
        for f in formats:
            c = _try_parse(value, f, path, tz_seconds)
            cands.append(c)
            if _fmt_has_offset(f):
                offset_cands.append((c, _extract_offset_seconds(value)))
            else:
                offset_cands.append((c, F.lit(None).cast("int")))
    ts = F.coalesce(*cands)
    ts = F.when(ts.isNotNull(), ts).otherwise(
        rerr("expr_error", "date format is invalid", path).cast("timestamp"))
    # first successful candidate (in declaration order) decides the offset
    input_offset = F.lit(None).cast("int")
    for c, off in reversed(offset_cands):
        input_offset = F.when(c.isNotNull(), off).otherwise(input_offset)
    return ts, input_offset


_OFFSET_EXTRACT_RE = r"(Z|[+-]\d{2}:?\d{2})\s*$"


def _extract_offset_seconds(value: Column) -> Column:
    tz = F.regexp_extract(value, _OFFSET_EXTRACT_RE, 1)
    hours = F.substring(F.regexp_replace(tz, ":", ""), 2, 2).try_cast("int")
    mins = F.substring(F.regexp_replace(tz, ":", ""), 4, 2).try_cast("int")
    signed = F.when(F.substring(tz, 1, 1) == "-", -1).otherwise(1)
    return (
        F.when(tz == "Z", F.lit(0))
        .when(tz == "", F.lit(None).cast("int"))
        .otherwise(signed * (hours * 3600 + F.coalesce(mins, F.lit(0)) * 60))
    )


def _render(ts_utc: Column, out_fmt: str, offset_seconds: Column,
            path: str) -> Column:
    """Format a UTC instant in the given per-row offset with a chrono fmt."""
    # shift the wall clock into the rendering offset
    off = F.coalesce(offset_seconds, F.lit(0))
    shifted = F.timestamp_add("SECOND", off.cast("long"), ts_utc)
    # render offset literals for %z/%:z from offset_seconds
    sign = F.when(off < 0, "-").otherwise("+")
    abs_off = F.abs(off)
    hh = F.lpad((abs_off / 3600).cast("int").cast("string"), 2, "0")
    mm = F.lpad(((abs_off % 3600) / 60).cast("int").cast("string"), 2, "0")
    off_colon = F.concat(sign, hh, F.lit(":"), mm)
    off_plain = F.concat(sign, hh, mm)

    parts: list[Column] = []
    i, buf = 0, ""

    def flush_fmt():
        nonlocal buf
        if buf:
            spark_fmts = chrono_to_spark(buf, path)
            parts.append(F.date_format(shifted, spark_fmts[0]))
            buf = ""

    while i < len(out_fmt):
        if out_fmt[i:i + 3] == "%:z":
            flush_fmt()
            parts.append(off_colon)
            i += 3
        elif out_fmt[i:i + 2] == "%z":
            flush_fmt()
            parts.append(off_plain)
            i += 2
        elif out_fmt[i:i + 2] == "%s":
            flush_fmt()
            parts.append(F.unix_timestamp(ts_utc).cast("string"))
            i += 2
        else:
            tok3, tok2 = out_fmt[i:i + 3], out_fmt[i:i + 2]
            if tok3 in _CHRONO_TOKENS or tok3 == "%.f":
                buf += tok3
                i += 3
            elif tok2 in _CHRONO_TOKENS:
                buf += tok2
                i += 2
            else:
                buf += out_fmt[i]
                i += 1
    flush_fmt()
    if not parts:
        return F.lit("")
    return F.concat(*parts) if len(parts) > 1 else parts[0]


@register("date_format")
def op_date_format(scope: Scope, cur, args, path):
    ops = _operands(scope, cur, args, path)
    vp = arg_path(path, 0)
    value = _as_string(ops[0], vp)
    out_fmt = _lit_str_arg(args[0], arg_path(path, 1), "output format")
    if not isinstance(out_fmt, str):
        raise RuleError("expr_error", "output format must be a string",
                        arg_path(path, 1))

    input_formats: list[str] | None = None
    tz_seconds: int | None = None
    if len(args) >= 2:
        ip = arg_path(path, 2)
        third = _lit_str_arg(args[1], ip, "input format / timezone")
        if isinstance(third, str) and looks_like_timezone(third):
            tz_seconds = parse_tz_literal(third, ip)
        elif isinstance(third, str):
            input_formats = [third]
        elif isinstance(third, list):
            input_formats = [str(x) for x in third]
        else:
            raise RuleError("expr_error",
                            "input_format must be a string or array", ip)
    if len(args) == 3:
        tp = arg_path(path, 3)
        tz = _lit_str_arg(args[2], tp, "timezone")
        tz_seconds = parse_tz_literal(str(tz), tp)

    # let-bind the string value, then the parsed (ts, offset) pair:
    # the default-chain parse references the value once per tried
    # format, and _render references the parse result once per output
    # component — unbound, the whole parse tree inlined into every
    # component (~100k-char plans for one call; round 5)
    def render(ts: Column, input_off: Column) -> Column:
        if tz_seconds is not None:
            render_off = F.lit(tz_seconds)
        else:
            render_off = input_off  # render in the input's own offset
        return _render(ts, out_fmt, render_off, path)

    result = V.let(value, lambda v: V.let_many(
        list(parse_datetime_utc(v, input_formats, tz_seconds, vp)),
        render))
    return seq_strict(ops, path, result.cast(V.VT))


@register("to_unixtime")
def op_to_unixtime(scope: Scope, cur, args, path):
    ops = _operands(scope, cur, args, path)
    vp = arg_path(path, 0)
    value = _as_string(ops[0], vp)
    unit = "s"
    tz_seconds: int | None = None
    if len(args) >= 1:
        up = arg_path(path, 1)
        second = str(_lit_str_arg(args[0], up, "unit / timezone"))
        if len(args) == 2:
            if second not in ("s", "ms"):
                raise RuleError("expr_error", "unit must be s or ms", up)
            unit = second
        elif second in ("s", "ms"):
            unit = second
        elif looks_like_timezone(second):
            tz_seconds = parse_tz_literal(second, up)
        else:
            raise RuleError("expr_error", "unit must be s or ms", up)
    if len(args) == 2:
        tp = arg_path(path, 2)
        tz = str(_lit_str_arg(args[1], tp, "timezone"))
        tz_seconds = parse_tz_literal(tz, tp)

    def to_epoch(v: Column) -> Column:
        ts, _ = parse_datetime_utc(v, None, tz_seconds, vp)
        if unit == "ms":
            return (F.unix_micros(ts) / 1000).cast("long")
        return F.unix_timestamp(ts).cast("long")

    result = V.let(value, to_epoch)  # bind: parse references v per format
    return seq_strict(ops, path, result.cast(V.VT))
