"""lookup / lookup_first — the engine's only join.

Expression form: filter over a (usually @context) array
(v1 ``transform.rs:2733-2883``; v2 ``v2_eval.rs:2653-3062``).  Compiled
here as an ``F.filter`` over the collection — for @context collections
that's a Catalyst constant array, so the scan cost mirrors the
reference's O(n·m) linear probe.  The relational scale path (broadcast
hash join for large lookup tables) lives in
``rulemorph_spark.functions.relational`` and is used by the TPC-H query
surface; at 100 TB a context-array lookup is the wrong tool and the
engine's docs steer rule authors to join-backed enrichment instead.

v1/v2 differences honored: v1 matches by stringified dot-path key and
returns *missing* when nothing matched; v2 matches a single object field
by strict equality and returns an empty array (``lookup``) / missing
(``lookup_first``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import RuleError
from ..expr_ir import Pipe, StartLiteral
from ..paths import parse_path
from . import variant as V
from .core import (Scope, arg_path, compile_pipe, cur_version, register,
                   rerr, sub_path)


def _literal_str(arg: Pipe):
    if isinstance(arg.start, StartLiteral) and not arg.steps \
            and isinstance(arg.start.value, str):
        return arg.start.value
    return None


def _context_collection(arg: Pipe, scope: Scope):
    """The plain-Python list behind an ``@context.<path>`` argument, when
    the context document is known at compile time."""
    from ..expr_ir import StartRef
    if scope.context_value is None:
        return None
    if not (isinstance(arg.start, StartRef) and not arg.steps):
        return None
    ref = arg.start.ref
    if ref.namespace != "context":
        return None
    from ..paths import get_path
    found, value = get_path(scope.context_value,
                            parse_path(ref.path) if ref.path else [])
    if found and isinstance(value, list):
        return value
    return None


def _py_value_to_string(v):
    """``value_to_string_optional`` (``transform.rs:5890-5897``)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, float):
        if v == int(v) and abs(v) < 9.2e18:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return None


def _prebuilt_lookup_maps(collection: list, key_tokens, out_tokens):
    """Precompute {stringified key → matches} from a literal context
    array: turns the reference's per-record O(n·m) linear probe
    (``transform.rs:2851-2876``) into one hash probe per record."""
    from ..paths import get_path
    first: dict[str, object] = {}
    all_: dict[str, list] = {}
    for item in collection:
        found, kv = get_path(item, key_tokens)
        if not found:
            continue
        key = _py_value_to_string(kv)
        if key is None:
            continue
        if out_tokens is not None:
            sel_found, selected = get_path(item, out_tokens)
            if not sel_found:
                continue
        else:
            selected = item
        if key not in first:
            first[key] = selected
        all_.setdefault(key, []).append(selected)
    return first, all_


def _v1_match_key(item: Column, key_tokens, path: str) -> Column:
    """stringified item key at path; NULL when absent/unstringifiable."""
    kv = V.navigate(item, key_tokens)
    return (
        F.when(kv.isNull() | V.is_vnull(kv) | V.is_array(kv) | V.is_object(kv),
               F.lit(None).cast("string"))
        .otherwise(V.to_string_strict(kv, path))
    )


def _compile_lookup(scope: Scope, cur: Column, args: list[Pipe], path: str,
                    *, first_only: bool) -> Column:
    n = len(args)
    pipe_scope = scope.child(pipe=cur)

    if cur_version() < 2:
        # v1 positional form: [collection, key_path, match_value, out_path?]
        # (pipe value is injected as the collection when used in a chain)
        compiled = [compile_pipe(a, pipe_scope, sub_path(path, i))
                    for i, a in enumerate(args)]
        operands = [cur] + compiled
        if len(operands) < 3:
            raise RuleError("invalid_args",
                            "lookup args must be [collection, key_path, "
                            "match_value, output_path?]", path)
        collection, match_value = operands[0], operands[2]
        # key_path / output_path must be string literals (transform.rs:2783)
        key_lit = _literal_str(args[0])
        out_lit = _literal_str(args[2]) if len(args) >= 3 else None
        if key_lit is None:
            raise RuleError("expr_error",
                            "lookup key_path must be a non-empty string "
                            "literal", arg_path(path, 1))
        key_tokens = parse_path(key_lit, error_code="expr_error")
        out_tokens = (parse_path(out_lit, error_code="expr_error")
                      if out_lit is not None else None)
        from .core import current_opstep
        step = current_opstep()
        origin = step.origin_first_arg if step is not None else None
        py_collection = (_context_collection(origin, scope)
                         if origin is not None else None)
        if py_collection is not None:
            first_map, all_map = _prebuilt_lookup_maps(
                py_collection, key_tokens, out_tokens)
            return _map_lookup(first_map if first_only else all_map,
                               V.to_string_strict(match_value,
                                                  arg_path(path, 2)),
                               match_value, arg_path(path, 2), v1=True)
        return _v1_lookup(collection, key_tokens, match_value, out_tokens,
                          path, first_only)

    # v2 keyword form (v2_eval.rs:2653-2780): arg-count decides where
    # from/match_key/match_value/get sit; 3 args disambiguate per row on
    # whether args[0] is an array.
    # Fast path: explicit @context-literal collections + literal
    # match_key/get compile to an O(1) hash-map probe.
    if n >= 3:
        py_collection = _context_collection(args[0], scope)
        key_lit = _literal_str(args[1])
        get_lit = _literal_str(args[3]) if n == 4 else None
        if py_collection is not None and key_lit is not None and \
                (n == 3 or get_lit is not None):
            first_map, all_map = _v2_prebuilt_maps(
                py_collection, key_lit, get_lit)
            match_value = compile_pipe(args[2], pipe_scope,
                                       f"{path}.args[2]")
            return _map_lookup(first_map if first_only else all_map,
                               V.strict_json(match_value), match_value,
                               path, v1=False, empty_when_none=not first_only)
    compiled = [compile_pipe(a, pipe_scope, f"{path}.args[{i}]")
                for i, a in enumerate(args)]
    if n == 2:
        return _v2_lookup(cur, compiled[0], compiled[1], None, path,
                          first_only)
    if n == 4:
        return _v2_lookup(compiled[0], compiled[1], compiled[2],
                          compiled[3], path, first_only)
    # n == 3: explicit (from,key,value) when args[0] is an array —
    # or MISSING while the pipe value is present (v2_eval.rs:2696-2725:
    # use_explicit_from matches Array | Missing, so a missing from
    # yields Missing rather than an implicit-form key error); else
    # implicit (key,value,get) over the pipe value.
    explicit = _v2_lookup(compiled[0], compiled[1], compiled[2], None,
                          path, first_only)
    implicit = _v2_lookup(cur, compiled[0], compiled[1], compiled[2],
                          path, first_only)
    use_explicit = V.is_array(compiled[0]) | \
        (compiled[0].isNull() & ~cur.isNull())
    return F.when(use_explicit, explicit).otherwise(
        F.when(cur.isNull(), F.lit(None).cast(V.VT)).otherwise(implicit))


def _py_strict_json(v) -> str:
    """Canonical JSON matching ``V.strict_json``'s variant rendering:
    sorted object keys, integral floats as ints, compact separators."""
    import json as _json

    def canon(x):
        if isinstance(x, float) and x == int(x) and abs(x) < 9.2e18:
            return int(x)
        if isinstance(x, dict):
            return {k: canon(val) for k, val in sorted(x.items())}
        if isinstance(x, list):
            return [canon(val) for val in x]
        return x

    return _json.dumps(canon(v), separators=(",", ":"), ensure_ascii=False,
                       sort_keys=True)


def _v2_prebuilt_maps(collection: list, match_key: str, get_field):
    """v2 lookup maps: strict-equality field match (compare_values_eq),
    keyed by the canonical JSON of the field value."""
    first: dict[str, object] = {}
    all_: dict[str, list] = {}
    for item in collection:
        if not isinstance(item, dict) or match_key not in item:
            continue
        key = _py_strict_json(item[match_key])
        if get_field is not None:
            if get_field not in item:
                continue
            selected = item[get_field]
        else:
            selected = item
        if key not in first:
            first[key] = selected
        all_.setdefault(key, []).append(selected)
    return first, all_


def _map_lookup(table: dict, key_col: Column, match_value: Column,
                path: str, *, v1: bool,
                empty_when_none: bool = False) -> Column:
    """Compiled hash probe: one variant object literal, one get_key."""
    import json as _json
    obj = V.lit_variant(table) if table else V.lit_variant({})
    probe = V.get_key(obj, F.coalesce(key_col, F.lit("\x00")))
    if empty_when_none:
        probe = F.coalesce(probe, V.lit_variant([]))
    result = (
        F.when(match_value.isNull(), F.lit(None).cast(V.VT))
        .otherwise(probe)
    )
    if v1:
        result = F.when(
            V.is_vnull(match_value),
            rerr("expr_error", "lookup match_value must not be null",
                 path).cast(V.VT)).otherwise(result)
    return result


def _v1_lookup(collection: Column, key_tokens, match_value: Column,
               out_tokens, path: str, first_only: bool) -> Column:
    arr = F.when(V.is_array(collection), collection.try_cast(V.ARR_T)) \
           .otherwise(rerr("expr_error", "lookup collection must be an array",
                           arg_path(path, 0)).cast(V.ARR_T))
    match_str = V.to_string_strict(match_value, arg_path(path, 2))
    matches = F.filter(
        arr, lambda item: _v1_match_key(item, key_tokens, path) == match_str)
    if out_tokens is not None:
        selected = F.filter(
            F.transform(matches, lambda item: V.navigate(item, out_tokens)),
            lambda x: x.isNotNull())
    else:
        selected = matches
    result_all = F.when(F.size(selected) == 0, F.lit(None).cast(V.VT)) \
                  .otherwise(V.arr_to_variant(selected))
    result_first = F.try_element_at(selected, F.lit(1))
    result = result_first if first_only else result_all
    return (
        F.when(collection.isNull(), F.lit(None).cast(V.VT))
        .when(match_value.isNull(), F.lit(None).cast(V.VT))
        .when(V.is_vnull(match_value),
              rerr("expr_error", "lookup match_value must not be null",
                   arg_path(path, 2)).cast(V.VT))
        .otherwise(result)
    )


def _v2_lookup(from_value: Column, match_key: Column, match_value: Column,
               get_field: Column | None, path: str,
               first_only: bool) -> Column:
    op_name = "lookup_first" if first_only else "lookup"
    # v2 labels its sub-paths (.from/.match_key/.get — _v2_lookup,
    # v2_eval.rs:2660-3062)
    arr = F.when(V.is_array(from_value), from_value.try_cast(V.ARR_T)) \
           .otherwise(rerr("expr_error",
                           f"{op_name} 'from' must be an array",
                           f"{path}.from").cast(V.ARR_T))
    key_str = V.as_string_v2(match_key, f"{path}.match_key")
    target_json = V.strict_json(match_value)

    def matches_pred(item):
        field = V.get_key(item, key_str)
        # field absent → no match (obj.get returns None); strict JSON eq
        # with missing ≡ null (compare_values_eq, v2_eval.rs:1140-1147)
        return V.is_object(item) & field.isNotNull() & \
            (V.strict_json(field) == target_json)

    matched = F.filter(arr, matches_pred)
    if get_field is not None:
        get_str = V.as_string_v2(get_field, f"{path}.get")
        projected = F.transform(matched, lambda item: V.get_key(item, get_str))
        selected = F.filter(projected, lambda x: x.isNotNull())
    else:
        selected = matched
    if first_only:
        result = F.try_element_at(selected, F.lit(1))
    else:
        result = V.arr_to_variant(selected)
    return (
        F.when(from_value.isNull(), F.lit(None).cast(V.VT))
        .when(match_value.isNull(), F.lit(None).cast(V.VT))
        .otherwise(result)
    )


@register("lookup")
def op_lookup(scope, cur, args, path):
    return _compile_lookup(scope, cur, args, path, first_only=False)


@register("lookup_first")
def op_lookup_first(scope, cur, args, path):
    return _compile_lookup(scope, cur, args, path, first_only=True)
