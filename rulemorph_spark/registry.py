"""Closed operation registry with arities.

Mirrors the reference's op set and argument ranges
(``crates/rulemorph/src/v2_validator.rs:666-766`` for validity,
``:812-863`` for arity).  Unknown ops are a validation error, like the
reference (``v2_validator.rs:666``, ``transform.rs:1989-1993``).
"""

from __future__ import annotations

# op -> (min_args, max_args or None for unbounded)
OP_ARITY: dict[str, tuple[int, int | None]] = {}

_ZERO = ["trim", "lowercase", "uppercase", "to_string", "keys", "values",
         "entries", "unique", "unzip", "first", "last", "len", "sum", "avg",
         "min", "max", "not", "string", "int", "float", "bool"]
_OPT_ONE = ["round", "flatten"]
_ONE = ["take", "drop", "get", "object_flatten", "object_unflatten", "chunk",
        "map", "filter", "flat_map", "group_by", "key_by", "distinct_by",
        "find", "find_index", "index_of", "contains", "partition", "split",
        "reduce", "to_base"]
_ONE_TWO = ["sort_by", "pad_start", "pad_end", "slice"]
_TWO = ["fold"]
_TWO_THREE = ["replace"]
_VAR_ONE = ["concat", "coalesce", "merge", "deep_merge", "and", "or", "pick",
            "omit", "from_entries", "add", "subtract", "multiply", "divide",
            "zip", "+", "-", "*", "/"]
_VAR_TWO = ["zip_with"]
_CMP = ["==", "!=", "<", "<=", ">", ">=", "~=",
        "eq", "ne", "lt", "lte", "gt", "gte", "match"]

for _op in _ZERO:
    OP_ARITY[_op] = (0, 0)
for _op in _OPT_ONE:
    OP_ARITY[_op] = (0, 1)
for _op in _ONE:
    OP_ARITY[_op] = (1, 1)
for _op in _ONE_TWO:
    OP_ARITY[_op] = (1, 2)
for _op in _TWO:
    OP_ARITY[_op] = (2, 2)
for _op in _TWO_THREE:
    OP_ARITY[_op] = (2, 3)
for _op in _VAR_ONE:
    OP_ARITY[_op] = (1, None)
for _op in _VAR_TWO:
    OP_ARITY[_op] = (2, None)
for _op in _CMP:
    OP_ARITY[_op] = (1, 1)
OP_ARITY["date_format"] = (1, 3)
OP_ARITY["to_unixtime"] = (0, 2)
OP_ARITY["lookup"] = (2, 4)
OP_ARITY["lookup_first"] = (2, 4)

# Aliases normalised before compilation (``v2_eval.rs:1570-1578``).
OP_ALIASES = {
    "add": "+", "subtract": "-", "multiply": "*", "divide": "/",
    "eq": "==", "ne": "!=", "lt": "<", "lte": "<=", "gt": ">", "gte": ">=",
    "match": "~=",
}

# Ops whose first (or for fold: second) argument is an @item/@acc-scoped
# sub-expression (``v2_validator.rs:769-781``).
ITEM_SCOPED_FIRST_ARG = {"map", "filter", "flat_map", "group_by", "key_by",
                         "partition", "distinct_by", "sort_by", "find",
                         "find_index"}
ACC_SCOPED = {"reduce": 0, "fold": 1}
# zip_with's last arg is the combiner over @item (an array of zipped values)
ZIP_WITH = "zip_with"


def is_valid_op(op: str) -> bool:
    return op in OP_ARITY


# --- EVAL-surface arities (round 9) --------------------------------------
# The reference enforces op arity TWICE with DIFFERENT, mutually
# inconsistent tables: statically in the validators (OP_ARITY above —
# only `validate`/`--validate` runs it) and again at EVAL, which is what
# a plain transform sees.  The eval rules differ per op and rule
# version:
#
# - v1 eval checks per-op TOTAL operand counts — the injected pipe value
#   (chain items) counts, a standalone's args count verbatim — with
#   "expr.args must contain ..." wordings (``args_len``,
#   ``transform.rs:4928`` and per-op helpers), and rejects v2-only op
#   names with "expr.op is not supported" (``transform.rs:1989-1993``).
# - v2-NATIVE steps check explicit args with per-op "requires ..."
#   wordings BEFORE evaluating any argument (``v2_eval.rs:1765-3069``);
#   several natives (trim/to_string/first/coalesce/+/*/map...) simply
#   IGNORE extra arguments.
# - v2 NON-native steps delegate to v1 with the pipe injected
#   (``eval_v2_op_with_v1_fallback``, v2_eval.rs:1580-1640), so their
#   EXPLICIT windows are the v1 totals minus one — and the argument
#   expressions evaluate (and may raise) BEFORE the v1 arity check.
#   pick/omit pack their keys into one v1 array argument and carry
#   their own wording.
#
# Both tables were derived differentially from the interpreter oracle
# and are pinned end-to-end by tests/test_eval_arity.py.

def _mk(groups):
    out = {}
    for (lo, hi, msg), ops in groups:
        for op in ops:
            out[op] = (lo, hi, msg)
    return out


# op -> (min_TOTAL, max_TOTAL or None, wording tail); message renders as
# f"expr.args must contain {tail}" at path "{step}.args"
V1_EVAL_ARITY: dict[str, tuple[int, int | None, str]] = _mk([
    ((1, 1, "exactly one item"),
     ["avg", "entries", "keys", "len", "lowercase", "max", "min", "not",
      "object_flatten", "object_unflatten", "sum", "to_string", "trim",
      "unique", "unzip", "uppercase", "values"]),
    ((2, 2, "exactly two items"),
     ["!=", "-", "/", "<", "<=", "==", ">", ">=", "chunk", "contains",
      "distinct_by", "drop", "filter", "find", "find_index", "flat_map",
      "get", "group_by", "index_of", "key_by", "map", "omit", "partition",
      "pick", "reduce", "split", "take", "to_base", "~="]),
    ((2, 3, "two or three items"),
     ["pad_end", "pad_start", "slice", "sort_by"]),
    ((1, 2, "one or two items"), ["flatten", "round", "from_entries"]),
    ((3, 4, "three or four items"), ["replace"]),
    ((2, 4, "two to four items"), ["date_format"]),
    ((1, 3, "one to three items"), ["to_unixtime"]),
    ((2, None, "at least two items"),
     ["+", "*", "and", "or", "merge", "deep_merge", "zip"]),
    ((3, None, "at least three items"), ["zip_with"]),
    ((3, 3, "exactly three items"), ["fold"]),
])

# every op name v1 eval dispatches (transform.rs match arms); anything
# else is "expr.op is not supported" at "{step}.op" — including the v2
# spellings (eq/add/match/string/first/...)
V1_SUPPORTED_OPS = frozenset(V1_EVAL_ARITY) | {
    "coalesce", "concat", "lookup", "lookup_first"}


def _req(op, phrase):
    return f"{op} requires {phrase}"


# v2 step EXPLICIT-arg windows: op -> (min, max or None, message,
# path_suffix) where path_suffix is "" (error at the step path) or
# ".args".  Ops absent from BOTH this table and V2_DELEGATED_EVAL_ARITY
# accept any count (extra args ignored).
V2_NATIVE_EVAL_ARITY: dict[str, tuple[int, int | None, str, str]] = {
    "fold": (2, 2, _req("fold", "exactly two arguments"), ""),
    "sort_by": (1, 2, _req("sort_by", "one or two arguments"), ""),
    "zip_with": (2, None, _req("zip_with", "at least two arguments"), ""),
    "-": (1, None, _req("subtract", "at least one argument"), ""),
    "/": (1, None, _req("divide", "at least one argument"), ""),
    "and": (1, None, "expr.args must contain at least two items", ".args"),
    "or": (1, None, "expr.args must contain at least two items", ".args"),
    "not": (0, 0, "expr.args must contain exactly one item", ".args"),
    "lookup": (2, None,
               "lookup requires at least 2 arguments: match_key, "
               "match_value", ""),
    "lookup_first": (2, None,
                     "lookup_first requires at least 2 arguments: "
                     "match_key, match_value", ""),
}
for _o in ("reduce", "distinct_by", "group_by", "key_by", "flat_map",
           "filter", "find", "find_index", "partition", "map"):
    V2_NATIVE_EVAL_ARITY[_o] = (1, 1, _req(_o, "exactly one argument"), "")
for _o in ("==", "!=", "<", "<=", ">", ">=", "~="):
    V2_NATIVE_EVAL_ARITY[_o] = (
        1, 1, "expr.args must contain exactly one item", ".args")

# v2 delegated (non-native) explicit windows = v1 totals minus the
# injected pipe; pick/omit variadic with their own wording
V2_DELEGATED_EVAL_ARITY: dict[str, tuple[int, int | None, str, str]] = {
    op: (lo - 1, (hi - 1 if hi is not None else None),
         f"expr.args must contain {tail}", ".args")
    for op, (lo, hi, tail) in V1_EVAL_ARITY.items()
}
for _o in ("pick", "omit"):
    V2_DELEGATED_EVAL_ARITY[_o] = (
        1, None, _req(_o, "at least one argument"), ".args")

# natives that consume NO explicit args: the reference ignores extras
# entirely — it never evaluates them, so a raising extra arg must not
# raise (v2_eval.rs native match arms read only the pipe value)
V2_NATIVE_IGNORED_ARGS = frozenset({
    "trim", "lowercase", "uppercase", "to_string", "string", "int",
    "float", "bool", "first", "last"})


def eval_arity_anomaly(step, op: str, native_ops: frozenset) -> bool:
    """True when an op step's shape falls outside the happy window the
    engines share — core.compile_step turns these into raising columns
    with per-op reference wordings (or truncates ignored args); the
    typed engine defers them to the variant engine instead of
    duplicating that machinery."""
    n = len(step.args)
    if getattr(step, "v1_empty_args", False):
        return True
    if step.origin_first_arg is not None or step.v1_chain:
        if step.op not in V1_SUPPORTED_OPS:
            return True
        spec = V1_EVAL_ARITY.get(step.op)
        if spec is None:
            return False
        lo, hi, _ = spec
        total = n + 1
        return total < lo or (hi is not None and total > hi)
    if op in native_ops:
        spec = V2_NATIVE_EVAL_ARITY.get(op)
        if spec is not None:
            lo, hi, _m, _s = spec
            if n < lo or (hi is not None and n > hi):
                return True
        return op in V2_NATIVE_IGNORED_ARGS and n > 0
    if op not in OP_ARITY:
        return True
    spec = V2_DELEGATED_EVAL_ARITY.get(op)
    if spec is None:
        return False
    lo, hi, _m, _s = spec
    return n < lo or (hi is not None and n > hi)
