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
