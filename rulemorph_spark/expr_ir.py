"""v2 expression IR and parser.

Faithful re-expression of the reference parser
(``crates/rulemorph/src/v2_parser.rs``): pipe arrays, ``@``-refs, ``$``,
``lit:`` escapes, op/let/if/map steps, shorthand op objects, and the
all/any/comparison condition grammar.  The IR is consumed by the Spark
compiler (``rulemorph_spark.compiler``) — parsing happens once per rule,
unlike the reference's per-record re-parse (``transform.rs:965-997``).
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Any

from .errors import RuleError
from .registry import is_valid_op

JsonValue = Any


# --- refs --------------------------------------------------------------

@dataclass(frozen=True)
class Ref:
    namespace: str  # input|context|out|item|acc|local
    path: str       # dot path, may be ""
    local_name: str | None = None  # for namespace == "local"


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def parse_ref(s: str) -> Ref | None:
    """Parse ``@namespace.path`` / ``@var`` (``v2_parser.rs:28-97``)."""
    if not s.startswith("@"):
        return None
    rest = s[1:]
    for ns in ("input", "context", "out", "item", "acc"):
        prefix = ns + "."
        if rest.startswith(prefix):
            path = rest[len(prefix):]
            if not path:
                return None  # trailing dot is invalid
            return Ref(ns, path)
        if rest == ns:
            return Ref(ns, "")
    if _IDENT_RE.match(rest):
        return Ref("local", "", local_name=rest)
    return None


# --- pipe IR -----------------------------------------------------------

@dataclass(frozen=True)
class StartLiteral:
    value: JsonValue


@dataclass(frozen=True)
class StartRef:
    ref: Ref


@dataclass(frozen=True)
class StartPipeValue:
    pass


Start = StartLiteral | StartRef | StartPipeValue


@dataclass(frozen=True)
class OpStep:
    op: str
    args: tuple["Pipe", ...] = ()
    # v1 standalone ops hoist their first argument into the pipe start;
    # the original IR is kept so ops can recognize compile-time-constant
    # operands (e.g. @context collections for lookup fast paths)
    origin_first_arg: "Pipe | None" = None
    # v1 chain ops count the pipe value as an implicit operand, so their
    # minimum explicit-arg count is one below the v2 pipe-context range
    # (validate_chain_op's ``args.len() + 1``, validator.rs:891)
    v1_chain: bool = False
    # v1 forms: the step's reference path suffix relative to its pipe's
    # compile base ("" for a standalone {op,args}, ".chain[k]" for chain
    # items) — v1 error paths carry the original structure, never the
    # pipe-step index (transform.rs reports ``{base}.args[o]``)
    v1_suffix: str | None = None
    # a v1 standalone parsed with an EMPTY args list: the reference
    # raises "expr.args must be a non-empty array" at EVAL
    # (transform.rs:1397), before even the unsupported-op check, so the
    # shape must survive parsing and compile to a raising column
    v1_empty_args: bool = False


@dataclass(frozen=True)
class LetStep:
    bindings: tuple[tuple[str, "Pipe"], ...] = ()


@dataclass(frozen=True)
class IfStep:
    cond: "Condition"
    then_branch: "Pipe" = None
    else_branch: "Pipe | None" = None


@dataclass(frozen=True)
class MapStep:
    steps: tuple["Step", ...] = ()


@dataclass(frozen=True)
class RefStep:
    ref: Ref


Step = OpStep | LetStep | IfStep | MapStep | RefStep


@dataclass(frozen=True)
class Pipe:
    start: Start
    steps: tuple[Step, ...] = ()


# --- conditions --------------------------------------------------------

@dataclass(frozen=True)
class CondAll:
    conditions: tuple["Condition", ...]


@dataclass(frozen=True)
class CondAny:
    conditions: tuple["Condition", ...]


@dataclass(frozen=True)
class CondCompare:
    op: str  # eq|ne|gt|gte|lt|lte|match
    args: tuple[Pipe, ...]


@dataclass(frozen=True)
class CondExpr:
    expr: Pipe


Condition = CondAll | CondAny | CondCompare | CondExpr


# --- parser ------------------------------------------------------------

def _err(msg: str, variant: str | None = None) -> RuleError:
    """Expression-parse error; ``variant`` mirrors the reference's
    ``V2ParseError`` classification (v2_parser.rs:565-583) so the
    transform boundary can render its Display wrapper ("invalid step:
    ...", "invalid start value: ...") — the reference parses v2 pipes
    at EVAL, so these surface as transform ExprErrors, not rule errors
    (engine.rule_error_to_transform)."""
    e = RuleError("expr_error", msg)
    e.v2_variant = variant
    return e


def parse_start(value: JsonValue) -> Start:
    if isinstance(value, str):
        if value == "$":
            return StartPipeValue()
        if value.startswith("lit:"):
            return StartLiteral(value[4:])
        ref = parse_ref(value)
        if ref is not None:
            return StartRef(ref)
        if value.startswith("@"):
            raise _err(f"invalid v2 reference: {value}", "start")
        return StartLiteral(value)
    return StartLiteral(value)


_RESERVED_STEP_KEYS = {"op", "let", "if", "map", "then", "else", "cond"}


def parse_step(value: JsonValue) -> Step:
    if isinstance(value, dict):
        if isinstance(value.get("op"), str):
            args_val = value.get("args")
            if args_val is None:
                args: tuple[Pipe, ...] = ()
            elif isinstance(args_val, list):
                args = tuple(parse_expr(a) for a in args_val)
            else:
                raise _err("args must be an array")
            return OpStep(op=value["op"], args=args)
        if "let" in value:
            bindings = value["let"]
            if not isinstance(bindings, dict):
                raise _err("let bindings must be an object", "step")
            return LetStep(bindings=tuple(
                (k, parse_expr(v)) for k, v in bindings.items()))
        if "if" in value:
            return _parse_if_step(value)
        if "map" in value:
            steps = value["map"]
            if not isinstance(steps, list):
                raise _err("map steps must be an array", "step")
            return MapStep(steps=tuple(parse_step(s) for s in steps))
        if len(value) == 1:
            (op_name, args_val), = value.items()
            if op_name not in _RESERVED_STEP_KEYS:
                if isinstance(args_val, list):
                    args = tuple(parse_expr(a) for a in args_val)
                else:
                    args = (parse_expr(args_val),)
                return OpStep(op=op_name, args=args)
        raise _err("unknown step type", "step")
    if isinstance(value, str):
        ref = parse_ref(value)
        if ref is not None:
            return RefStep(ref)
        if value == "$":
            raise _err("$ as a step is not valid, use it as start or in expressions", "step")
        return OpStep(op=value)
    raise _err("step must be object or string", "step")


def _parse_if_step(obj: dict) -> IfStep:
    if_val = obj["if"]
    if isinstance(if_val, dict) and ("cond" in if_val or "then" in if_val):
        if "cond" not in if_val:
            raise _err("if step missing 'cond'", "step")
        if "then" not in if_val:
            raise _err("if step missing 'then' branch", "step")
        cond = parse_condition(if_val["cond"])
        then_branch = parse_pipe_from_value(if_val["then"])
        else_branch = (parse_pipe_from_value(if_val["else"])
                       if "else" in if_val and if_val["else"] is not None else None)
        return IfStep(cond=cond, then_branch=then_branch,
                      else_branch=else_branch)
    if "then" not in obj:
        raise _err("if step missing then branch", "step")
    cond = parse_condition(if_val)
    then_branch = parse_pipe_from_value(obj["then"])
    else_branch = (parse_pipe_from_value(obj["else"])
                   if "else" in obj and obj["else"] is not None else None)
    return IfStep(cond=cond, then_branch=then_branch, else_branch=else_branch)


def _looks_like_step(value: JsonValue) -> bool:
    """``v2_parser.rs:403-435`` — decide if a lone array element is a step."""
    if isinstance(value, dict):
        if any(k in value for k in ("op", "let", "if", "map")):
            return True
        if len(value) == 1:
            key = next(iter(value))
            if key not in (_RESERVED_STEP_KEYS | {"ref"}):
                return is_valid_op(key)
        return False
    return False


def parse_pipe(arr: list) -> Pipe:
    if not arr:
        raise _err("pipe array cannot be empty")
    if len(arr) == 1 and _looks_like_step(arr[0]):
        return Pipe(start=StartPipeValue(), steps=(parse_step(arr[0]),))
    start = parse_start(arr[0])
    steps = tuple(parse_step(s) for s in arr[1:])
    return Pipe(start=start, steps=steps)


def parse_pipe_from_value(value: JsonValue) -> Pipe:
    if isinstance(value, list):
        return parse_pipe(value)
    return Pipe(start=parse_start(value))


def parse_expr(value: JsonValue) -> Pipe:
    """Any JSON value → a pipe (``v2_parser.rs:438-482``)."""
    if isinstance(value, list):
        return parse_pipe(value)
    return Pipe(start=parse_start(value))


_CMP_KEYS = ("eq", "ne", "gt", "gte", "lt", "lte", "match")


def parse_condition(value: JsonValue) -> Condition:
    if isinstance(value, dict):
        if "all" in value:
            arr = value["all"]
            if not isinstance(arr, list):
                raise _err("all/any must contain an array", "cond")
            return CondAll(tuple(parse_condition(c) for c in arr))
        if "any" in value:
            arr = value["any"]
            if not isinstance(arr, list):
                raise _err("all/any must contain an array", "cond")
            return CondAny(tuple(parse_condition(c) for c in arr))
        for key in _CMP_KEYS:
            if key in value:
                args_val = value[key]
                if not isinstance(args_val, list):
                    raise _err("args must be an array")
                return CondCompare(op=key,
                                   args=tuple(parse_expr(a) for a in args_val))
        return CondExpr(parse_expr(value))
    return CondExpr(parse_expr(value))


# --- v1 model bridging --------------------------------------------------

def is_v2_expr(value: JsonValue) -> bool:
    """``v2_parser.rs:1367-1385`` — detect v2 vs v1 expression syntax."""
    if isinstance(value, list):
        return True
    if isinstance(value, str):
        return value.startswith("@") or value == "$" or value.startswith("lit:")
    if isinstance(value, dict):
        return not ("ref" in value or ("op" in value and "if" not in value))
    return False


def v1_expr_to_pipe(value: JsonValue) -> Pipe:
    """Convert a v1 expr tree ({ref}/{op,args}/{chain}/literal) to pipe IR.

    v1 semantics (``transform.rs:1177-1245``): a chain threads the previous
    value as the injected first operand of each subsequent op — exactly a
    pipe.  v1 op argument lists may themselves contain v1 exprs.
    """
    if isinstance(value, dict):
        if "ref" in value:
            ref_path = value["ref"]
            ref = parse_ref("@" + ref_path if not str(ref_path).startswith("@")
                            else ref_path)
            if ref is None:
                # v1 additionally knows the ``pipe.*`` namespace (the
                # injected chain value during v2 delegation); in plain
                # v1 eval it is never bound, so it raises "pipe is only
                # available within v2 pipes" at EVAL, not at parse
                # (eval_ref, transform.rs; pinned by v1_pipe_ref.rs)
                s = str(ref_path)
                if s == "pipe" or s.startswith("pipe."):
                    return Pipe(start=StartRef(
                        Ref("pipe", s[5:] if len(s) > 4 else "")))
                raise _err(f"invalid ref: {ref_path}")
            return Pipe(start=StartRef(ref))
        if "op" in value:
            args = tuple(v1_expr_to_pipe(a) for a in value.get("args", []))
            if not args:
                # an EVAL error in the reference (transform.rs:1397) —
                # compile_step raises it per evaluation, not at parse
                return Pipe(start=StartLiteral(None),
                            steps=(OpStep(op=value["op"], args=(),
                                          v1_suffix="",
                                          v1_empty_args=True),))
            # v1 standalone op: first arg is the primary operand
            return Pipe(start=StartPipeValue(),
                        steps=(OpStep(op=value["op"], args=args,
                                      v1_suffix=""),)
                        )._v1_standalone()
        if "chain" in value:
            chain = value["chain"]
            if not isinstance(chain, list) or not chain:
                raise _err("expr.chain must be a non-empty array")
            first = v1_expr_to_pipe(chain[0])
            # steps contributed by chain[0] (a nested standalone op)
            # belong to the chain[0] slot of the original structure
            steps = [_v1_resuffix(s, ".chain[0]") for s in first.steps]
            start = first.start
            for k, item in enumerate(chain[1:], start=1):
                if not (isinstance(item, dict) and "op" in item):
                    raise _err("expr.chain items after first must be op")
                args = tuple(v1_expr_to_pipe(a) for a in item.get("args", []))
                steps.append(OpStep(op=item["op"], args=args, v1_chain=True,
                                    v1_suffix=f".chain[{k}]"))
            return Pipe(start=start, steps=tuple(steps))
    # literal (string literals in v1 are plain literals, no @ parsing)
    return Pipe(start=StartLiteral(value))


def _v1_resuffix(step: Step, prefix: str) -> Step:
    """Prefix a v1 step's reference-path suffix with the slot it came
    from after splicing into an outer pipe (``.args[0]``/``.chain[0]``)."""
    if isinstance(step, OpStep) and step.v1_suffix is not None:
        return dataclasses.replace(step, v1_suffix=prefix + step.v1_suffix)
    return step


def _v1_standalone(self: Pipe) -> Pipe:
    """v1 ``{op, args}``: hoist first arg to the pipe start."""
    step = self.steps[0]
    assert isinstance(step, OpStep)
    first, *rest = step.args
    op = OpStep(step.op, tuple(rest), origin_first_arg=first,
                v1_suffix=step.v1_suffix)
    if first.steps:
        # first arg is itself a pipe: start from it, then apply op to
        # it — its steps' errors attribute to the args[0] slot
        return Pipe(start=first.start,
                    steps=tuple(_v1_resuffix(s, ".args[0]")
                                for s in first.steps) + (op,))
    return Pipe(start=first.start, steps=(op,))


Pipe._v1_standalone = _v1_standalone
