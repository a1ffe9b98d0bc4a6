"""Static rule validation.

Mirrors the reference's validator surface
(``crates/rulemorph/src/validator.rs`` + ``v2_validator.rs``): structural
checks, duplicate/conflicting targets, ref-namespace rules, forward
``@out`` references, op existence + arity, static ``when`` typing, v2
pipe shape, and ``@item``/``@acc`` scoping.  Error codes match
``error.rs:2-74``.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import expr_ir as IR
from .errors import RuleError
from .model import Mapping, RuleFile
from .paths import Index, Key, parse_path
from .registry import OP_ARITY, is_valid_op


@dataclass
class ValidationError:
    code: str
    message: str
    path: str | None = None
    # YAML source position of `path`, when validating from source text
    # (reference: locator.rs attribution in v2_validator.rs:196-204)
    line: int | None = None
    column: int | None = None


# ops that statically never return a boolean (for when-type checks)
_NON_BOOL_OPS = {"concat", "to_string", "trim", "lowercase", "uppercase",
                 "replace", "split", "pad_start", "pad_end", "+", "-", "*",
                 "/", "add", "subtract", "multiply", "divide", "round",
                 "to_base", "date_format", "to_unixtime", "string", "int",
                 "float", "keys", "values", "entries", "len", "merge",
                 "deep_merge", "from_entries", "object_flatten",
                 "object_unflatten"}


class Validator:
    def __init__(self, rule: RuleFile):
        self.rule = rule
        self.errors: list[ValidationError] = []
        self.produced: list[list[str]] = []  # earlier target token names
        # after a branch step, @out may contain the branch rule's targets
        # (merged output, transform.rs:524) — forward-ref checks relax
        self.out_open = False

    def push(self, code: str, message: str, path: str):
        self.errors.append(ValidationError(code, message, path))

    # -- entry ---------------------------------------------------------

    def validate(self) -> list[ValidationError]:
        rule = self.rule
        if rule.version not in (1, 2):
            self.push("InvalidVersion", "version must be 1 or 2", "version")
        self._validate_input()
        if rule.steps is None and not rule.mappings:
            # MissingMappings (validator.rs:43-47)
            self.push("MissingMappings",
                      "mappings is required when steps is not set",
                      "mappings")
        if rule.steps is not None and rule.mappings:
            self.push("StepsMappingExclusive",
                      "steps and mappings are mutually exclusive", "steps")
        if rule.has_record_when:
            self._check_when(rule.record_when, "record_when")
        if rule.steps is not None:
            if rule.version != 2:
                # InvalidStep (validator.rs:54-59)
                self.push("InvalidStep",
                          "steps is only supported in version 2", "steps")
            for si, step in enumerate(rule.steps):
                spath = f"steps[{si}]"
                kinds = sum([step.mappings is not None,
                             step.has_record_when,
                             step.asserts is not None,
                             step.branch is not None])
                if kinds != 1:
                    # InvalidStep (validator.rs:76-92)
                    self.push("InvalidStep",
                              "step must contain exactly one of "
                              "mappings/record_when/asserts/branch",
                              spath)
                    continue
                if step.mappings is not None:
                    self._validate_mappings(step.mappings,
                                            f"{spath}.mappings")
                if step.has_record_when:
                    self._check_when(step.record_when,
                                     f"{spath}.record_when")
                if step.asserts is not None:
                    for ai, a in enumerate(step.asserts):
                        apath = f"{spath}.asserts[{ai}]"
                        if (not a.error.code.strip()
                                or not a.error.message.strip()):
                            # InvalidStep (validator.rs:119-126)
                            self.push(
                                "InvalidStep",
                                "asserts.error.code and message are "
                                "required", f"{apath}.error")
                        self._check_when(a.when, f"{apath}.when")
                if step.branch is not None:
                    self._check_when(step.branch.when,
                                     f"{spath}.branch.when")
                    if not step.branch.then.strip():
                        # InvalidStep (validator.rs:171-177)
                        self.push("InvalidStep", "branch.then is required",
                                  f"{spath}.branch.then")
                    if step.branch.else_ is not None \
                            and not step.branch.else_.strip():
                        # InvalidStep (validator.rs:178-186)
                        self.push("InvalidStep",
                                  "branch.else must not be empty",
                                  f"{spath}.branch.else")
                    if not step.branch.return_:
                        # only a merging branch leaves its targets in
                        # @out for later steps (validator.rs:187-189)
                        self.out_open = True
        else:
            self._validate_mappings(rule.mappings, "mappings")
        self._validate_finalize()
        return self.errors

    def _validate_finalize(self):
        """Finalize shape checks (``validate_finalize``,
        validator.rs:202-259): v2-only, sort path/order, filter must
        be a v2 condition (with @item in scope), wrap exprs."""
        fin = self.rule.finalize
        if fin is None:
            return
        if self.rule.version != 2:
            self.push("InvalidFinalize",
                      "finalize is only supported in version 2",
                      "finalize")
            return
        if fin.has_filter:
            f = fin.filter
            if isinstance(f, dict) and ("op" in f or "ref" in f
                                        or "chain" in f):
                self.push("InvalidFinalize",
                          "finalize.filter must be a v2 condition",
                          "finalize.filter")
            else:
                self._check_when(f, "finalize.filter", item_scope=True)
        if fin.sort is not None:
            try:
                parse_path(fin.sort.by, error_code="InvalidPath")
                if not fin.sort.by:
                    raise RuleError("InvalidPath", "empty path")
            except RuleError:
                self.push("InvalidPath", "finalize.sort.by is invalid",
                          "finalize.sort.by")
            if fin.sort.order not in ("asc", "desc"):
                self.push("InvalidFinalize",
                          "finalize.sort.order must be asc or desc",
                          "finalize.sort.order")
        if fin.has_wrap:
            self._check_wrap(fin.wrap, "finalize.wrap")

    def _check_wrap(self, node, path: str):
        if isinstance(node, dict):
            for k, v in node.items():
                self._check_wrap(v, f"{path}.{k}")
            return
        if isinstance(node, (list, str)):
            # out refs in wrap address the output array — skip forward-ref
            prev_open = self.out_open
            self.out_open = True
            self._check_v2_expr(node, path, locals_=set())
            self.out_open = prev_open

    def _validate_input(self):
        inp = self.rule.input
        # section presence mirrors validator.rs:427-447
        if inp.format == "csv" and inp.csv is None:
            self.push("MissingCsvSection",
                      "input.csv is required when format=csv",
                      "input.csv")
        if inp.format == "json" and inp.json is None:
            self.push("MissingJsonSection",
                      "input.json is required when format=json",
                      "input.json")
        if inp.format == "csv":
            csv = inp.csv
            if csv is not None:
                if len(csv.delimiter) != 1:
                    self.push("InvalidDelimiterLength",
                              "delimiter must be exactly 1 character",
                              "input.csv.delimiter")
                if not csv.has_header and not csv.columns:
                    self.push("MissingCsvColumns",
                              "columns required when has_header is false",
                              "input.csv.columns")

    # -- mappings ------------------------------------------------------

    def _validate_mappings(self, mappings: list[Mapping], base: str):
        for i, m in enumerate(mappings):
            mpath = f"{base}[{i}]"
            if not m.target.strip():
                # MissingTarget (validator.rs:305-311)
                self.push("MissingTarget", "mapping.target is required",
                          f"{mpath}.target")
            target_tokens = None
            try:
                tokens = parse_path(m.target, error_code="InvalidPath")
                if not tokens:
                    raise RuleError("InvalidPath", "empty target path")
                if any(isinstance(t, Index) for t in tokens):
                    self.push("InvalidPath",
                              "target must not contain array indexes",
                              f"{mpath}.target")
                else:
                    target_tokens = [t.name for t in tokens
                                     if isinstance(t, Key)]
            except RuleError:
                self.push("InvalidPath", "invalid target path",
                          f"{mpath}.target")

            n_sources = sum([m.source is not None, m.has_value, m.has_expr])
            if n_sources == 0:
                self.push("MissingMappingValue",
                          "mapping must define source, value, or expr",
                          mpath)
            elif n_sources > 1:
                self.push("SourceValueExprExclusive",
                          "source, value, and expr are mutually exclusive",
                          mpath)

            if target_tokens is not None:
                for prev in self.produced:
                    shorter, longer = sorted((prev, target_tokens), key=len)
                    if longer[:len(shorter)] == shorter:
                        self.push("DuplicateTarget",
                                  f"target {m.target!r} conflicts",
                                  f"{mpath}.target")
                        break

            if m.value_type is not None and \
                    m.value_type not in ("string", "int", "float", "bool"):
                self.push("InvalidTypeName",
                          "type must be string|int|float|bool",
                          f"{mpath}.type")

            if m.has_when:
                self._check_when(m.when, f"{mpath}.when")
            if m.has_expr:
                self._check_expr(m.expr, f"{mpath}.expr")
            if m.source is not None:
                self._check_source(m.source, f"{mpath}.source")

            if target_tokens is not None:
                self.produced.append(target_tokens)

    def _check_source(self, source: str, path: str):
        ns = source.split(".", 1)[0] if "." in source else None
        if ns is not None and ns not in ("input", "context", "out"):
            self.push("InvalidRefNamespace",
                      "source namespace must be input|context|out", path)

    # -- when typing ---------------------------------------------------

    def _check_when(self, raw, path: str, *, item_scope: bool = False):
        """Static when-type check: literals and ops that can never yield a
        boolean are flagged (``validator.rs`` InvalidWhenType; fixtures
        v09/v10/tv26_v05).  ``item_scope`` admits ``@item`` refs —
        finalize.filter evaluates per record with the record bound to
        @item (V2Scope::new().with_item(), validator.rs:222)."""
        if isinstance(raw, bool):
            return
        if isinstance(raw, (str, int, float)) and not (
                isinstance(raw, str) and (raw.startswith("@") or raw == "$"
                                          or raw.startswith("lit:"))):
            self.push("InvalidWhenType",
                      "when/record_when must evaluate to boolean", path)
            return
        if isinstance(raw, dict):
            if "ref" in raw:
                self._check_v1_expr(raw, path)
                return
            if "op" in raw:
                if raw.get("op") in _NON_BOOL_OPS:
                    self.push("InvalidWhenType",
                              "when/record_when must evaluate to boolean",
                              path)
                self._check_v1_expr(raw, path)
                return
            # v2 condition forms
            for key in ("all", "any"):
                if key in raw and isinstance(raw[key], list):
                    for j, c in enumerate(raw[key]):
                        self._check_when(c, f"{path}.{key}[{j}]",
                                         item_scope=item_scope)
                    return
            for key in ("eq", "ne", "gt", "gte", "lt", "lte", "match"):
                if key in raw:
                    if isinstance(raw[key], list):
                        for j, a in enumerate(raw[key]):
                            self._check_expr(a, f"{path}.{key}[{j}]",
                                             allow_scalar=True,
                                             item_scope=item_scope)
                    return
        if isinstance(raw, list):
            self._check_expr(raw, path, allow_scalar=True,
                             item_scope=item_scope)

    # -- expression validation ----------------------------------------

    def _check_expr(self, raw, path: str, *, allow_scalar: bool = False,
                    item_scope: bool = False, acc_scope: bool = False,
                    locals_: set | None = None):
        locals_ = locals_ if locals_ is not None else set()
        if self.rule.version >= 2 and IR.is_v2_expr(raw):
            self._check_v2_expr(raw, path, item_scope=item_scope,
                                acc_scope=acc_scope, locals_=locals_)
        else:
            self._check_v1_expr(raw, path, item_scope=item_scope,
                                acc_scope=acc_scope)

    def _check_v1_expr(self, raw, path: str, *, item_scope=False,
                       acc_scope=False):
        if isinstance(raw, dict):
            if "ref" in raw:
                self._check_v1_ref(str(raw["ref"]), path,
                                   item_scope=item_scope,
                                   acc_scope=acc_scope)
                return
            if "op" in raw:
                op = raw.get("op")
                if not is_valid_op(op):
                    self.push("UnknownOp", f"unknown op: {op}",
                              f"{path}.op")
                args = raw.get("args", [])
                child_item = item_scope or op in (
                    "map", "filter", "flat_map", "group_by", "key_by",
                    "partition", "distinct_by", "sort_by", "find",
                    "find_index", "zip_with", "reduce", "fold")
                child_acc = acc_scope or op in ("reduce", "fold")
                if op in ("lookup", "lookup_first") and len(args) >= 2:
                    if not isinstance(args[1], str):
                        self.push("InvalidArgs",
                                  "lookup key_path must be a string literal",
                                  f"{path}.args[1]")
                for j, a in enumerate(args):
                    self._check_v1_expr(a, f"{path}.args[{j}]",
                                        item_scope=child_item,
                                        acc_scope=child_acc)
                return
            if "chain" in raw:
                for j, c in enumerate(raw.get("chain") or []):
                    self._check_v1_expr(c, f"{path}.chain[{j}]",
                                        item_scope=item_scope,
                                        acc_scope=acc_scope)
                return
        # literals are fine

    def _check_v1_ref(self, ref_path: str, path: str, *, item_scope=False,
                      acc_scope=False):
        ns = ref_path.split(".", 1)[0].split("[", 1)[0]
        if ns in ("input", "context"):
            return
        if ns == "out":
            rest = ref_path[len("out"):].lstrip(".")
            self._check_out_ref(rest, path)
            return
        if ns == "item":
            if not item_scope:
                self.push("InvalidRefNamespace",
                          "item is only available within array ops", path)
            return
        if ns == "acc":
            if not acc_scope:
                self.push("InvalidRefNamespace",
                          "acc is only available within reduce/fold", path)
            return
        self.push("InvalidRefNamespace",
                  "ref namespace must be input|context|out", path)

    def _check_out_ref(self, rest: str, path: str):
        if rest == "" or self.out_open:
            return
        try:
            tokens = [t.name for t in parse_path(rest) if isinstance(t, Key)]
        except RuleError:
            self.push("InvalidPath", "invalid out ref path", path)
            return
        for prev in self.produced:
            shorter, longer = sorted((prev, tokens), key=len)
            if longer[:len(shorter)] == shorter:
                return
        self.push("ForwardOutReference",
                  f"@out.{rest} is not produced by an earlier mapping",
                  path)

    def _check_v2_expr(self, raw, path: str, *, item_scope=False,
                       acc_scope=False, locals_=frozenset()):
        if isinstance(raw, list):
            if not raw:
                self.push("InvalidExprShape", "pipe array cannot be empty",
                          path)
                return
            try:
                pipe = IR.parse_pipe(raw)
            except RuleError:
                self.push("InvalidExprShape", "invalid pipe", path)
                return
            self._check_pipe(pipe, raw, path, item_scope=item_scope,
                             acc_scope=acc_scope, locals_=set(locals_))
            return
        if isinstance(raw, str):
            ref = IR.parse_ref(raw)
            if ref is not None:
                self._check_v2_ref(ref, path, item_scope=item_scope,
                                   acc_scope=acc_scope, locals_=locals_)
            elif raw.startswith("@"):
                self.push("InvalidRefNamespace",
                          f"invalid v2 reference: {raw}", path)

    def _check_pipe(self, pipe: IR.Pipe, raw_list, path: str, *,
                    item_scope, acc_scope, locals_):
        if isinstance(pipe.start, IR.StartRef):
            self._check_v2_ref(pipe.start.ref, f"{path}[0]",
                               item_scope=item_scope, acc_scope=acc_scope,
                               locals_=locals_)
        offset = 1 if len(pipe.steps) != len(raw_list) else 0
        for j, step in enumerate(pipe.steps):
            spath = f"{path}[{j + offset}]"
            self._check_step(step, spath, item_scope=item_scope,
                             acc_scope=acc_scope, locals_=locals_)

    def _check_step(self, step, path: str, *, item_scope, acc_scope,
                    locals_):
        if isinstance(step, IR.OpStep):
            if not is_valid_op(step.op):
                self.push("UnknownOp", f"unknown op: {step.op}", path)
                return
            lo, hi = OP_ARITY[step.op]
            n = len(step.args)
            if n < lo - 1 or (hi is not None and n > hi):
                self.push("InvalidArgs",
                          f"{step.op} arg count {n} out of range", path)
            from .registry import ITEM_SCOPED_FIRST_ARG
            for j, arg in enumerate(step.args):
                scoped = (
                    (j == 0 and step.op in ITEM_SCOPED_FIRST_ARG) or
                    (step.op == "reduce" and j == 0) or
                    (step.op == "fold" and j == 1) or
                    (step.op == "zip_with" and j == n - 1))
                child_item = item_scope or scoped
                child_acc = acc_scope or (
                    scoped and step.op in ("reduce", "fold"))
                self._check_pipe_like(arg, f"{path}.args[{j}]",
                                      item_scope=child_item,
                                      acc_scope=child_acc,
                                      locals_=locals_)
            return
        if isinstance(step, IR.LetStep):
            for name, sub in step.bindings:
                self._check_pipe_like(sub, f"{path}.let.{name}",
                                      item_scope=item_scope,
                                      acc_scope=acc_scope, locals_=locals_)
                locals_.add(name)
            return
        if isinstance(step, IR.IfStep):
            self._check_pipe_like(step.then_branch, f"{path}.then",
                                  item_scope=item_scope,
                                  acc_scope=acc_scope, locals_=locals_)
            if step.else_branch is not None:
                self._check_pipe_like(step.else_branch, f"{path}.else",
                                      item_scope=item_scope,
                                      acc_scope=acc_scope, locals_=locals_)
            return
        if isinstance(step, IR.MapStep):
            for j, s in enumerate(step.steps):
                self._check_step(s, f"{path}.map[{j}]", item_scope=True,
                                 acc_scope=acc_scope, locals_=locals_)
            return
        if isinstance(step, IR.RefStep):
            self._check_v2_ref(step.ref, path, item_scope=item_scope,
                               acc_scope=acc_scope, locals_=locals_)

    def _check_pipe_like(self, pipe: IR.Pipe, path: str, *, item_scope,
                         acc_scope, locals_):
        if isinstance(pipe.start, IR.StartRef):
            self._check_v2_ref(pipe.start.ref, path, item_scope=item_scope,
                               acc_scope=acc_scope, locals_=locals_)
        inner_locals = set(locals_)
        for j, step in enumerate(pipe.steps):
            self._check_step(step, f"{path}[{j}]", item_scope=item_scope,
                             acc_scope=acc_scope, locals_=inner_locals)

    def _check_v2_ref(self, ref: IR.Ref, path: str, *, item_scope,
                      acc_scope, locals_):
        if ref.namespace in ("input", "context"):
            return
        if ref.namespace == "out":
            self._check_out_ref(ref.path, path)
            return
        if ref.namespace == "item":
            if not item_scope:
                self.push("InvalidItemRef",
                          "@item is only available in map/filter ops", path)
            return
        if ref.namespace == "acc":
            if not acc_scope:
                self.push("InvalidAccRef",
                          "@acc is only available in reduce/fold", path)
            return
        if ref.namespace == "local":
            if ref.local_name not in locals_:
                self.push("UndefinedVariable",
                          f"undefined variable: @{ref.local_name}", path)


def validate_rule(rule: RuleFile) -> list[ValidationError]:
    return Validator(rule).validate()


@dataclass
class RuleWarning:
    """Non-fatal lint finding (reference: rulemorph_mcp/src/main.rs:4617
    ``RuleWarning`` + ``collect_rule_warnings``:4623-4705)."""
    code: str
    message: str
    path: str | None = None


_DATE_FORMAT_MSG = ("date_format without input_format relies on heuristic "
                    "parsing; consider providing input_format.")
_TO_UNIXTIME_MSG = ("to_unixtime relies on heuristic date parsing; consider "
                    "normalizing with date_format + input_format.")


def _looks_like_timezone(v) -> bool:
    if not isinstance(v, str):
        return False
    if v.lower() == "utc" or v == "Z":
        return True
    return v[:1] in ("+", "-")


def _op_warnings(node: dict, path: str, chain_step: bool,
                 out: list[RuleWarning]) -> None:
    op = node.get("op")
    args = node.get("args") or []
    if not isinstance(args, list):
        args = [args]
    if op == "date_format":
        # as a chain step the piped value occupies arg slot 0, so the
        # input_format position shifts from args[2] to args[1]
        idx = 1 if chain_step else 2
        if len(args) <= idx:
            out.append(RuleWarning("date_format_missing_input_format",
                                   _DATE_FORMAT_MSG, f"{path}.args"))
        elif _looks_like_timezone(args[idx]):
            out.append(RuleWarning("date_format_missing_input_format",
                                   _DATE_FORMAT_MSG, f"{path}.args[{idx}]"))
    elif op == "to_unixtime":
        out.append(RuleWarning("to_unixtime_auto_parse",
                               _TO_UNIXTIME_MSG, path))
    for i, a in enumerate(args):
        _expr_warnings(a, f"{path}.args[{i}]", out)


def _expr_warnings(node, path: str, out: list[RuleWarning]) -> None:
    # v1 explicit forms only ({ref}/{op,args}/{chain}); plain scalars,
    # lists (v2 pipes) and other shapes are literals for this walk,
    # matching the reference's untagged Expr deserialization order
    if not isinstance(node, dict):
        return
    if "ref" in node:
        return
    if "op" in node:
        _op_warnings(node, path, chain_step=False, out=out)
        return
    if "chain" in node:
        steps = node.get("chain")
        if not isinstance(steps, list):
            return
        for i, step in enumerate(steps):
            spath = f"{path}.chain[{i}]"
            if (i > 0 and isinstance(step, dict) and "op" in step
                    and "ref" not in step):
                _op_warnings(step, spath, chain_step=True, out=out)
            else:
                _expr_warnings(step, spath, out)


_PIPE_LITERAL_MSG = (
    "pipe starts with an op-shaped object but has more elements, so the "
    "object is a literal value, not an op call; make it the only "
    "element or pipe from a value first.")

# predicate-taking array ops and the comparison op names (incl. aliases,
# docs/rules_spec_en.md:341-347) whose lone-dict shape is the footgun
_PREDICATE_OPS = ("filter", "partition", "find", "find_index")
_COMPARISON_OPS = frozenset((
    "==", "!=", ">", ">=", "<", "<=", "~=",
    "eq", "ne", "gt", "gte", "lt", "lte", "match"))
_PREDICATE_LITERAL_MSG = (
    "%s predicate is a lone object whose key is a comparison op; the "
    "reference parses a lone object as a LITERAL value, which fails "
    "with 'value must be a boolean' at runtime on any non-empty array. "
    "Write the predicate as a pipe: [\"@item...\", {%s: [...]}].")


def _predicate_literal_warnings(op: str, args, pred_path: str,
                                out: list[RuleWarning]) -> None:
    """Warn when a filter/partition/find/find_index predicate arg is a
    lone condition-shaped dict (single comparison-op key).  The
    reference grammar makes a lone object a literal (``v2_parser.rs:
    438-482``), so the rule compiles but errors only when a non-empty
    array is evaluated — a warning, not an error, because empty-array
    rows never trigger it."""
    if op not in _PREDICATE_OPS or not isinstance(args, list) or not args:
        return
    pred = args[0]
    if (isinstance(pred, dict) and len(pred) == 1
            and next(iter(pred)) in _COMPARISON_OPS):
        key = next(iter(pred))
        out.append(RuleWarning(
            "predicate_literal_condition_object",
            _PREDICATE_LITERAL_MSG % (op, key), pred_path))


def _v2_pipe_warnings(node, path: str, out: list[RuleWarning]) -> None:
    """Lint a v2 expr position for the literal-object-start footgun."""
    from .expr_ir import _looks_like_step
    if isinstance(node, dict):
        _v2_step_warnings(node, path, out)
        return
    if not isinstance(node, list) or not node:
        return
    if len(node) > 1 and _looks_like_step(node[0]):
        out.append(RuleWarning("v2_pipe_literal_object_start",
                               _PIPE_LITERAL_MSG, path))
    for i, el in enumerate(node):
        if i == 0 and len(node) > 1:
            continue  # start position: literal/ref, not a step
        _v2_step_warnings(el, f"{path}[{i}]", out)


def _v2_step_warnings(step, path: str, out: list[RuleWarning]) -> None:
    if not isinstance(step, dict):
        return
    if isinstance(step.get("op"), str):
        args = step.get("args")
        if isinstance(args, list):
            _predicate_literal_warnings(step["op"], args,
                                        f"{path}.args[0]", out)
            for i, a in enumerate(args):
                _v2_pipe_warnings(a, f"{path}.args[{i}]", out)
        return
    if isinstance(step.get("let"), dict):
        for k, v in step["let"].items():
            _v2_pipe_warnings(v, f"{path}.let.{k}", out)
        return
    if "if" in step:
        iv = step["if"]
        if isinstance(iv, dict) and ("cond" in iv or "then" in iv):
            parts = (iv.get("cond"), iv.get("then"), iv.get("else"))
        else:
            parts = (iv, step.get("then"), step.get("else"))
        for sub, lbl in zip(parts, ("cond", "then", "else")):
            if sub is not None:
                _v2_pipe_warnings(sub, f"{path}.{lbl}", out)
        return
    if isinstance(step.get("map"), list):
        for i, s in enumerate(step["map"]):
            _v2_step_warnings(s, f"{path}.map[{i}]", out)
        return
    if len(step) == 1:
        (k, v), = step.items()
        if isinstance(v, list):
            _predicate_literal_warnings(k, v, f"{path}.{k}[0]", out)
            for i, a in enumerate(v):
                _v2_pipe_warnings(a, f"{path}.{k}[{i}]", out)
        else:
            _v2_pipe_warnings(v, f"{path}.{k}", out)


def collect_rule_warnings(rule: RuleFile) -> list[RuleWarning]:
    """Heuristic-parsing lint over v1 expressions (``date_format``
    without an explicit input_format, ``to_unixtime`` auto-parsing —
    walks record_when and top-level mappings only, as the reference
    does), plus an extension lint for v2 rules: the literal-object-
    start pipe footgun."""
    out: list[RuleWarning] = []
    if rule.has_record_when:
        _expr_warnings(rule.record_when, "record_when", out)
        if rule.version == 2:
            _v2_pipe_warnings(rule.record_when, "record_when", out)
    for i, m in enumerate(rule.mappings or []):
        base = f"mappings[{i}]"
        if m.has_expr:
            _expr_warnings(m.expr, f"{base}.expr", out)
            if rule.version == 2:
                _v2_pipe_warnings(m.expr, f"{base}.expr", out)
        if m.has_when:
            _expr_warnings(m.when, f"{base}.when", out)
            if rule.version == 2:
                _v2_pipe_warnings(m.when, f"{base}.when", out)
    if rule.version == 2:
        for si, step in enumerate(rule.steps or []):
            for mi, m in enumerate(step.mappings or []):
                base = f"steps[{si}].mappings[{mi}]"
                if m.has_expr:
                    _v2_pipe_warnings(m.expr, f"{base}.expr", out)
                if m.has_when:
                    _v2_pipe_warnings(m.when, f"{base}.when", out)
    return out


def validate_rule_source(rule: RuleFile,
                         source: str) -> list[ValidationError]:
    """Validate with YAML line/column attribution on each error
    (reference: ``validate_rule_file_with_source``, validator.rs:18-21).
    """
    from .locator import YamlLocator
    locator = YamlLocator(source)
    errors = Validator(rule).validate()
    for e in errors:
        loc = locator.location_for(e.path)
        if loc is not None:
            e.line, e.column = loc
    return errors
