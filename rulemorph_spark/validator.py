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


# v1 arity in EFFECTIVE operand counts (validator.rs:1307-1580
# ``validate_op`` / :876-1060 ``validate_chain_op`` — both enforce the
# same range; a standalone op's effective count is ``len(args)``, a
# chain op's is ``len(args) + 1`` for the implicit pipe value).  Ops
# absent here (concat/coalesce/first/last/casts/named aliases) get no
# v1 per-op arity check, matching the reference's default match arm.
_V1_ARITY: dict[str, tuple[int, int | None]] = {}
for _op in ("trim", "lowercase", "uppercase", "to_string", "len", "not",
            "keys", "values", "entries", "object_flatten",
            "object_unflatten", "unzip", "unique", "sum", "avg", "min",
            "max"):
    _V1_ARITY[_op] = (1, 1)
for _op in ("split", "get", "pick", "omit", "map", "filter", "flat_map",
            "group_by", "key_by", "partition", "distinct_by", "find",
            "find_index", "take", "drop", "chunk", "index_of", "contains",
            "reduce", "-", "/", "to_base",
            "==", "!=", "<", "<=", ">", ">=", "~="):
    _V1_ARITY[_op] = (2, 2)
for _op in ("pad_start", "pad_end", "slice", "sort_by"):
    _V1_ARITY[_op] = (2, 3)
for _op in ("merge", "deep_merge", "zip", "+", "*", "and", "or"):
    _V1_ARITY[_op] = (2, None)
for _op in ("from_entries", "flatten", "round"):
    _V1_ARITY[_op] = (1, 2)
_V1_ARITY["replace"] = (3, 4)
_V1_ARITY["fold"] = (3, 3)
_V1_ARITY["zip_with"] = (3, None)
_V1_ARITY["date_format"] = (2, 4)
_V1_ARITY["to_unixtime"] = (1, 3)

_COUNT_WORDS = {1: "one", 2: "two", 3: "three", 4: "four"}


def _v1_arity_message(lo: int, hi: int | None) -> str:
    """The reference's InvalidArgs wording per range shape
    (validator.rs:1331-1580)."""
    if hi is None:
        return f"expr.args must contain at least {_COUNT_WORDS[lo]} items"
    if lo == hi:
        plural = "item" if lo == 1 else "items"
        return f"expr.args must contain exactly {_COUNT_WORDS[lo]} {plural}"
    if hi == lo + 1:
        return (f"expr.args must contain {_COUNT_WORDS[lo]} or "
                f"{_COUNT_WORDS[hi]} items")
    return (f"expr.args must contain {_COUNT_WORDS[lo]} to "
            f"{_COUNT_WORDS[hi]} items")


# v1 when-typing (``bool_expr_kind``, validator.rs:747-836): ops that
# statically NEVER return a boolean vs ops that always do; everything
# else (find/first/last/casts/reduce/fold/unknown) is Maybe.  coalesce
# is recursive: NotBool if any arg is, Bool only if all args are.
_V1_NOT_BOOL_OPS = {
    "concat", "to_string", "trim", "lowercase", "uppercase", "replace",
    "split", "pad_start", "pad_end", "lookup", "lookup_first", "merge",
    "deep_merge", "get", "pick", "omit", "keys", "values", "entries",
    "len", "from_entries", "object_flatten", "object_unflatten", "map",
    "filter", "flat_map", "flatten", "take", "drop", "slice", "chunk",
    "zip", "zip_with", "unzip", "group_by", "key_by", "partition",
    "unique", "distinct_by", "sort_by", "find_index", "index_of", "sum",
    "avg", "min", "max", "+", "-", "*", "/", "round", "to_base",
    "date_format", "to_unixtime"}
_V1_BOOL_OPS = {"and", "or", "not", "contains",
                "==", "!=", "<", "<=", ">", ">=", "~="}

# v2 result-type inference for expr conditions (``infer_v2_expr_type``
# + ``infer_op_result_type``, v2_validator.rs:241-310): only these op
# families have a known non-bool result; everything else is Unknown
# and passes the when-type check.
_V2_STRING_OPS = {"trim", "lowercase", "uppercase", "concat", "to_string"}
_V2_NUMBER_OPS = {"+", "-", "*", "/", "add", "subtract", "multiply",
                  "divide"}


def _v2_pipe_kind(pipe: "IR.Pipe") -> str:
    """'bool' | 'unknown' | 'notbool' result kind of a v2 pipe — the
    last step decides (``infer_pipe_type``, v2_validator.rs:249-255)."""
    if isinstance(pipe.start, IR.StartLiteral):
        kind = "bool" if isinstance(pipe.start.value, bool) else "notbool"
    else:
        kind = "unknown"
    for step in pipe.steps:
        if isinstance(step, IR.OpStep):
            if (step.op in _V2_STRING_OPS or step.op in _V2_NUMBER_OPS
                    or step.op == "lookup"):
                kind = "notbool"
            else:
                kind = "unknown"
        elif isinstance(step, IR.MapStep):
            kind = "notbool"  # arrays are definitely not bool
        else:
            kind = "unknown"
    return kind


def _v1_bool_kind(raw) -> str:
    """'bool' | 'maybe' | 'notbool' for a raw v1 expr node."""
    if isinstance(raw, dict):
        if "ref" in raw:
            return "maybe"
        if "op" in raw:
            op = raw.get("op")
            if op in _V1_NOT_BOOL_OPS:
                return "notbool"
            if op in _V1_BOOL_OPS:
                return "bool"
            if op == "coalesce":
                saw_maybe = False
                for a in raw.get("args") or []:
                    kind = _v1_bool_kind(a)
                    if kind == "notbool":
                        return "notbool"
                    if kind == "maybe":
                        saw_maybe = True
                return "maybe" if saw_maybe else "bool"
            return "maybe"
        if "chain" in raw:
            return "maybe"
    if isinstance(raw, bool):
        return "bool"
    return "notbool"  # non-bool literal (incl. null)


class Validator:
    def __init__(self, rule: RuleFile):
        self.rule = rule
        self.errors: list[ValidationError] = []
        self.produced: list[list[str]] = []  # earlier target token names
        # after a branch step, @out may contain the branch rule's targets
        # (merged output, transform.rs:524) — forward-ref checks relax
        self.out_open = False
        # (target, @out dep paths) per v2 mapping expr, for cycle
        # detection (validator.rs:555-586); deps are collected only
        # while out_open is false — a merging branch makes the graph
        # unreliable (validator.rs:580-583)
        self.v2_deps: list[tuple[str, set[str]]] = []
        self._collect_deps: set[str] | None = None

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
            # cycle check spans every step's mappings (validator.rs:195)
            self._check_cycles("steps")
        else:
            self._validate_mappings(rule.mappings, "mappings")
            if rule.version == 2:
                # (validator.rs:518-520)
                self._check_cycles("mappings")
        self._validate_finalize()
        return self.errors

    def _check_cycles(self, base: str):
        """Cyclic @out dependencies among v2 mapping targets
        (``validate_no_cyclic_dependencies``, v2_validator.rs:958-980).
        Matches the reference DFS exactly, including its quirk of not
        unwinding ``rec_stack`` on the found-a-cycle early return — so
        every later target that can reach an already-found cycle is
        also reported."""
        if not self.v2_deps:
            return
        graph: dict[str, set[str]] = dict(self.v2_deps)  # last dup wins
        visited: set[str] = set()
        stack: set[str] = set()

        def has_cycle(node: str) -> bool:
            if node in stack:
                return True
            if node in visited:
                return False
            visited.add(node)
            stack.add(node)
            for dep in graph.get(node, ()):
                if has_cycle(dep):
                    return True
            stack.discard(node)
            return False

        for target, _ in self.v2_deps:
            if has_cycle(target):
                self.push("CyclicDependency",
                          "cyclic dependency detected involving target: "
                          f"{target}", f"{base}.{target}")

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
                # only v2 exprs contribute to the @out dependency graph
                # (validator.rs:584-586); when/source never do
                collect = (self.rule.version >= 2 and IR.is_v2_expr(m.expr)
                           and not self.out_open)
                if collect:
                    self._collect_deps = set()
                self._check_expr(m.expr, f"{mpath}.expr")
                if collect:
                    if self._collect_deps:
                        self.v2_deps.append((m.target, self._collect_deps))
                    self._collect_deps = None
            if m.source is not None:
                self._check_source(m.source, f"{mpath}.source")

            if target_tokens is not None:
                self.produced.append(target_tokens)

    def _check_source(self, source: str, path: str):
        """``validate_source`` (validator.rs:654-694): dotted sources
        must be namespaced input|context|out with a non-empty tail;
        dotless sources are input-relative; the path must parse; out
        sources are forward-checked."""
        if "." in source:
            ns, _, rest = source.partition(".")
            if not rest or ns not in ("input", "context", "out"):
                self.push("InvalidRefNamespace",
                          "ref namespace must be input|context|out", path)
                return
        elif not source:
            self.push("InvalidRefNamespace",
                      "ref namespace must be input|context|out", path)
            return
        else:
            ns, rest = "input", source
        if ns == "out":
            self._check_out_ref(rest, path)
            return
        try:
            parse_path(rest, error_code="InvalidPath")
        except RuleError:
            self.push("InvalidPath", "path is invalid", path)

    # -- when typing ---------------------------------------------------

    def _check_when(self, raw, path: str, *, item_scope: bool = False):
        """Static when-type check: literals and ops that can never yield a
        boolean are flagged (``validator.rs`` InvalidWhenType; fixtures
        v09/v10/tv26_v05).  ``item_scope`` admits ``@item`` refs —
        finalize.filter evaluates per record with the record bound to
        @item (V2Scope::new().with_item(), validator.rs:222)."""
        if isinstance(raw, bool):
            return
        if isinstance(raw, (str, int, float)):
            if (self.rule.version >= 2 and isinstance(raw, str)
                    and (raw.startswith("@") or raw == "$")):
                # Unknown-typed v2 expr condition — passes the type
                # check, but the ref itself still validates
                self._check_v2_expr(raw, path, item_scope=item_scope)
                return
            # non-bool literal: v1 strings always (bool_expr_kind:
            # Literal → NotBool); v2 ``lit:`` escapes are String-typed
            # expr conditions (infer_json_type → is_definitely_not_bool)
            self.push("InvalidWhenType",
                      "when/record_when must evaluate to boolean", path)
            return
        if isinstance(raw, dict):
            if "ref" in raw or "op" in raw or "chain" in raw:
                if _v1_bool_kind(raw) == "notbool":
                    self.push("InvalidWhenType",
                              "when/record_when must evaluate to boolean",
                              path)
                self._check_v1_expr(raw, path)
                return
            if self.rule.version < 2:
                # v1 has no condition dicts: a plain object is a
                # non-bool literal (validate_when_expr)
                self.push("InvalidWhenType",
                          "when/record_when must evaluate to boolean",
                          path)
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
                        if len(raw[key]) != 2:
                            # (validate_v2_comparison,
                            # v2_validator.rs:641-650)
                            self.push(
                                "InvalidArgs",
                                "comparison requires exactly 2 "
                                f"arguments, got {len(raw[key])}", path)
                        for j, a in enumerate(raw[key]):
                            self._check_expr(a, f"{path}.{key}[{j}]",
                                             allow_scalar=True,
                                             item_scope=item_scope)
                    return
            # any other object is a literal-object expr condition —
            # Object is definitely not bool
            self.push("InvalidWhenType",
                      "condition must evaluate to boolean", path)
            return
        if isinstance(raw, list):
            if self.rule.version < 2:
                # v1: a literal array is never a boolean
                self.push("InvalidWhenType",
                          "when/record_when must evaluate to boolean",
                          path)
                return
            self._check_expr(raw, path, allow_scalar=True,
                             item_scope=item_scope)
            if raw:
                try:
                    pipe = IR.parse_pipe(raw)
                except RuleError:
                    return
                if _v2_pipe_kind(pipe) == "notbool":
                    # expr-condition typing (validate_v2_condition,
                    # v2_validator.rs:621-631)
                    self.push("InvalidWhenType",
                              "condition must evaluate to boolean", path)

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
                self._check_v1_op(raw, path, chain_ctx=False,
                                  item_scope=item_scope,
                                  acc_scope=acc_scope)
                return
            if "chain" in raw:
                chain = raw.get("chain")
                if not isinstance(chain, list) or not chain:
                    # InvalidExprShape (validator.rs:845-851)
                    self.push("InvalidExprShape",
                              "expr.chain must be a non-empty array",
                              f"{path}.chain")
                    return
                for j, c in enumerate(chain):
                    cpath = f"{path}.chain[{j}]"
                    if j == 0:
                        self._check_v1_expr(c, cpath,
                                            item_scope=item_scope,
                                            acc_scope=acc_scope)
                    elif isinstance(c, dict) and "op" in c:
                        self._check_v1_op(c, cpath, chain_ctx=True,
                                          item_scope=item_scope,
                                          acc_scope=acc_scope)
                    else:
                        # InvalidExprShape (validator.rs:864-870)
                        self.push("InvalidExprShape",
                                  "expr.chain items after first must be op",
                                  cpath)
                return
        # literals are fine

    def _check_v1_op(self, raw: dict, path: str, *, chain_ctx: bool,
                     item_scope: bool, acc_scope: bool):
        """One v1 op node (``validate_op`` validator.rs:1307 standalone /
        ``validate_chain_op`` :876 in chain position).  Both enforce the
        same per-op range on the EFFECTIVE operand count — a chain op's
        implicit pipe value counts as one operand."""
        op = raw.get("op")
        if not is_valid_op(op):
            self.push("UnknownOp", "expr.op is not supported",
                      f"{path}.op")
        args = raw.get("args", [])
        if not isinstance(args, list):
            args = []
        if not chain_ctx and not args:
            # standalone ops always need operands (validator.rs:1322-1328)
            self.push("InvalidArgs", "expr.args must be a non-empty array",
                      f"{path}.args")
        if op in ("lookup", "lookup_first"):
            self._check_v1_lookup_args(args, path, chain_ctx=chain_ctx)
        elif op in _V1_ARITY:
            lo, hi = _V1_ARITY[op]
            effective = len(args) + (1 if chain_ctx else 0)
            if effective < lo or (hi is not None and effective > hi):
                self.push("InvalidArgs", _v1_arity_message(lo, hi),
                          f"{path}.args")
        child_item = item_scope or op in (
            "map", "filter", "flat_map", "group_by", "key_by",
            "partition", "distinct_by", "sort_by", "find",
            "find_index", "zip_with", "reduce", "fold")
        child_acc = acc_scope or op in ("reduce", "fold")
        for j, a in enumerate(args):
            self._check_v1_expr(a, f"{path}.args[{j}]",
                                item_scope=child_item,
                                acc_scope=child_acc)

    def _check_v1_lookup_args(self, args: list, path: str, *,
                              chain_ctx: bool):
        """``validate_lookup_args`` (validator.rs:1582-1625) /
        ``validate_lookup_args_chain`` (:1627-1670): arity, then the
        key/output path args must be non-empty string literals that
        parse as paths.  Positions shift by one in chain form (the
        collection comes from the pipe value)."""
        lo, hi = (2, 3) if chain_ctx else (3, 4)
        if not (lo <= len(args) <= hi):
            self.push(
                "InvalidArgs",
                "lookup args must be [key_path, match_value, output_path?]"
                " in chain" if chain_ctx else
                "lookup args must be "
                "[collection, key_path, match_value, output_path?]",
                f"{path}.args")
            return
        key_idx = 0 if chain_ctx else 1
        positions = [(key_idx, "key_path")]
        if len(args) == hi:
            positions.append((hi - 1, "output_path"))
        for idx, name in positions:
            arg = args[idx]
            if not isinstance(arg, str) or not arg:
                self.push("InvalidArgs",
                          f"lookup {name} must be a non-empty string "
                          "literal", f"{path}.args[{idx}]")
                continue
            try:
                parse_path(arg, error_code="InvalidPath")
            except RuleError:
                self.push("InvalidArgs", f"lookup {name} is invalid",
                          f"{path}.args[{idx}]")

    def _check_v1_ref(self, ref_path: str, path: str, *, item_scope=False,
                      acc_scope=False):
        """``validate_ref`` (validator.rs:1593-1612 parse_ref + the
        namespace match): a v1 ref must be ``ns.path`` with a non-empty
        path, the path must parse, and item/acc refs are scope-gated
        AND must start with value/index (item) or value (acc)."""
        ns, sep, rest = ref_path.partition(".")
        if not sep or not rest or ns not in ("input", "context", "out",
                                             "item", "acc"):
            self.push("InvalidRefNamespace",
                      "ref namespace must be input|context|out|item|acc",
                      path)
            return
        if ns == "item" and not item_scope:
            self.push("InvalidRefNamespace",
                      "item refs are only allowed inside array ops", path)
            return
        if ns == "acc" and not acc_scope:
            self.push("InvalidRefNamespace",
                      "acc refs are only allowed inside reduce/fold ops",
                      path)
            return
        if ns == "out":
            self._check_out_ref(rest, path)
            return
        try:
            tokens = parse_path(rest, error_code="InvalidPath")
        except RuleError:
            self.push("InvalidPath", "path is invalid", path)
            return
        if ns == "item":
            first = tokens[0] if tokens else None
            if not (isinstance(first, Key)
                    and first.name in ("value", "index")):
                self.push("InvalidPath",
                          "item ref must start with value or index", path)
        elif ns == "acc":
            first = tokens[0] if tokens else None
            if not (isinstance(first, Key) and first.name == "value"):
                self.push("InvalidPath",
                          "acc ref must start with value", path)

    def _check_out_ref(self, rest: str, path: str):
        if self._collect_deps is not None and rest:
            self._collect_deps.add(rest)
        if rest == "":
            return
        # path syntax is checked even when forward refs are allowed
        # (validate_v2_ref runs validate_path_syntax unconditionally)
        try:
            tokens = [t.name for t in parse_path(rest) if isinstance(t, Key)]
        except RuleError:
            self.push("InvalidPath", "invalid out ref path", path)
            return
        if self.out_open:
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
            # exact pipe-context range (validate_op_args_count,
            # v2_validator.rs:784-808) — v2 steps never hoist an arg
            if n < lo or (hi is not None and n > hi):
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
            # (validate_v2_if_step, v2_validator.rs: cond is validated
            # with the same scope, then/else in child scopes)
            self._check_v2_condition(step.cond, f"{path}.if.cond",
                                     item_scope=item_scope,
                                     acc_scope=acc_scope, locals_=locals_)
            self._check_pipe_like(step.then_branch, f"{path}.if.then",
                                  item_scope=item_scope,
                                  acc_scope=acc_scope,
                                  locals_=set(locals_))
            if step.else_branch is not None:
                self._check_pipe_like(step.else_branch, f"{path}.if.else",
                                      item_scope=item_scope,
                                      acc_scope=acc_scope,
                                      locals_=set(locals_))
            return
        if isinstance(step, IR.MapStep):
            for j, s in enumerate(step.steps):
                self._check_step(s, f"{path}.map[{j}]", item_scope=True,
                                 acc_scope=acc_scope, locals_=locals_)
            return
        if isinstance(step, IR.RefStep):
            self._check_v2_ref(step.ref, path, item_scope=item_scope,
                               acc_scope=acc_scope, locals_=locals_)

    def _check_v2_condition(self, cond, path: str, *, item_scope,
                            acc_scope, locals_):
        """``validate_v2_condition`` (v2_validator.rs:586-633): all/any
        recurse, comparisons need exactly 2 args, expr conditions are
        type-checked against ``is_definitely_not_bool``."""
        if isinstance(cond, IR.CondAll):
            for i, c in enumerate(cond.conditions):
                self._check_v2_condition(c, f"{path}.all[{i}]",
                                         item_scope=item_scope,
                                         acc_scope=acc_scope,
                                         locals_=locals_)
            return
        if isinstance(cond, IR.CondAny):
            for i, c in enumerate(cond.conditions):
                self._check_v2_condition(c, f"{path}.any[{i}]",
                                         item_scope=item_scope,
                                         acc_scope=acc_scope,
                                         locals_=locals_)
            return
        if isinstance(cond, IR.CondCompare):
            if len(cond.args) != 2:
                self.push("InvalidArgs",
                          "comparison requires exactly 2 arguments, got "
                          f"{len(cond.args)}", path)
            for j, arg in enumerate(cond.args):
                self._check_pipe_like(arg, f"{path}.args[{j}]",
                                      item_scope=item_scope,
                                      acc_scope=acc_scope, locals_=locals_)
            return
        if isinstance(cond, IR.CondExpr):
            self._check_pipe_like(cond.expr, path, item_scope=item_scope,
                                  acc_scope=acc_scope, locals_=locals_)
            if _v2_pipe_kind(cond.expr) == "notbool":
                self.push("InvalidWhenType",
                          "condition must evaluate to boolean", path)

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
        """Mirrors ``validate_v2_ref`` (v2_validator.rs:699-748): every
        namespace's subpath must parse (``validate_path_syntax``), with
        ``@item.index``/``@item.value`` admitted as-is."""
        if ref.namespace in ("input", "context"):
            self._check_path_syntax(ref.path, path)
            return
        if ref.namespace == "out":
            self._check_out_ref(ref.path, path)
            return
        if ref.namespace == "item":
            if not item_scope:
                self.push("InvalidItemRef",
                          "@item is only available in map/filter ops", path)
            elif ref.path not in ("", "index", "value"):
                self._check_path_syntax(ref.path, path)
            return
        if ref.namespace == "acc":
            if not acc_scope:
                self.push("InvalidAccRef",
                          "@acc is only available in reduce/fold", path)
            else:
                self._check_path_syntax(ref.path, path)
            return
        if ref.namespace == "local":
            if ref.local_name not in locals_:
                self.push("UndefinedVariable",
                          f"undefined variable: @{ref.local_name}", path)

    def _check_path_syntax(self, ref_path: str, path: str):
        if not ref_path:
            return  # empty path addresses the whole namespace
        try:
            parse_path(ref_path, error_code="InvalidPath")
        except RuleError:
            self.push("InvalidPath", "invalid path syntax", path)


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
