"""Rule compiler: ``RuleFile`` → a DataFrame transformation.

The reference interprets rules per record (``transform.rs:363-531``); here
the whole rule becomes ONE Spark projection:

- every mapping compiles to a variant Column (SQL NULL = key omitted)
- ``@out`` references resolve to previously compiled mapping Columns
  directly (no re-evaluation — the reference's validator guarantees
  acyclicity, ``v2_validator.rs:958-1007``)
- ``record_when`` / step ``record_when`` become a single boolean keep
  Column → one ``df.filter``
- ``branch`` compiles the referenced rule files up front and routes with
  ``F.when`` (static dispatch of the closed rule set)
- output objects assemble via ``to_json(struct(...))``, which drops
  missing (SQL NULL) keys and keeps explicit nulls — the tri-state
  collapses exactly at the output boundary

Result: Catalyst sees one wide projection + one filter per rule, fully
whole-stage-codegen-able, instead of a per-record interpreter loop.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import RuleError
from ..expr_ir import (is_v2_expr, parse_condition, parse_expr,
                       v1_expr_to_pipe)
from ..model import Mapping, RuleFile, load_rule_file
from ..paths import Key, parse_path
from . import variant as V
from .core import (Scope, compile_condition, compile_pipe, lenient_errors,
                   rule_version)

# ensure op modules register themselves
from . import ops_scalar  # noqa: F401
from . import ops_array  # noqa: F401
from . import ops_object  # noqa: F401
from . import ops_lookup  # noqa: F401
from . import ops_date  # noqa: F401


class OutTree:
    """Static tree of output targets → compiled Columns."""

    def __init__(self):
        self.children: dict[str, "OutTree | Column"] = {}

    def set(self, tokens: list[str], col: Column, path: str):
        node = self
        for t in tokens[:-1]:
            child = node.children.get(t)
            if child is None:
                child = OutTree()
                node.children[t] = child
            elif not isinstance(child, OutTree):
                raise RuleError("target_error",
                                f"intermediate path {t!r} is not an object",
                                path)
            node = child
        leaf = tokens[-1]
        if isinstance(node.children.get(leaf), OutTree):
            raise RuleError("duplicate_target",
                            f"target {'.'.join(tokens)!r} conflicts", path)
        node.children[leaf] = col

    def get(self, tokens: list[str]):
        node = self
        for t in tokens:
            if not isinstance(node, OutTree):
                return None
            node = node.children.get(t)
        return node

    def presence(self) -> Column:
        """true when any leaf is present (non-missing)."""
        parts = []
        for child in self.children.values():
            if isinstance(child, OutTree):
                parts.append(child.presence())
            else:
                parts.append(child.isNotNull())
        result = F.lit(False)
        for p in parts:
            result = result | p
        return result

    def to_struct_json(self) -> Column:
        """JSON text of the output object (missing keys dropped)."""
        if not self.children:
            return F.lit("{}")
        return F.to_json(self.to_struct())

    def to_struct(self) -> Column:
        fields = []
        for name, child in self.children.items():
            if isinstance(child, OutTree):
                # a sub-object materializes only when a child is present
                # (set_path creates intermediates lazily, transform.rs:6075+)
                sub = F.when(child.presence(), child.to_struct())
                fields.append(sub.alias(name))
            else:
                fields.append(child.alias(name))
        return F.struct(*fields)

    def to_variant(self) -> Column:
        if not self.children:
            return V.lit_variant({})
        return F.parse_json(self.to_struct_json())

    def merged_with(self, other: "OutTree", cond: Column,
                    deep: bool) -> "OutTree":
        """Static merge: rows where ``cond`` take other's keys (deep-merged
        into self); other rows keep self."""
        result = OutTree()
        keys = list(self.children.keys()) + [
            k for k in other.children if k not in self.children]
        for k in keys:
            a = self.children.get(k)
            b = other.children.get(k)
            if b is None:
                result.children[k] = a
            elif a is None:
                if isinstance(b, OutTree):
                    gated = _gate_tree(b, cond)
                    result.children[k] = gated
                else:
                    result.children[k] = F.when(cond, b)
            else:
                if deep and isinstance(a, OutTree) and isinstance(b, OutTree):
                    result.children[k] = a.merged_with(b, cond, deep)
                else:
                    if isinstance(a, OutTree) or isinstance(b, OutTree):
                        av = a.to_variant() if isinstance(a, OutTree) else a
                        bv = b.to_variant() if isinstance(b, OutTree) else b
                        result.children[k] = F.when(cond, bv).otherwise(av)
                    else:
                        result.children[k] = F.when(cond, b).otherwise(a)
        return result

    def copy(self) -> "OutTree":
        t = OutTree()
        for k, v in self.children.items():
            t.children[k] = v.copy() if isinstance(v, OutTree) else v
        return t


def _gate_tree(tree: OutTree, cond: Column) -> OutTree:
    g = OutTree()
    for k, v in tree.children.items():
        if isinstance(v, OutTree):
            g.children[k] = _gate_tree(v, cond)
        else:
            g.children[k] = F.when(cond, v)
    return g


@dataclass
class CompiledRecordRule:
    """Per-record compilation result."""

    keep: Column          # boolean: record passes record_when chain
    out_tree: OutTree     # output object tree
    returned: Column      # branch return-flag
    returned_out: Column  # variant output for returned rows

    def out_json(self) -> Column:
        normal = self.out_tree.to_struct_json()
        return F.when(self.returned, F.to_json(self.returned_out)) \
                .otherwise(normal)


class RuleCompiler:
    """Compiles one rule file (plus its branch-referenced rules)."""

    def __init__(self, rule: RuleFile, context=None, base_dir: str = "."):
        self.rule = rule
        self.context = context
        self.base_dir = base_dir

    # -- expression helpers -------------------------------------------

    def _expr_pipe(self, raw, path: str):
        if self.rule.version >= 2 and is_v2_expr(raw):
            return parse_expr(raw)
        return v1_expr_to_pipe(raw)

    def _compile_when(self, raw, scope: Scope, path: str) -> Column:
        """when/record_when → boolean Column; errors → NULL (warn+skip,
        ``transform.rs:1041-1091``)."""
        with lenient_errors():
            try:
                if self.rule.version >= 2 and not (
                        isinstance(raw, dict) and
                        ("ref" in raw or ("op" in raw and "if" not in raw))):
                    cond = parse_condition(raw)
                    return compile_condition(cond, scope, path)
                # v1 path: expr must evaluate to a strict bool
                pipe = v1_expr_to_pipe(raw) if not is_v2_expr(raw) \
                    else parse_expr(raw)
                value = compile_pipe(pipe, scope, path)
                return F.when(V.is_bool(value), value.try_cast("boolean")) \
                        .otherwise(F.lit(None).cast("boolean"))
            except RuleError:
                # runtime-equivalent failure → warning + skip per record
                return F.lit(None).cast("boolean")

    # -- mapping compilation -------------------------------------------

    def _compile_mapping_value(self, mapping: Mapping, scope: Scope,
                               path: str) -> Column:
        from .core import rerr
        if mapping.source is not None:
            value = self._resolve_source(mapping.source, scope, path)
        elif mapping.has_value:
            value = V.lit_variant(mapping.value)
        elif mapping.has_expr:
            pipe = self._expr_pipe(mapping.expr, f"{path}.expr")
            value = compile_pipe(pipe, scope, f"{path}.expr")
        else:
            raise RuleError("invalid_rule",
                            "mapping must define source, value, or expr",
                            path)

        # missing → default / required-error / skip (transform.rs:1006-1032)
        if mapping.has_default:
            on_missing = V.lit_variant(mapping.default)
        elif mapping.required:
            on_missing = rerr("missing_required", "required value is missing",
                              path).cast(V.VT)
        else:
            on_missing = F.lit(None).cast(V.VT)

        if mapping.required:
            on_null = rerr("missing_required", "required value is null",
                           path).cast(V.VT)
        else:
            on_null = V.vnull()

        casted = value
        if mapping.value_type is not None:
            casted = self._cast(value, mapping.value_type, f"{path}.type")

        return (
            F.when(value.isNull(), on_missing)
            .when(V.is_vnull(value), on_null)
            .otherwise(casted)
        )

    def _cast(self, value: Column, type_name: str, path: str) -> Column:
        from .core import rerr
        if type_name not in ("string", "int", "float", "bool"):
            raise RuleError("type_cast_failed",
                            "type must be string|int|float|bool", path)
        t = V.typeof(value)
        if type_name == "string":
            return V.to_string_strict(value, path).cast(V.VT)
        if type_name == "int":
            d = value.try_cast("double")
            s_parsed = value.try_cast("string").try_cast("long")
            return (
                F.when(t == "BIGINT", value.try_cast("long").cast(V.VT))
                .when(V.is_number(value) & (d == F.floor(d)),
                      d.cast("long").cast(V.VT))
                .when(V.is_string(value) & s_parsed.isNotNull(),
                      s_parsed.cast(V.VT))
                .otherwise(rerr("type_cast_failed", "failed to cast to int",
                                path).cast(V.VT))
            )
        if type_name == "float":
            parsed = value.try_cast("string").try_cast("double")
            return (
                F.when(V.is_number(value), value.try_cast("double").cast(V.VT))
                .when(V.is_string(value) & parsed.isNotNull(),
                      parsed.cast(V.VT))
                .otherwise(rerr("type_cast_failed", "failed to cast to float",
                                path).cast(V.VT))
            )
        lowered = F.lower(value.try_cast("string"))
        return (
            F.when(V.is_bool(value), value)
            .when(V.is_string(value) & lowered.isin("true", "false"),
                  (lowered == "true").cast(V.VT))
            .otherwise(rerr("type_cast_failed", "failed to cast to bool",
                            path).cast(V.VT))
        )

    def _resolve_source(self, source: str, scope: Scope,
                        path: str) -> Column:
        """``resolve_source`` (``transform.rs:1144-1175``): namespace-
        optional dot path; bare single key means input.<key>."""
        text = source
        if text.startswith("input."):
            ns, rest = "input", text[len("input."):]
        elif text.startswith("context."):
            ns, rest = "context", text[len("context."):]
        elif text.startswith("out."):
            ns, rest = "out", text[len("out."):]
        elif text in ("input", "context", "out"):
            ns, rest = text, ""
        else:
            if "." in text or "[" in text:
                raise RuleError(
                    "invalid_ref",
                    "source with dot paths must use an explicit namespace",
                    path)
            ns, rest = "input", text
        base = {"input": scope.input, "context": scope.context,
                "out": scope.out}[ns]
        if base is None:
            return V.missing()
        if rest == "":
            return base
        return V.navigate(base, parse_path(rest, error_code="invalid_ref"))

    # -- record-level compilation ---------------------------------------

    def compile_record(self, input_col: Column) -> CompiledRecordRule:
        with rule_version(self.rule.version):
            return self._compile_record_inner(input_col)

    def _compile_record_inner(self, input_col: Column) -> CompiledRecordRule:
        context_col = (V.lit_variant(self.context)
                       if self.context is not None else None)
        out_tree = OutTree()
        keep = F.lit(True)
        returned = F.lit(False)
        returned_out = F.lit(None).cast(V.VT)

        def scope():
            return Scope(input=input_col, context=context_col,
                         out=out_tree.to_variant() if out_tree.children
                         else V.lit_variant({}),
                         locals={})

        def scope_with_out_refs():
            """Scope whose @out resolves through the static tree."""
            s = scope()
            return s

        if self.rule.has_record_when:
            cond = self._compile_when(self.rule.record_when, scope(),
                                      "record_when")
            keep = F.coalesce(cond, F.lit(False))

        def apply_mappings(mappings, base_path):
            nonlocal out_tree
            for i, m in enumerate(mappings):
                mpath = f"{base_path}[{i}]"
                tokens = parse_path(m.target, allow_index=False,
                                    error_code="invalid_target")
                names = [t.name for t in tokens if isinstance(t, Key)]
                s = scope()
                value = self._compile_mapping_value(m, s, mpath)
                # guard: skipped records / when-false / return-taken rows
                # never evaluate (and never error)
                gate = keep & ~returned
                if m.has_when:
                    wcond = self._compile_when(m.when, s, f"{mpath}.when")
                    gate = gate & F.coalesce(wcond, F.lit(False))
                out_tree.set(names, F.when(gate, value), mpath)

        if self.rule.steps is not None:
            for si, step in enumerate(self.rule.steps):
                spath = f"steps[{si}]"
                if step.mappings is not None:
                    apply_mappings(step.mappings, f"{spath}.mappings")
                if step.has_record_when:
                    cond = self._compile_when(step.record_when, scope(),
                                              f"{spath}.record_when")
                    keep = keep & (returned |
                                   F.coalesce(cond, F.lit(False)))
                if step.asserts is not None:
                    from .core import rerr as _rerr
                    for ai, a in enumerate(step.asserts):
                        apath = f"{spath}.asserts[{ai}]"
                        cond = self._compile_when(a.when, scope(), apath)
                        guard = F.when(
                            keep & ~returned &
                            ~F.coalesce(cond, F.lit(False)),
                            V.raise_err("assert_failed", a.error.message,
                                        apath, a.error.code).cast("boolean")
                        ).otherwise(F.lit(True))
                        keep = keep & guard
                if step.branch is not None:
                    keep, returned, returned_out, out_tree = \
                        self._compile_branch(step.branch, spath, scope,
                                             keep, returned, returned_out,
                                             out_tree, input_col, context_col)
        else:
            apply_mappings(self.rule.mappings, "mappings")

        return CompiledRecordRule(keep=keep, out_tree=out_tree,
                                  returned=returned,
                                  returned_out=returned_out)

    def _compile_branch(self, branch, spath, scope_fn, keep, returned,
                        returned_out, out_tree, input_col, context_col):
        """branch step (``transform.rs:491-564``): route the record through
        another rule file; merge its output or return it."""
        cond = self._compile_when(branch.when, scope_fn(), f"{spath}.branch")
        cond = F.coalesce(cond, F.lit(False))

        def compile_target(rel_path):
            if rel_path is None:
                return None
            full = os.path.join(self.base_dir, rel_path)
            sub_rule = load_rule_file(full)
            sub = RuleCompiler(sub_rule, context=self.context,
                               base_dir=self.base_dir)
            # branch rules see the same @input; @out starts fresh
            return sub.compile_record(input_col)

        then_c = compile_target(branch.then)
        else_c = compile_target(branch.else_)

        active = keep & ~returned
        for taken, compiled in ((cond, then_c), (~cond, else_c)):
            if compiled is None:
                continue
            gate = active & taken & compiled.keep
            if branch.return_:
                branch_out = compiled.out_json()
                returned_out = F.when(gate & ~returned,
                                      F.parse_json(branch_out)) \
                                .otherwise(returned_out)
                returned = returned | (active & taken & compiled.keep)
                # records not kept by the branch rule are dropped
                keep = keep & (~(active & taken) | compiled.keep)
            else:
                out_tree = out_tree.merged_with(compiled.out_tree, gate,
                                                deep=True)
                keep = keep & (~(active & taken) | compiled.keep)
        return keep, returned, returned_out, out_tree


def compile_rule_to_dataframe(rule: RuleFile, df: DataFrame,
                              record_col: str = "__record__",
                              context=None,
                              base_dir: str = ".") -> DataFrame:
    """df(record variant, __idx long) → df(__idx, __json string)."""
    compiler = RuleCompiler(rule, context=context, base_dir=base_dir)
    compiled = compiler.compile_record(F.col(record_col))
    result = (
        df.withColumn("__keep__", compiled.keep)
        .filter(F.col("__keep__"))
        .withColumn("__json__", compiled.out_json())
    )
    return result
