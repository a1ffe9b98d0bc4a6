"""Standalone-server surface: trace bundles + data-dir API graph.

Ports the ``rulemorph_server`` crate's non-HTTP logic:

- trace metadata index over a data dir (``rulemorph_trace/src/
  trace_store.rs:190-271`` ``parse_trace_meta`` / ``refresh_index``):
  walks ``<data_dir>/traces`` (and this engine's flat
  ``trace-*.json`` layout) and extracts the TraceMeta shape;
- trace bundle import (``trace_store.rs:97-149`` ``import_bundle``):
  copies ``<bundle>/traces`` and ``<bundle>/rules`` into the data
  dir and reports ``{imported, trace_ids, rules_imported}``;
- the data-dir API dependency graph (``rulemorph_server/src/
  api_graph.rs``): walks every YAML rule under the data dir,
  classifies endpoint / network / normal rules, and emits nodes with
  per-rule op summaries plus endpoint-step / body_rule / branch
  edges (placeholder ``missing`` nodes for dangling references).

The HTTP routes that expose these (``/internal/traces``,
``/internal/traces/{id}``, ``/internal/import``,
``/internal/api-graph``, ``/internal/stream``, and the ``/api/*``
rules prefix — ``server.rs:50-66``) are wired in
:func:`rulemorph_spark.cli.make_http_server`.
"""

from __future__ import annotations

import json
import os
import shutil

import yaml

# ---------------------------------------------------------------------
# trace metadata (TraceMeta)
# ---------------------------------------------------------------------


def parse_trace_meta(path: str) -> dict:
    """TraceMeta from one trace JSON file (fallbacks mirror
    ``parse_trace_meta``): trace_id defaults to the file stem, status
    to ``ok``; duration prefers ``summary.duration_us`` then
    ``summary.duration_ms``×1000 then the top-level variants."""
    with open(path, encoding="utf-8") as fh:
        value = json.load(fh)
    if not isinstance(value, dict):
        raise ValueError("trace document must be an object")

    stem = os.path.splitext(os.path.basename(path))[0]
    trace_id = value.get("trace_id")
    if not isinstance(trace_id, str):
        trace_id = stem or "unknown"
    status = value.get("status")
    if not isinstance(status, str):
        status = "ok"
    timestamp = value.get("timestamp")
    if not isinstance(timestamp, str):
        timestamp = None

    def _u64(v):
        return v if isinstance(v, int) and not isinstance(v, bool) \
            and v >= 0 else None

    summary = value.get("summary")
    summary = summary if isinstance(summary, dict) else {}
    duration_us = _u64(summary.get("duration_us"))
    if duration_us is None:
        ms = _u64(summary.get("duration_ms"))
        duration_us = ms * 1000 if ms is not None else None
    if duration_us is None:
        duration_us = _u64(value.get("duration_us"))
    if duration_us is None:
        ms = _u64(value.get("duration_ms"))
        duration_us = ms * 1000 if ms is not None else None

    meta = {"trace_id": trace_id, "status": status,
            "timestamp": timestamp, "duration_us": duration_us,
            "rule": None, "summary": None, "path": path}
    rule = value.get("rule")
    if isinstance(rule, dict):
        meta["rule"] = {
            "name": rule.get("name") if isinstance(rule.get("name"),
                                                   str) else None,
            "path": rule.get("path") if isinstance(rule.get("path"),
                                                   str) else None,
            "type": rule.get("type") if isinstance(rule.get("type"),
                                                   str) else None,
            "version": rule.get("version")
            if isinstance(rule.get("version"), int) else None,
        }
    if isinstance(value.get("summary"), dict):
        meta["summary"] = {
            "record_total": _u64(summary.get("record_total")),
            "record_success": _u64(summary.get("record_success")),
            "record_failed": _u64(summary.get("record_failed")),
        }
    return meta


def _trace_files(data_dir: str) -> list[str]:
    """Trace JSON files: the server layout (``<data_dir>/traces``
    recursively) plus this engine's flat ``trace-*.json``."""
    out = []
    traces = os.path.join(data_dir, "traces")
    if os.path.isdir(traces):
        for root, _dirs, files in os.walk(traces):
            out.extend(os.path.join(root, f) for f in sorted(files)
                       if f.endswith(".json"))
    if os.path.isdir(data_dir):
        out.extend(os.path.join(data_dir, f)
                   for f in sorted(os.listdir(data_dir))
                   if f.startswith("trace-") and f.endswith(".json"))
    return out


def trace_meta_list(data_dir: str) -> list[dict]:
    """All trace metas, newest timestamp first (``list``,
    trace_store.rs:64-69 — descending b.timestamp.cmp(a))."""
    metas: dict[str, dict] = {}
    for path in _trace_files(data_dir):
        try:
            meta = parse_trace_meta(path)
        except (OSError, ValueError, json.JSONDecodeError):
            continue
        metas[meta["trace_id"]] = meta
    return sorted(metas.values(),
                  key=lambda m: m["timestamp"] or "", reverse=True)


def get_trace(data_dir: str, trace_id: str) -> dict | None:
    for meta in trace_meta_list(data_dir):
        if meta["trace_id"] == trace_id:
            with open(meta["path"], encoding="utf-8") as fh:
                return json.load(fh)
    return None


def import_bundle(data_dir: str, bundle_path: str) -> dict:
    """Copy ``<bundle>/traces`` and ``<bundle>/rules`` into the data
    dir; returns ``{imported, trace_ids, rules_imported}``
    (``import_bundle``, trace_store.rs:97-149 — only ``.json`` files
    under traces/ count toward ``imported``)."""
    imported = 0
    trace_ids: list[str] = []
    traces_src = os.path.join(bundle_path, "traces")
    if os.path.isdir(traces_src):
        dest = os.path.join(data_dir, "traces")
        for root, _dirs, files in os.walk(traces_src):
            rel_root = os.path.relpath(root, traces_src)
            target_root = (dest if rel_root == "."
                           else os.path.join(dest, rel_root))
            os.makedirs(target_root, exist_ok=True)
            for f in sorted(files):
                src = os.path.join(root, f)
                shutil.copy(src, os.path.join(target_root, f))
                if f.endswith(".json"):
                    try:
                        meta = parse_trace_meta(src)
                    except (OSError, ValueError,
                            json.JSONDecodeError):
                        continue
                    imported += 1
                    trace_ids.append(meta["trace_id"])

    rules_imported = 0
    rules_src = os.path.join(bundle_path, "rules")
    if os.path.isdir(rules_src):
        dest = os.path.join(data_dir, "rules")
        for root, _dirs, files in os.walk(rules_src):
            rel_root = os.path.relpath(root, rules_src)
            target_root = (dest if rel_root == "."
                           else os.path.join(dest, rel_root))
            os.makedirs(target_root, exist_ok=True)
            for f in sorted(files):
                shutil.copy(os.path.join(root, f),
                            os.path.join(target_root, f))
                rules_imported += 1

    return {"imported": imported, "trace_ids": trace_ids,
            "rules_imported": rules_imported}


# ---------------------------------------------------------------------
# data-dir API graph (api_graph.rs)
# ---------------------------------------------------------------------


def build_api_graph_dir(data_dir: str) -> dict:
    """Dependency graph over every YAML rule under ``data_dir``."""
    data_dir = os.path.normpath(data_dir)
    nodes: dict[str, dict] = {}
    edges: list[dict] = []
    edge_keys: set[str] = set()

    def rid(path: str) -> str:
        path = os.path.normpath(path)
        try:
            rel = os.path.relpath(path, data_dir)
        except ValueError:
            return path.replace("\\", "/")
        if rel.startswith(".."):
            return path.replace("\\", "/")
        return rel.replace("\\", "/")

    def label_of(path: str) -> str:
        return os.path.splitext(os.path.basename(path))[0] or "rule"

    def placeholder(path: str) -> str:
        node_id = rid(path)
        nodes.setdefault(node_id, {
            "id": node_id, "label": f"missing · {label_of(path)}",
            "kind": "missing", "path": node_id, "ops": []})
        return node_id

    def push_edge(source, target, label, kind):
        key = f"{source}::{target}::{label or ''}"
        if key in edge_keys:
            return
        edge_keys.add(key)
        edge = {"source": source, "target": target, "kind": kind}
        if label is not None:
            edge["label"] = label
        edges.append(edge)

    def resolve(base_dir: str, rule: str) -> str:
        return rule if os.path.isabs(rule) \
            else os.path.join(base_dir, rule)

    for path in _yaml_files(data_dir):
        try:
            with open(path, encoding="utf-8") as fh:
                raw = fh.read()
            doc = yaml.safe_load(raw)
        except (OSError, yaml.YAMLError):
            continue
        if not isinstance(doc, dict):
            continue
        base_dir = os.path.dirname(path) or "."
        node_id = rid(path)
        rule_type = doc.get("type")

        if rule_type == "endpoint":
            endpoints = doc.get("endpoints")
            endpoints = endpoints if isinstance(endpoints, list) else []
            nodes[node_id] = {
                "id": node_id,
                "label": f"endpoint · {label_of(path)}",
                "kind": "endpoint", "path": node_id,
                "ops": _endpoint_ops(endpoints, base_dir, rid, resolve),
            }
            for ep in endpoints:
                if not isinstance(ep, dict):
                    continue
                lbl = f"{ep.get('method')} {ep.get('path')}"
                for step in ep.get("steps") or []:
                    rule_ref = (step or {}).get("rule")
                    if not isinstance(rule_ref, str):
                        continue
                    target = resolve(base_dir, rule_ref)
                    tid = rid(target)
                    if tid not in nodes:
                        placeholder(target)
                    push_edge(node_id, tid, lbl, "endpoint")
            continue

        if rule_type == "network":
            req = doc.get("request")
            req = req if isinstance(req, dict) else {}
            ops = [{"label": "request",
                    "detail": f"{req.get('method')} "
                              f"{json.dumps(req.get('url'))}"}]
            body_rule = doc.get("body_rule")
            if isinstance(body_rule, str):
                target = resolve(base_dir, body_rule)
                ops.append({"label": "body_rule", "detail": body_rule,
                            "refs": [rid(target)]})
                tid = rid(target)
                if tid not in nodes:
                    placeholder(target)
                push_edge(node_id, tid, "body_rule", "ref")
            nodes[node_id] = {
                "id": node_id,
                "label": f"network · {label_of(path)}",
                "kind": "network", "path": node_id, "ops": ops}
            continue

        # normal transform rule
        from ..errors import RuleError
        from ..model import parse_rule_file
        try:
            rule = parse_rule_file(raw)
        except RuleError:
            continue
        nodes[node_id] = {
            "id": node_id,
            "label": f"normal · {label_of(path)}",
            "kind": "normal", "path": node_id,
            "ops": _normal_ops(rule, base_dir, rid, resolve),
        }
        for step in rule.steps or []:
            branch = step.branch
            if branch is None:
                continue
            then_id = rid(resolve(base_dir, branch.then))
            if then_id not in nodes:
                placeholder(resolve(base_dir, branch.then))
            push_edge(node_id, then_id, "branch: then", "branch")
            if branch.else_ is not None:
                else_id = rid(resolve(base_dir, branch.else_))
                if else_id not in nodes:
                    placeholder(resolve(base_dir, branch.else_))
                push_edge(node_id, else_id, "branch: else", "branch")

    return {"nodes": list(nodes.values()), "edges": edges}


def _yaml_files(data_dir: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(data_dir):
        out.extend(os.path.join(root, f) for f in sorted(files)
                   if f.endswith((".yaml", ".yml")))
    return out


def _endpoint_ops(endpoints, base_dir, rid, resolve) -> list[dict]:
    ops = []
    for ep in endpoints:
        if not isinstance(ep, dict):
            continue
        steps = ep.get("steps") or []
        refs = [rid(resolve(base_dir, (s or {}).get("rule")))
                for s in steps
                if isinstance((s or {}).get("rule"), str)]
        op = {"label": f"{ep.get('method')} {ep.get('path')}",
              "detail": f"steps: {len(steps)}"}
        if refs:
            op["refs"] = refs
        ops.append(op)
    return ops


def _normal_ops(rule, base_dir, rid, resolve) -> list[dict]:
    ops: list[dict] = []
    if rule.mappings:
        _mapping_ops(ops, None, rule.mappings)
    for step in rule.steps or []:
        prefix = step.name or "step"
        if step.mappings is not None:
            _mapping_ops(ops, prefix, step.mappings)
        if step.branch is not None:
            refs = [rid(resolve(base_dir, step.branch.then))]
            if step.branch.else_ is not None:
                refs.append(rid(resolve(base_dir, step.branch.else_)))
            ops.append({"label": f"{prefix} · branch",
                        "detail": f"then: {step.branch.then}",
                        "refs": refs})
    fin = rule.finalize
    if fin is not None:
        parts = [p for p, on in (
            ("filter", fin.has_filter), ("sort", fin.sort is not None),
            ("limit", fin.limit is not None),
            ("offset", fin.offset is not None),
            ("wrap", fin.has_wrap)) if on]
        ops.append({"label": "finalize",
                    "detail": ", ".join(parts) or "enabled"})
    return ops


def _mapping_ops(ops: list, prefix: str | None, mappings) -> None:
    for m in mappings:
        name = m.target if prefix is None else f"{prefix}/{m.target}"
        if m.has_expr:
            for step_label in _expr_steps(m.expr):
                ops.append({"label": f"{name} · {step_label}"})
        elif m.source is not None:
            ops.append({"label": f"{name} · source",
                        "detail": m.source})
        elif m.has_value:
            ops.append({"label": f"{name} · value",
                        "detail": json.dumps(m.value)})


def _expr_steps(expr) -> list[str]:
    """Per-step labels: v1 ``{chain: [...]}``/op/ref shapes like the
    reference (``expr_steps``, api_graph.rs:456-476); v2 pipes (raw
    lists) label each pipe element analogously."""
    if isinstance(expr, dict) and isinstance(expr.get("chain"), list):
        return [_expr_step_label(e) for e in expr["chain"]]
    if isinstance(expr, list):
        return [_expr_step_label(e) for e in expr]
    return [_expr_step_label(expr)]


def _expr_step_label(expr) -> str:
    if isinstance(expr, str):
        if expr.startswith("@"):
            return f"ref {expr[1:]}"
        from ..registry import is_valid_op
        if is_valid_op(expr):  # bare op name in a v2 pipe
            return expr
    if isinstance(expr, dict):
        if isinstance(expr.get("ref"), str):
            return f"ref {expr['ref']}"
        if isinstance(expr.get("op"), str):
            op = expr["op"]
            return op if not expr.get("args") else f"{op}(...)"
        if "chain" in expr:
            return "chain"
        if len(expr) == 1:  # v2 {op: [args]} step
            op, args = next(iter(expr.items()))
            if isinstance(op, str) and op not in ("lit",):
                return op if not args else f"{op}(...)"
    return "literal"
