"""Endpoint engine: YAML-declared HTTP endpoints over compiled rules.

Mirrors ``crates/rulemorph_endpoint/src/endpoint_engine.rs``:

- endpoint match on (method, ``/users/{id}`` path template) (``:321-341``)
- ``@input`` = {method, path params, single-valued query, body,
  lowercased headers} (``:1601-1672``)
- optional ``input`` mappings reshape the request (``:383-404``)
- step pipeline: each step a rule file (normal or network); output of
  step N becomes ``@input`` of N+1; ``when`` skips; ``with`` becomes
  ``@context.params`` (``:406-531``)
- network rules: method/url(expr)/headers, body via expr/body_map/
  body_rule, timeout (ms/s), retry fixed/linear/exponential, ``select``
  dot-path extraction, GET+body forbidden (``:826-1055``)
- ``catch`` routing: exact status > 4xx/5xx > timeout > default →
  handler rule receives ``@context.error`` (``:1057-1087,1479-1517``)
- ``reply``: status expr (100-599), fixed headers, body expr
  (missing → null), auto content-type (``:1089-1139``)

This layer is driver-side (per-request, single record); rule execution
reuses the Spark-compiled plans via ``transform_record``.
"""

from __future__ import annotations

import json
import os
import re
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Any

import yaml

from ..errors import RuleError, TransformEngineError
from ..model import load_rule_file, parse_rule_dict
from ..paths import get_path, parse_path
from .record import transform_record


@dataclass
class EndpointError(Exception):
    kind: str  # Timeout | HttpStatus | Network | Transform | Invalid
    message: str
    status: int | None = None

    def to_json(self):
        return {"kind": self.kind, "status": self.status,
                "message": self.message}


@dataclass
class EndpointStep:
    rule: str
    with_: Any = None
    when: Any = None
    catch: dict[str, str] | None = None


@dataclass
class EndpointDef:
    method: str
    path: str
    path_regex: re.Pattern
    param_names: list[str]
    input: list | None
    steps: list[EndpointStep]
    reply_status: Any
    reply_headers: dict[str, str]
    reply_body: Any
    has_reply_body: bool
    catch: dict[str, str] | None


_DUR_RE = re.compile(r"^(\d+)(ms|s)$")


def _parse_duration(text: str, what: str) -> float:
    m = _DUR_RE.match(str(text))
    if not m:
        raise RuleError("invalid_rule", f"{what} must look like 500ms or 5s")
    n, unit = int(m.group(1)), m.group(2)
    return n / 1000.0 if unit == "ms" else float(n)


@dataclass
class NetworkRule:
    method: str
    url_expr: Any
    headers: dict[str, str]
    timeout_s: float
    select: str | None
    body_expr: Any = None
    body_map: list | None = None
    body_rule: str | None = None
    catch: dict[str, str] | None = None
    retry_max: int = 0
    retry_backoff: str = "fixed"
    retry_initial_s: float = 0.0
    base_dir: str = "."


def _compile_path(template: str) -> tuple[re.Pattern, list[str]]:
    names: list[str] = []

    def repl(m):
        names.append(m.group(1))
        return "([^/]+)"

    pattern = re.sub(r"\{([A-Za-z0-9_]+)\}", repl, template.rstrip("/"))
    return re.compile("^" + pattern + "/?$"), names


class EndpointEngine:
    """Load endpoint.yaml + referenced rules; serve requests in-process."""

    def __init__(self, spark, endpoint_file: str,
                 http_opener=None, trace_dir: str | None = None,
                 internal_base: str = ""):
        self.spark = spark
        # exposed to every step as @context.config.internal_base
        # (EngineConfig, endpoint_engine.rs:45-55; config_json :1140)
        self.internal_base = internal_base
        self.endpoint_file = os.path.abspath(endpoint_file)
        self.base_dir = os.path.dirname(os.path.abspath(endpoint_file))
        self._http = http_opener or _default_http
        if trace_dir is not None:
            from .trace import TraceStore
            self.trace_store = TraceStore(trace_dir)
        else:
            self.trace_store = None
        with open(endpoint_file, encoding="utf-8") as fh:
            doc = yaml.safe_load(fh)
        if doc.get("type") != "endpoint":
            raise RuleError("invalid_rule", "endpoint file must have "
                            "type: endpoint")
        self.endpoints: list[EndpointDef] = []
        for e in doc.get("endpoints", []):
            rx, names = _compile_path(e["path"])
            reply = e.get("reply") or {}
            self.endpoints.append(EndpointDef(
                method=e["method"].upper(), path=e["path"], path_regex=rx,
                param_names=names, input=e.get("input"),
                steps=[EndpointStep(rule=s["rule"], with_=s.get("with"),
                                    when=s.get("when"),
                                    catch=s.get("catch"))
                       for s in e.get("steps", [])],
                reply_status=reply.get("status", 200),
                reply_headers=reply.get("headers") or {},
                reply_body=reply.get("body"),
                has_reply_body="body" in reply,
                catch=e.get("catch"),
            ))
        self._rule_cache: dict[str, Any] = {}

    # ------------------------------------------------------------------

    def handle_request(self, method: str, path: str,
                       query: list[tuple[str, str]] | dict | None = None,
                       headers: dict[str, str] | None = None,
                       body_text: str | None = None):
        """→ (status, headers, body_json)."""
        endpoint, params = self._match(method, path)
        if endpoint is None:
            return 404, {"content-type": "application/json"}, {
                "error": "no matching endpoint"}
        trace = None
        if self.trace_store is not None:
            from .trace import RequestTrace
            trace = RequestTrace(endpoint=endpoint.path, method=method,
                                 path=path)
        try:
            request_input = self._build_input(method, params, query or [],
                                              headers or {}, body_text)
            result = self._execute(endpoint, request_input, trace)
        except EndpointError as err:
            handled = self._route_catch(endpoint.catch, err, None)
            result = handled if handled is not None else (
                500, {"content-type": "application/json"}, err.to_json())
        if trace is not None:
            trace.status = result[0]
            self.trace_store.write(trace)
        return result

    def _match(self, method: str, path: str):
        for e in self.endpoints:
            if e.method != method.upper():
                continue
            m = e.path_regex.match(path.rstrip("/") or "/")
            if m:
                return e, dict(zip(e.param_names, m.groups()))
        return None, None

    def _build_input(self, method, params, query, headers, body_text):
        """``build_input`` (``endpoint_engine.rs:1601-1672``): single-
        valued query (duplicates error), lowercased headers with
        comma-joined duplicates, body parsed as JSON when present."""
        if isinstance(query, dict):
            query = list(query.items())
        qmap: dict[str, str] = {}
        for k, v in query:
            if k in qmap:
                raise EndpointError("Invalid",
                                    f"duplicate query key: {k}")
            qmap[k] = v
        hmap: dict[str, str] = {}
        for k, v in headers.items():
            lk = k.lower()
            hmap[lk] = f"{hmap[lk]},{v}" if lk in hmap else v
        record = {"method": method.upper(), "path": params,
                  "query": qmap, "headers": hmap}
        if body_text:
            try:
                record["body"] = json.loads(body_text)
            except json.JSONDecodeError as e:
                raise EndpointError("Invalid", f"invalid JSON body: {e}")
        return record

    # ------------------------------------------------------------------

    def _execute(self, endpoint: EndpointDef, request_input, trace=None):
        current = request_input
        if endpoint.input is not None:
            def run_input(cur=current):
                return self._apply_mappings_rule(endpoint.input, cur, None)
            current = (trace.record("input", "input", current, run_input)
                       if trace is not None else run_input())
        for step in endpoint.steps:
            if step.when is not None and not self._eval_when(
                    step.when, current):
                continue
            params = (self._eval_with(step.with_, current)
                      if step.with_ is not None else None)
            context = self._step_context(params=params)
            try:
                def run_step(cur=current, ctx=context, rule=step.rule):
                    return self._run_rule_file(rule, cur, ctx)
                current = (trace.record(step.rule, "step", current,
                                        run_step)
                           if trace is not None else run_step())
            except EndpointError as err:
                handled = self._route_catch(step.catch, err, current)
                if handled is None:
                    raise
                return handled
        reply = self._reply(endpoint, current)
        if trace is not None:
            trace.record("reply", "reply", current, lambda: reply[2])
        return reply

    def _step_context(self, params=None, error=None) -> dict:
        """Per-step @context document (``step_context``,
        endpoint_engine.rs:1148-1163): always carries
        ``config.internal_base``; ``params`` from the step's ``with``
        and ``error`` for catch handlers are merged in."""
        ctx: dict = {"config": {"internal_base": self.internal_base}}
        if params is not None:
            ctx["params"] = params
        if error is not None:
            ctx["error"] = error
        return ctx

    def _reply(self, endpoint: EndpointDef, final):
        status = self._eval_expr(endpoint.reply_status, final)
        if not isinstance(status, int) or not (100 <= status <= 599):
            raise EndpointError("Invalid",
                                f"reply status must be 100-599, got "
                                f"{status!r}")
        headers = dict(endpoint.reply_headers)
        body = None
        if endpoint.has_reply_body:
            body = self._eval_expr(endpoint.reply_body, final,
                                   missing_as_null=True)
        headers.setdefault("content-type", "application/json")
        return status, headers, body

    def _route_catch(self, catch: dict | None, err: EndpointError,
                     current):
        """``CatchSpec::match_target`` (``endpoint_engine.rs:1487-1514``)."""
        if not catch:
            return None
        target = None
        if err.status is not None:
            target = catch.get(str(err.status))
            if target is None and 400 <= err.status < 500:
                target = catch.get("4xx")
            if target is None and 500 <= err.status < 600:
                target = catch.get("5xx")
        if target is None and err.kind == "Timeout":
            target = catch.get("timeout")
        if target is None:
            target = catch.get("default")
        if target is None:
            return None
        handler_out = self._run_rule_file(
            target, current if current is not None else {},
            self._step_context(error=err.to_json()))
        status = handler_out.get("status", 500) \
            if isinstance(handler_out, dict) else 500
        if not isinstance(status, int):
            status = 500
        return status, {"content-type": "application/json"}, handler_out

    # -- rule execution -------------------------------------------------

    def _load_rule(self, rel_path: str):
        full = rel_path if os.path.isabs(rel_path) \
            else os.path.join(self.base_dir, rel_path)
        if full in self._rule_cache:
            return self._rule_cache[full]
        with open(full, encoding="utf-8") as fh:
            doc = yaml.safe_load(fh)
        if doc.get("type") == "network":
            rule = self._parse_network(doc, os.path.dirname(full))
        else:
            doc.pop("type", None)
            rule = parse_rule_dict(doc)
        self._rule_cache[full] = rule
        return rule

    def _parse_network(self, doc: dict, base_dir: str) -> NetworkRule:
        req = doc.get("request") or {}
        method = str(req.get("method", "GET")).upper()
        has_body = any(doc.get(k) is not None
                       for k in ("body", "body_map", "body_rule"))
        if method == "GET" and has_body:
            raise RuleError("invalid_rule",
                            "GET network rules must not define a body")
        retry = doc.get("retry") or {}
        backoff = retry.get("backoff", "fixed")
        if backoff not in ("fixed", "linear", "exponential"):
            raise RuleError("invalid_rule",
                            "retry backoff must be fixed|linear|exponential")
        return NetworkRule(
            method=method,
            url_expr=req.get("url"),
            headers=req.get("headers") or {},
            timeout_s=_parse_duration(doc.get("timeout", "30s"), "timeout"),
            select=doc.get("select"),
            body_expr=doc.get("body"),
            body_map=doc.get("body_map"),
            body_rule=doc.get("body_rule"),
            catch=doc.get("catch"),
            retry_max=int(retry.get("max", 0)),
            retry_backoff=backoff,
            retry_initial_s=_parse_duration(
                retry.get("initial_delay", "0ms"), "initial_delay"),
            base_dir=base_dir,
        )

    def _run_rule_file(self, rel_path: str, record, context):
        rule = self._load_rule(rel_path)
        if isinstance(rule, NetworkRule):
            try:
                return self._run_network(rule, record, context)
            except EndpointError as err:
                handled = self._route_catch(rule.catch, err, record)
                if handled is None:
                    raise
                # network-level catch returns the handler output as the
                # step result, not a reply
                return handled[2]
        try:
            out = transform_record(self.spark, rule, record,
                                   context=context,
                                   base_dir=self.base_dir)
        except (TransformEngineError, RuleError) as e:
            raise EndpointError("Transform", str(e))
        if out is None:
            raise EndpointError("Transform",
                                "record filtered out by record_when")
        return out

    def _run_network(self, rule: NetworkRule, record, context):
        url = self._eval_expr(rule.url_expr, record, context=context)
        if not isinstance(url, str):
            raise EndpointError("Invalid", "network url must be a string")
        body = None
        if rule.body_expr is not None:
            body = self._eval_expr(rule.body_expr, record, context=context)
        elif rule.body_map is not None:
            body = self._apply_mappings_rule(rule.body_map, record, context)
        elif rule.body_rule is not None:
            sub = os.path.join(rule.base_dir, rule.body_rule)
            body = self._run_rule_file(sub, record, context)

        attempt = 0
        while True:
            try:
                status, resp_body = self._http(
                    rule.method, url, rule.headers, body, rule.timeout_s)
            except TimeoutError:
                err = EndpointError("Timeout", "timeout")
                status, resp_body = None, None
            else:
                if 200 <= status < 300:
                    result = resp_body
                    if rule.select:
                        found, result = get_path(
                            result, parse_path(rule.select))
                        if not found:
                            raise EndpointError(
                                "Invalid",
                                f"select path {rule.select!r} not found "
                                f"in response")
                    return result
                err = EndpointError("HttpStatus", f"http status {status}",
                                    status=status)
            if attempt >= rule.retry_max:
                raise err
            delay = rule.retry_initial_s
            if rule.retry_backoff == "linear":
                delay *= (attempt + 1)
            elif rule.retry_backoff == "exponential":
                delay *= 2 ** attempt
            if delay > 0:
                time.sleep(delay)
            attempt += 1

    # -- expression helpers --------------------------------------------

    def _apply_mappings_rule(self, mappings, record, context):
        rule = parse_rule_dict({
            "version": 2,
            "input": {"format": "json", "json": {}},
            "mappings": mappings,
        })
        out = transform_record(self.spark, rule, record, context=context,
                               base_dir=self.base_dir)
        return out if out is not None else {}

    def _eval_expr(self, raw, record, *, context=None,
                   missing_as_null=False):
        if isinstance(raw, (int, float, bool)) or raw is None:
            return raw
        rule = parse_rule_dict({
            "version": 2,
            "input": {"format": "json", "json": {}},
            "mappings": [{"target": "v", "expr": raw}],
        })
        try:
            out = transform_record(self.spark, rule, record,
                                   context=context,
                                   base_dir=self.base_dir)
        except (TransformEngineError, RuleError) as e:
            raise EndpointError("Transform", str(e))
        if out is None or "v" not in out:
            return None if missing_as_null else None
        return out["v"]

    def _eval_when(self, raw, record) -> bool:
        rule = parse_rule_dict({
            "version": 2,
            "input": {"format": "json", "json": {}},
            "record_when": raw,
            "mappings": [{"target": "ok", "value": True}],
        })
        out = transform_record(self.spark, rule, record,
                               base_dir=self.base_dir)
        return out is not None

    def _eval_with(self, raw, record):
        if isinstance(raw, dict):
            return {k: self._eval_expr(v, record) for k, v in raw.items()}
        return self._eval_expr(raw, record)


def _default_http(method: str, url: str, headers: dict, body,
                  timeout_s: float):
    """Outbound HTTP via urllib; returns (status, parsed JSON body)."""
    data = None
    req_headers = dict(headers)
    if body is not None:
        data = json.dumps(body).encode()
        req_headers.setdefault("content-type", "application/json")
    req = urllib.request.Request(url, data=data, headers=req_headers,
                                 method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            text = resp.read().decode()
            return resp.status, (json.loads(text) if text else None)
    except urllib.error.HTTPError as e:
        return e.code, None
    except TimeoutError:
        raise
    except OSError as e:
        raise EndpointError("Network", str(e))
