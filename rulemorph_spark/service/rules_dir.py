"""Rules-directory validation: ``endpoint.yaml`` plus every transform /
network rule it references, with per-file error aggregation.

Reference semantics: ``rulemorph_endpoint/src/endpoint_engine.rs:151-243``
(``validate_rules_dir``) and ``:1818-1960`` (``validate_rule_path`` /
``validate_normal_rule`` / ``validate_network_rule``).  Error rows carry
``{code, file, path, line, column, message}`` and the CLI renders them as
``E <code> file=<file> [path=..] [line=..] [col=..] msg=".."`` (text) or a
JSON array (``-e json``) — ``rulemorph_cli/src/main.rs:556-570``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import yaml

from ..errors import RuleError


@dataclass
class RulesDirError:
    code: str
    file: str
    message: str
    path: str | None = None
    line: int | None = None
    column: int | None = None

    def to_json(self) -> dict:
        # shape of ``rules_dir_error_json`` (rulemorph_cli/src/main.rs
        # :604-622): typed entries with the offending file
        out = {"type": "rules_dir", "code": self.code, "file": self.file,
               "message": self.message}
        if self.path is not None:
            out["path"] = self.path
        if self.line is not None:
            out["line"] = self.line
        if self.column is not None:
            out["column"] = self.column
        return out

    def render_text(self) -> str:
        parts = [f"E {self.code}", f"file={self.file}"]
        if self.path is not None:
            parts.append(f"path={self.path}")
        if self.line is not None:
            parts.append(f"line={self.line}")
        if self.column is not None:
            parts.append(f"col={self.column}")
        parts.append(f'msg="{self.message}"')
        return " ".join(parts)


@dataclass
class _Usage:
    step: bool = False
    catch_rule: bool = False
    body_rule: bool = False
    branch_rule: bool = False

    def merge(self, other: "_Usage") -> None:
        self.step = self.step or other.step
        self.catch_rule = self.catch_rule or other.catch_rule
        self.body_rule = self.body_rule or other.body_rule
        self.branch_rule = self.branch_rule or other.branch_rule


def _push(errors, code, file, message, path=None, location=None):
    line, column = location if location else (None, None)
    errors.append(RulesDirError(code=code, file=file, message=message,
                                path=path, line=line, column=column))


def _read_source(path: str, errors) -> str | None:
    try:
        with open(path, encoding="utf-8") as fh:
            return fh.read()
    except OSError as e:
        _push(errors, "ReadFailed", path, str(e))
        return None


def _yaml_location(err) -> tuple[int, int] | None:
    mark = getattr(err, "problem_mark", None)
    if mark is None:
        return None
    return (mark.line + 1, mark.column + 1)


def _parse_yaml(path: str, source: str, errors):
    try:
        return yaml.safe_load(source)
    except yaml.YAMLError as e:
        _push(errors, "YamlParseFailed", path, str(e),
              location=_yaml_location(e))
        return None


def _rule_type(doc) -> str:
    if isinstance(doc, dict):
        t = doc.get("type")
        if isinstance(t, str):
            return t
    return "normal"


def _resolve(base_dir: str, rel: str) -> str:
    return rel if os.path.isabs(rel) else os.path.normpath(
        os.path.join(base_dir, rel))


def validate_rules_dir(rules_dir: str) -> list[RulesDirError]:
    """Validate ``rules_dir/endpoint.yaml`` and every rule it references
    (transitively through network ``body_rule`` and transform
    ``steps[].branch``); returns the aggregated error list (empty =
    valid)."""
    errors: list[RulesDirError] = []
    endpoint_path = os.path.join(rules_dir, "endpoint.yaml")
    source = _read_source(endpoint_path, errors)
    if source is None:
        return errors
    doc = _parse_yaml(endpoint_path, source, errors)
    if doc is None or not isinstance(doc, dict):
        if doc is not None:
            _push(errors, "YamlParseFailed", endpoint_path,
                  "endpoint rule must be a mapping")
        return errors

    if doc.get("version") != 2:
        _push(errors, "InvalidVersion", endpoint_path,
              "endpoint rule version must be 2", path="version")
    if doc.get("type") != "endpoint":
        _push(errors, "InvalidRuleType", endpoint_path,
              "endpoint rule type must be endpoint", path="type")
    try:
        from .endpoint import EndpointEngine
        EndpointEngine(None, endpoint_path)
    except Exception as e:  # mirror EndpointCompileFailed aggregation
        _push(errors, "EndpointCompileFailed", endpoint_path, str(e))

    base_dir = os.path.dirname(os.path.abspath(endpoint_path))
    usage: dict[str, _Usage] = {}

    def note(rel: str, u: _Usage) -> None:
        resolved = _resolve(base_dir, rel)
        usage.setdefault(resolved, _Usage()).merge(u)

    for endpoint in doc.get("endpoints") or []:
        if not isinstance(endpoint, dict):
            continue
        for step in endpoint.get("steps") or []:
            if not isinstance(step, dict):
                continue
            if isinstance(step.get("rule"), str):
                note(step["rule"], _Usage(step=True))
            catch = step.get("catch")
            if isinstance(catch, dict):
                for target in catch.values():
                    if isinstance(target, str):
                        note(target, _Usage(catch_rule=True))
        catch = endpoint.get("catch")
        if isinstance(catch, dict):
            for target in catch.values():
                if isinstance(target, str):
                    note(target, _Usage(catch_rule=True))

    validated: set[str] = set()
    for path in sorted(usage):
        _validate_rule_path(path, usage[path], validated, errors)
    return errors


def _validate_rule_path(path: str, usage: _Usage, validated: set[str],
                        errors) -> None:
    source = _read_source(path, errors)
    if source is None:
        return
    doc = _parse_yaml(path, source, errors)
    if doc is None:
        return
    rule_type = _rule_type(doc)

    if usage.step and rule_type == "endpoint":
        _push(errors, "EndpointRuleNotAllowed", path,
              "endpoint rule not allowed as step", path="type")
    if usage.body_rule and rule_type != "normal":
        _push(errors, "BodyRuleInvalid", path,
              "body_rule must be normal", path="type")
    if usage.catch_rule and rule_type != "normal":
        _push(errors, "CatchRuleInvalid", path,
              "catch rule must be normal", path="type")
    if usage.branch_rule and rule_type != "normal":
        _push(errors, "BranchRuleInvalid", path,
              "branch rule must be normal", path="type")

    if path in validated:
        return
    validated.add(path)

    if rule_type == "network":
        _validate_network_rule(doc, path, validated, errors)
    elif rule_type == "endpoint":
        pass
    else:
        _validate_normal_rule(doc, source, path, validated, errors)


def _validate_normal_rule(doc, source: str, path: str, validated: set[str],
                          errors) -> None:
    from ..model import parse_rule_dict
    from ..validator import validate_rule_source
    if isinstance(doc, dict):
        doc = dict(doc)
        doc.pop("type", None)
    try:
        rule = parse_rule_dict(doc)
    except RuleError as e:
        _push(errors, e.code, path, str(e.message),
              path=getattr(e, "path", None))
        return
    for err in validate_rule_source(rule, source):
        _push(errors, err.code, path, err.message,
              path=getattr(err, "path", None),
              location=((err.line, err.column)
                        if getattr(err, "line", None) is not None
                        else None))
    base_dir = os.path.dirname(path)
    for step in rule.steps or []:
        branch = getattr(step, "branch", None)
        if branch is None:
            continue
        for target in (branch.then, branch.else_):
            if isinstance(target, str) and target.strip():
                _validate_rule_path(_resolve(base_dir, target),
                                    _Usage(branch_rule=True), validated,
                                    errors)


def _validate_network_rule(doc, path: str, validated: set[str],
                           errors) -> None:
    """``validate_network_rule`` (endpoint_engine.rs:1925-2085): every
    check runs and pushes its own coded row — no short-circuit — then
    body_rule AND catch targets recurse regardless of earlier errors."""
    from .endpoint import _METHOD_RE, _parse_duration

    # serde parse gate (NetworkRuleFile / NetworkRequest derive,
    # endpoint_engine.rs:1419-1445): a missing required field fails
    # deserialization with ONE parse error and validation STOPS — it
    # never reaches the per-field checks below (ADVICE r6).  Fields
    # report in struct declaration order.
    for field in ("version", "type", "request", "timeout"):
        if field not in doc:
            _push(errors, "YamlParseFailed", path,
                  f"missing field `{field}`")
            return
    if isinstance(doc.get("request"), dict):
        for field in ("method", "url"):
            if field not in doc["request"]:
                _push(errors, "YamlParseFailed", path,
                      f"missing field `{field}`")
                return

    if doc.get("version") != 2:
        _push(errors, "InvalidVersion", path,
              "network rule version must be 2", path="version")
    if doc.get("type") != "network":
        _push(errors, "InvalidRuleType", path,
              "network rule type must be network", path="type")
    if doc.get("body") is not None and doc.get("body_map") is not None:
        _push(errors, "NetworkInvalidConfig", path,
              "body and body_map are mutually exclusive", path="body")
    if doc.get("body") is not None and doc.get("body_rule") is not None:
        _push(errors, "NetworkInvalidConfig", path,
              "body and body_rule are mutually exclusive", path="body")
    if doc.get("body_map") is not None and doc.get("body_rule") is not None:
        _push(errors, "NetworkInvalidConfig", path,
              "body_map and body_rule are mutually exclusive",
              path="body_map")

    req = doc.get("request") or {}
    raw_method = str(req.get("method", ""))
    if not _METHOD_RE.fullmatch(raw_method):
        _push(errors, "InvalidMethod", path, "invalid method",
              path="request.method")
    elif raw_method == "GET" and any(
            doc.get(k) is not None
            for k in ("body", "body_map", "body_rule")):
        # case-SENSITIVE: Method::from_bytes(b"get") is a distinct
        # extension method, never == Method::GET
        # (endpoint_engine.rs:1999-2011; ADVICE r6)
        _push(errors, "NetworkInvalidConfig", path,
              "GET with body is not allowed", path="request.method")

    from ..errors import RuleError as _RuleError
    from ..expr_ir import parse_expr
    for field, label in (("url", "request.url"),):
        if req.get(field) is not None:
            try:
                parse_expr(req[field])
            except _RuleError as e:
                _push(errors, "InvalidExpr", path,
                      f"request.url: {e.message}", path=label)
    if doc.get("body") is not None:
        try:
            parse_expr(doc["body"])
        except _RuleError as e:
            _push(errors, "InvalidExpr", path, f"body: {e.message}",
                  path="body")

    try:
        timeout_s = _parse_duration(doc.get("timeout", ""))
        if timeout_s <= 0:
            _push(errors, "InvalidTimeout", path, "timeout must be > 0",
                  path="timeout")
    except _RuleError as e:
        _push(errors, "InvalidTimeout", path, str(e.message),
              path="timeout")

    retry = doc.get("retry") or {}
    if int(retry.get("max", 0) or 0) > 0:
        backoff = retry.get("backoff", "fixed")
        if backoff not in ("fixed", "linear", "exponential"):
            _push(errors, "InvalidRetry", path,
                  f"invalid retry backoff: {backoff}", path="retry")
        else:
            try:
                _parse_duration(retry.get("initial_delay",
                                                  "100ms"))
            except _RuleError as e:
                _push(errors, "InvalidRetry", path, str(e.message),
                      path="retry")

    base_dir = os.path.dirname(path)
    if doc.get("body_rule"):
        _validate_rule_path(_resolve(base_dir, doc["body_rule"]),
                            _Usage(body_rule=True), validated, errors)
    for target in (doc.get("catch") or {}).values():
        _validate_rule_path(_resolve(base_dir, target),
                            _Usage(catch_rule=True), validated, errors)
