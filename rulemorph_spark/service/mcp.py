"""MCP stdio server exposing the engine's tools.

Mirrors ``crates/rulemorph_mcp/src/main.rs:220-347``: a blocking stdio
JSON-RPC loop with tools ``transform``, ``validate_rules``,
``generate_dto``, and ``analyze_input`` (field paths + types summary),
plus the rule-generation prompt surface (``prompts/list`` /
``prompts/get``, ``main.rs:313-420``).
"""

from __future__ import annotations

import json
import sys
from typing import Any

PROTOCOL_VERSION = "2024-11-05"

TOOLS = [
    {
        "name": "transform",
        "description": "Transform CSV/JSON input with YAML rules",
        "inputSchema": {
            "type": "object",
            "properties": {
                "rules": {"type": "string"},
                "input": {"type": "string"},
                "context": {"type": "string"},
            },
            "required": ["rules", "input"],
        },
    },
    {
        "name": "validate_rules",
        "description": "Statically validate a YAML rule file",
        "inputSchema": {
            "type": "object",
            "properties": {"rules": {"type": "string"}},
            "required": ["rules"],
        },
    },
    {
        "name": "generate_dto",
        "description": "Generate a typed DTO from a rule's output schema",
        "inputSchema": {
            "type": "object",
            "properties": {
                "rules": {"type": "string"},
                "language": {"type": "string"},
                "name": {"type": "string"},
            },
            "required": ["rules", "language"],
        },
    },
    {
        "name": "analyze_input",
        "description": "Summarize an input document's field paths + types",
        "inputSchema": {
            "type": "object",
            "properties": {"input": {"type": "string"}},
            "required": ["input"],
        },
    },
]


# prompt surface (main.rs:313-420): templates re-expressed; the
# contract — names, argument lists, {{placeholder}} substitution, and
# what each prompt instructs — matches the reference
PROMPTS = [
    {
        "name": "rule_from_input_base",
        "description": "Generate rules from base rules and input samples.",
        "arguments": [
            {"name": "rules_text", "description": "Base rules YAML.",
             "required": True},
            {"name": "input_sample", "description": "Input sample "
             "(JSON/CSV).", "required": True},
            {"name": "format", "description": "Input format (json or "
             "csv).", "required": False},
            {"name": "records_path", "description": "Records path for "
             "JSON input.", "required": False},
        ],
    },
    {
        "name": "rule_from_dto",
        "description": "Generate rules from DTO schema and input samples.",
        "arguments": [
            {"name": "dto_text", "description": "DTO source text.",
             "required": True},
            {"name": "dto_language", "description": "DTO language "
             "(rust/typescript).", "required": True},
            {"name": "input_sample", "description": "Input sample "
             "(JSON/CSV).", "required": True},
            {"name": "format", "description": "Input format (json or "
             "csv).", "required": False},
            {"name": "records_path", "description": "Records path for "
             "JSON input.", "required": False},
        ],
    },
    {
        "name": "explain_errors",
        "description": "Explain validation/transform errors and suggest "
                       "fixes.",
        "arguments": [
            {"name": "errors_json", "description": "Errors array from "
             "tool output.", "required": True},
            {"name": "rules_text", "description": "Optional rules YAML "
             "for context.", "required": False},
        ],
    },
]

_PROMPT_TEMPLATES = {
    "rule_from_input_base": """You are writing a rule file (YAML) for \
this engine.
The base rules fix the output shape — keep each mapping's \
expr/value/default/required unless it cannot be resolved.
Map sources from the input sample. Any target you cannot map gets \
value: null with required: false.
Respond with YAML only.

Base rules:
{{rules_text}}

Input sample:
{{input_sample}}

Optional format: {{format}}
Optional records_path: {{records_path}}
""",
    "rule_from_dto": """You are writing a rule file (YAML) whose output \
conforms to the DTO schema below.
Map sources from the input sample. Any target you cannot map gets \
value: null with required: false.
Respond with YAML only.

DTO:
{{dto_text}}

DTO language: {{dto_language}}

Input sample:
{{input_sample}}

Optional format: {{format}}
Optional records_path: {{records_path}}
""",
    "explain_errors": """Explain each of the following \
validation/transform errors and suggest a concrete fix.

Errors:
{{errors_json}}

Rules (optional):
{{rules_text}}
""",
}


def render_prompt(name: str, args: dict | None) -> dict:
    """prompts/get result: template with ``{{arg}}`` placeholders
    substituted (missing args left as-is, like the reference)."""
    template = _PROMPT_TEMPLATES.get(name)
    if template is None:
        raise ValueError("unknown prompt name")
    content = template
    for k, v in (args or {}).items():
        content = content.replace("{{%s}}" % k, str(v))
    meta = next(p for p in PROMPTS if p["name"] == name)
    return {
        "description": meta["description"],
        "messages": [{"role": "user", "content": content}],
    }


def analyze_input(text: str) -> dict:
    """Field paths + JSON types summary (``analyze_input`` tool)."""
    doc = json.loads(text)
    records = doc if isinstance(doc, list) else [doc]
    fields: dict[str, set] = {}

    def typename(v):
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "string"
        if isinstance(v, list):
            return "array"
        return "object"

    def walk(prefix, v):
        if isinstance(v, dict):
            for k, sub in v.items():
                walk(f"{prefix}.{k}" if prefix else k, sub)
        else:
            fields.setdefault(prefix, set()).add(typename(v))

    for r in records:
        walk("", r)
    return {
        "records": len(records),
        "fields": [{"path": p, "types": sorted(ts)}
                   for p, ts in sorted(fields.items())],
    }


class McpServer:
    def __init__(self, spark=None):
        self._spark = spark

    def _get_spark(self):
        if self._spark is None:
            from ..engine import get_spark
            self._spark = get_spark("rulemorph-mcp")
        return self._spark

    def call_tool(self, name: str, args: dict) -> Any:
        if name == "transform":
            from ..engine import transform
            context = (json.loads(args["context"])
                       if args.get("context") else None)
            result = transform(self._get_spark(), args["rules"],
                               input_text=args["input"], context=context)
            return json.dumps(result)
        if name == "validate_rules":
            from ..model import parse_rule_file
            from ..validator import (collect_rule_warnings,
                                     validate_rule_source)
            rule = parse_rule_file(args["rules"])
            errors = validate_rule_source(rule, args["rules"])
            out = []
            for e in errors:
                obj = {"code": e.code, "message": e.message, "path": e.path}
                if e.line is not None:
                    obj["line"], obj["column"] = e.line, e.column
                out.append(obj)
            result = {"valid": not errors, "errors": out}
            if not errors:
                warnings = collect_rule_warnings(rule)
                if warnings:
                    from ..locator import YamlLocator
                    locator = YamlLocator(args["rules"])
                    wout = []
                    for w in warnings:
                        obj = {"code": w.code, "message": w.message,
                               "path": w.path}
                        loc = (locator.location_for_nearest(w.path)
                               if w.path else None)
                        if loc is not None:
                            obj["line"], obj["column"] = loc
                        wout.append(obj)
                    result["warnings"] = wout
            return json.dumps(result)
        if name == "generate_dto":
            from ..dto import generate_dto
            from ..model import parse_rule_file
            return generate_dto(parse_rule_file(args["rules"]),
                                args["language"], args.get("name"))
        if name == "analyze_input":
            return json.dumps(analyze_input(args["input"]))
        raise ValueError(f"unknown tool: {name}")

    def handle(self, request: dict) -> dict | None:
        rid = request.get("id")
        method = request.get("method")
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}, "prompts": {}},
                    "serverInfo": {"name": "rulemorph-spark",
                                   "version": "0.1.0"},
                }
            elif method == "notifications/initialized":
                return None
            elif method == "tools/list":
                result = {"tools": TOOLS}
            elif method == "tools/call":
                params = request.get("params") or {}
                text = self.call_tool(params.get("name"),
                                      params.get("arguments") or {})
                result = {"content": [{"type": "text", "text": text}]}
            elif method == "prompts/list":
                result = {"prompts": PROMPTS}
            elif method == "prompts/get":
                params = request.get("params") or {}
                result = render_prompt(params.get("name"),
                                       params.get("arguments"))
            else:
                return {"jsonrpc": "2.0", "id": rid,
                        "error": {"code": -32601,
                                  "message": f"unknown method: {method}"}}
        except Exception as e:  # tool errors surface as isError results
            return {"jsonrpc": "2.0", "id": rid,
                    "result": {"content": [{"type": "text",
                                            "text": str(e)}],
                               "isError": True}}
        return {"jsonrpc": "2.0", "id": rid, "result": result}

    def serve_stdio(self, stdin=None, stdout=None):
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                request = json.loads(line)
            except json.JSONDecodeError:
                continue
            response = self.handle(request)
            if response is not None:
                stdout.write(json.dumps(response) + "\n")
                stdout.flush()


def main():
    McpServer().serve_stdio()


if __name__ == "__main__":
    main()
