"""MCP stdio server exposing the engine's tools.

Mirrors ``crates/rulemorph_mcp/src/main.rs:220-347``: a blocking stdio
JSON-RPC loop with tools ``transform``, ``validate_rules``,
``generate_dto``, and ``analyze_input`` (field paths + types summary).
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
                    result["warnings"] = [
                        {"code": w.code, "message": w.message,
                         "path": w.path} for w in warnings]
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
                    "capabilities": {"tools": {}},
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
