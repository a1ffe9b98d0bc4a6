"""MCP protocol golden tests.

Port of the reference's stdio exchange corpus
(``crates/rulemorph_mcp/tests/stdio.rs``, 1153 lines): each test sends
the same JSON-RPC requests and asserts the same response shapes.  The
server is driven through ``serve_stdio`` with in-memory pipes so the
line framing, dispatch, and error model are all exercised at the
protocol level (a Content-Length framing test covers the second wire
mode, ``main.rs:67-128``).
"""

import io
import json

import pytest

from rulemorph_spark.service.mcp import McpServer

INIT = {
    "jsonrpc": "2.0", "id": 1, "method": "initialize",
    "params": {"protocolVersion": "2024-11-05", "capabilities": {},
               "clientInfo": {"name": "tests", "version": "0.0"}},
}


class Client:
    """Line-framed stdio driver: accumulates requests, runs the loop
    once, and pops responses in order (mirrors stdio.rs McpServer)."""

    def __init__(self, spark=None):
        self.server = McpServer(spark)
        resp = self.send(INIT)
        assert resp["result"]["protocolVersion"] == "2024-11-05"

    def send(self, request: dict) -> dict:
        stdin = io.StringIO(json.dumps(request) + "\n")
        stdout = io.StringIO()
        self.server.serve_stdio(stdin, stdout)
        lines = [ln for ln in stdout.getvalue().splitlines() if ln]
        assert lines, "empty response"
        return json.loads(lines[0])

    def call(self, name: str, arguments: dict, rid: int = 2) -> dict:
        return self.send({"jsonrpc": "2.0", "id": rid,
                          "method": "tools/call",
                          "params": {"name": name,
                                     "arguments": arguments}})


@pytest.fixture(scope="module")
def client(spark):
    return Client(spark)


RULES_V1 = """version: 1
input:
  format: json
  json: {}
mappings:
  - target: "id"
    source: "id"
"""


def test_initialize_and_list_tools(client):
    resp = client.send({"jsonrpc": "2.0", "id": 2,
                        "method": "tools/list"})
    tools = resp["result"]["tools"]
    expected = ["transform", "validate_rules", "generate_dto",
                "list_ops", "analyze_input", "generate_rules_from_base",
                "generate_rules_from_dto"]
    names = [t["name"] for t in tools]
    for name in expected:
        assert name in names


def test_transform_json_success(client, tmp_path):
    rules_path = tmp_path / "rules.yaml"
    input_path = tmp_path / "input.json"
    rules_path.write_text(RULES_V1)
    input_path.write_text('{"id": 1}')
    resp = client.call("transform", {"rules_path": str(rules_path),
                                     "input_path": str(input_path)})
    output = json.loads(resp["result"]["content"][0]["text"])
    assert output == [{"id": 1}]
    assert resp["result"].get("isError") in (None, False)


BRANCH_RULES = """version: 2
input:
  format: json
  json: {}
steps:
  - branch:
      when: { eq: ["@input.kind", "child"] }
      then: ./branch_child.yaml
      else: ./branch_else.yaml
      return: true
"""

BRANCH_CHILD = """version: 2
input:
  format: json
  json: {}
mappings:
  - target: "result"
    value: "child"
"""


def _write_branch_rules(tmp_path):
    (tmp_path / "rules.yaml").write_text(BRANCH_RULES)
    (tmp_path / "branch_child.yaml").write_text(BRANCH_CHILD)
    (tmp_path / "branch_else.yaml").write_text(
        BRANCH_CHILD.replace("child", "else"))
    (tmp_path / "input.json").write_text(
        '[{"kind": "child"}, {"kind": "other"}]')


def test_transform_rules_path_resolves_branch_relative_paths(
        client, tmp_path):
    _write_branch_rules(tmp_path)
    resp = client.call("transform",
                       {"rules_path": str(tmp_path / "rules.yaml"),
                        "input_path": str(tmp_path / "input.json")},
                       rid=25)
    output = json.loads(resp["result"]["content"][0]["text"])
    assert output == [{"result": "child"}, {"result": "else"}]
    assert resp["result"].get("isError") in (None, False)


def test_tools_call_invalid_params_returns_error(client):
    resp = client.send({"jsonrpc": "2.0", "id": 4,
                        "method": "tools/call",
                        "params": {"name": "transform"}})
    assert resp["error"]["code"] == -32602


def test_tools_call_missing_files_returns_tool_error(client):
    resp = client.call("transform", {"rules_path": "nope.yaml",
                                     "input_path": "nope.json"}, rid=5)
    assert resp["result"]["isError"] is True
    assert "failed to read rules" in \
        resp["result"]["content"][0]["text"]


def test_ndjson_and_output_path(client, tmp_path):
    rules_path = tmp_path / "rules.yaml"
    input_path = tmp_path / "input.json"
    output_path = tmp_path / "out.ndjson"
    rules_path.write_text(RULES_V1)
    input_path.write_text('[{"id": 1}, {"id": 2}]')
    resp = client.call("transform",
                       {"rules_path": str(rules_path),
                        "input_path": str(input_path),
                        "ndjson": True,
                        "output_path": str(output_path)}, rid=6)
    text = resp["result"]["content"][0]["text"]
    lines = text.rstrip("\n").split("\n")
    assert len(lines) == 2
    assert json.loads(lines[0]) == {"id": 1}
    assert json.loads(lines[1]) == {"id": 2}
    assert output_path.read_text() == text


def test_ndjson_rules_path_resolves_branch_relative_paths(
        client, tmp_path):
    _write_branch_rules(tmp_path)
    resp = client.call("transform",
                       {"rules_path": str(tmp_path / "rules.yaml"),
                        "input_path": str(tmp_path / "input.json"),
                        "ndjson": True}, rid=26)
    text = resp["result"]["content"][0]["text"]
    lines = text.rstrip("\n").split("\n")
    assert len(lines) == 2
    assert json.loads(lines[0]) == {"result": "child"}
    assert json.loads(lines[1]) == {"result": "else"}
    assert resp["result"].get("isError") in (None, False)


def test_transform_csv_success(client, tmp_path):
    rules_path = tmp_path / "rules.yaml"
    input_path = tmp_path / "input.csv"
    rules_path.write_text("""version: 1
input:
  format: csv
  csv: {}
mappings:
  - target: "name"
    source: "name"
  - target: "age"
    source: "age"
""")
    input_path.write_text("name,age\nAlice,30\nBob,25\n")
    resp = client.call("transform", {"rules_path": str(rules_path),
                                     "input_path": str(input_path)},
                       rid=7)
    output = json.loads(resp["result"]["content"][0]["text"])
    assert output == [{"name": "Alice", "age": "30"},
                      {"name": "Bob", "age": "25"}]


def test_validate_rules_success(client):
    resp = client.call("validate_rules", {"rules_text": RULES_V1},
                       rid=8)
    assert resp["result"]["content"][0]["text"] == "ok"


def test_validate_rules_failure(client):
    resp = client.call("validate_rules", {"rules_text": """version: 1
input:
  format: csv
mappings: []
"""}, rid=9)
    assert resp["result"]["isError"] is True
    errors = resp["result"]["meta"]["errors"]
    assert isinstance(errors, list) and errors
    codes = {e["code"] for e in errors}
    assert "MissingCsvSection" in codes
    assert "MissingMappings" in codes


def test_generate_dto_typescript(client):
    resp = client.call("generate_dto", {"rules_text": RULES_V1,
                                        "language": "typescript"},
                       rid=10)
    assert "export interface" in resp["result"]["content"][0]["text"]


def test_list_ops_success(client):
    resp = client.call("list_ops", {}, rid=11)
    ops = resp["result"]["meta"]["ops"]
    assert isinstance(ops["type_casts"], list)
    assert isinstance(ops["categories"]["json_ops"], list)
    assert isinstance(ops["categories"]["array_ops"], list)
    assert isinstance(ops["category_docs"]["json_ops"]["examples"], list)
    assert isinstance(ops["category_docs"]["string_ops"]["examples"],
                      list)


def test_list_ops_matches_registry():
    """Every advertised op must exist in the closed op registry, and
    every reference-advertised family member must be advertised."""
    from rulemorph_spark.registry import OP_ARITY
    from rulemorph_spark.service.mcp_tools import LIST_OPS_PAYLOAD
    for op in LIST_OPS_PAYLOAD["expr_ops"]:
        assert op in OP_ARITY, op
    for family in LIST_OPS_PAYLOAD["categories"].values():
        for op in family:
            assert op in OP_ARITY, op
    for op in (LIST_OPS_PAYLOAD["logical_ops"]
               + LIST_OPS_PAYLOAD["comparison_ops"]
               + LIST_OPS_PAYLOAD["type_casts"]):
        assert op in OP_ARITY, op
    assert len(LIST_OPS_PAYLOAD["expr_ops"]) == 59  # main.rs:1099-1158


def test_analyze_input_json_success(client):
    resp = client.call("analyze_input",
                       {"input_json": {"id": 1, "name": "Ada"}}, rid=12)
    paths = resp["result"]["meta"]["paths"]
    assert any(item["path"] == "id" for item in paths)
    assert any(item["path"] == "name" for item in paths)


def test_analyze_input_csv_success(client):
    resp = client.call("analyze_input",
                       {"input_text": "id,name\n1,Ada\n2,Bob\n",
                        "format": "csv"}, rid=13)
    paths = resp["result"]["meta"]["paths"]
    assert any(item["path"] == "id" for item in paths)
    by_path = {p["path"]: p for p in paths}
    assert by_path["id"]["types"] == {"number": 2}  # typed CSV cells


def test_analyze_input_max_paths(client):
    resp = client.call("analyze_input",
                       {"input_json": {"a": 1, "b": 2, "c": 3},
                        "max_paths": 2}, rid=13)
    assert resp["result"]["meta"]["summary"]["paths"] == 2


def test_generate_rules_from_base_success(client):
    from rulemorph_spark.model import parse_rule_file
    rules_text = """version: 1
input:
  format: json
  json: {}
mappings:
  - target: "id"
    source: "old_id"
  - target: "name"
    source: "old_name"
"""
    resp = client.call("generate_rules_from_base",
                       {"rules_text": rules_text,
                        "input_json": {"id": 1, "name": "Ada"}}, rid=14)
    rule = parse_rule_file(resp["result"]["content"][0]["text"])
    assert rule.mappings[0].source == "id"
    assert rule.mappings[1].source == "name"
    summary = resp["result"]["meta"]["summary"]
    assert summary == {"total": 2, "mapped": 2, "unmapped": 0,
                       "with_expr": 0, "with_value": 0}


def test_generate_rules_from_base_unmapped_and_missing_refs(client):
    """Unresolvable targets become value:null/required:false; expr
    refs pointing outside the sample surface as missing_refs
    (main.rs:1562-1655)."""
    rules_text = """version: 1
input:
  format: json
  json: {}
mappings:
  - target: "id"
    source: "id"
  - target: "zzz_nothing_matches"
    source: "qqq_also_nothing"
  - target: "computed"
    expr: { op: concat, args: [{ ref: "input.ghost" }, "!"] }
"""
    resp = client.call("generate_rules_from_base",
                       {"rules_text": rules_text,
                        "input_json": {"id": 7}}, rid=14)
    meta = resp["result"]["meta"]
    assert meta["unmapped"] == ["zzz_nothing_matches"]
    assert meta["summary"]["with_expr"] == 1
    assert meta["missing_refs"] == [{"target": "computed",
                                     "ref": "input.ghost",
                                     "path": "ghost"}]
    out = resp["result"]["content"][0]["text"]
    parsed = __import__("yaml").safe_load(out)
    unmapped = parsed["mappings"][1]
    assert unmapped == {"target": "zzz_nothing_matches", "value": None,
                        "required": False}


DTO_CASES = [
    ("typescript",
     'export interface Record {\n  id: string;\n  name?: string;\n}',
     {"id": 1, "name": "Ada"},
     [("id", "id", True), ("name", "name", False)]),
    ("typescript",
     "export interface Record { id: string; name?: string; }",
     {"id": 1, "name": "Ada"},
     [("id", "id", True), ("name", "name", False)]),
    ("rust",
     "pub struct Record { pub id: String, pub name: Option<String>, "
     "pub price: f64 }",
     {"id": "001", "name": "Ada", "price": 100.0},
     [("id", "id", True), ("name", "name", False),
      ("price", "price", True)]),
    ("python",
     "class Record(BaseModel): id: str; name: Optional[str] = None; "
     'price: float = Field(alias="price_cents")',
     {"id": "001", "name": "Ada", "price_cents": 100.0},
     [("id", "id", True), ("name", "name", False),
      ("price_cents", "price_cents", True)]),
    ("go",
     'type Record struct { ID string `json:"id"` Name *string '
     '`json:"name,omitempty"` Price float64 `json:"price"` }',
     {"id": "001", "name": "Ada", "price": 100.0},
     [("id", "id", True), ("name", "name", False),
      ("price", "price", True)]),
    ("java",
     'public class Record { @JsonProperty("user_id") private String '
     'id; @SerializedName("full_name") private Optional<String> name; }',
     {"user_id": "001", "full_name": "Ada"},
     [("user_id", "user_id", True), ("full_name", "full_name", False)]),
    ("kotlin",
     'data class Record(@SerialName("user_id") val id: String, '
     '@Json(name = "full_name") val name: String?, val price: Double)',
     {"user_id": "001", "full_name": "Ada", "price": 100.0},
     [("user_id", "user_id", True), ("full_name", "full_name", False),
      ("price", "price", True)]),
    ("swift",
     "struct Record: Codable { let id: String; let name: String?; "
     "let price: Double; enum CodingKeys: String, CodingKey { case id "
     '= "user_id", name, price = "price_cents" } }',
     {"user_id": "001", "name": "Ada", "price_cents": 100.0},
     [("user_id", "user_id", True), ("name", "name", False),
      ("price_cents", "price_cents", True)]),
]


@pytest.mark.parametrize(
    "lang,dto,sample,expect",
    DTO_CASES,
    ids=["ts-multiline", "ts-single", "rust-single", "python-alias",
         "go-tags", "java-annotations", "kotlin-annotations",
         "swift-coding-keys"])
def test_generate_rules_from_dto(client, lang, dto, sample, expect):
    from rulemorph_spark.model import parse_rule_file
    resp = client.call("generate_rules_from_dto",
                       {"dto_text": dto, "dto_language": lang,
                        "input_json": sample}, rid=15)
    rule = parse_rule_file(resp["result"]["content"][0]["text"])
    by_target = {m.target: m for m in rule.mappings}
    for target, source, required in expect:
        m = by_target[target]
        assert m.source == source, (target, m.source)
        assert m.required is required, (target, m.required)


def test_resources_list_and_read(client):
    resp = client.send({"jsonrpc": "2.0", "id": 17,
                        "method": "resources/list"})
    resources = resp["result"]["resources"]
    assert any(item["uri"] == "rulemorph://docs/rules_spec_en"
               for item in resources)
    assert any(item["uri"] == "rulemorph://docs/rules_spec_ja"
               for item in resources)
    assert any(item["uri"] == "rulemorph://docs/readme"
               for item in resources)

    read = client.send({"jsonrpc": "2.0", "id": 18,
                        "method": "resources/read",
                        "params": {
                            "uri": "rulemorph://docs/rules_spec_en"}})
    text = read["result"]["contents"][0]["text"]
    assert "Expr" in text
    assert read["result"]["contents"][0]["mimeType"] == "text/markdown"

    ja = client.send({"jsonrpc": "2.0", "id": 19,
                      "method": "resources/read",
                      "params": {
                          "uri": "rulemorph://docs/rules_spec_ja"}})
    assert "Expr" in ja["result"]["contents"][0]["text"]

    bad = client.send({"jsonrpc": "2.0", "id": 20,
                       "method": "resources/read",
                       "params": {"uri": "rulemorph://docs/nope"}})
    assert bad["error"]["code"] == -32602


def test_prompts_list_and_get(client):
    listed = client.send({"jsonrpc": "2.0", "id": 18,
                          "method": "prompts/list"})
    prompts = listed["result"]["prompts"]
    assert any(item["name"] == "rule_from_input_base"
               for item in prompts)
    got = client.send({
        "jsonrpc": "2.0", "id": 19, "method": "prompts/get",
        "params": {"name": "explain_errors",
                   "arguments": {
                       "errors_json": "[{\"message\":\"oops\"}]"}}})
    content = got["result"]["messages"][0]["content"]
    assert "Errors:" in content
    assert "oops" in content


# ---------------------------------------------------------------------
# beyond the reference corpus: protocol details and option surface
# ---------------------------------------------------------------------

def test_ping_shutdown_unknown_method(client):
    assert client.send({"jsonrpc": "2.0", "id": 30,
                        "method": "ping"})["result"] == {}
    assert client.send({"jsonrpc": "2.0", "id": 31,
                        "method": "shutdown"})["result"] is None
    resp = client.send({"jsonrpc": "2.0", "id": 32, "method": "nope"})
    assert resp["error"]["code"] == -32601


def test_unknown_tool_is_tool_error(client):
    resp = client.call("frobnicate", {}, rid=33)
    assert resp["result"]["isError"] is True
    assert "unknown tool" in resp["result"]["content"][0]["text"]


def test_content_length_framing(client):
    """LSP-style framed request gets a framed response
    (main.rs:79-128)."""
    body = json.dumps({"jsonrpc": "2.0", "id": 40, "method": "ping"})
    stdin = io.StringIO(f"Content-Length: {len(body)}\r\n\r\n{body}")
    stdout = io.StringIO()
    client.server.serve_stdio(stdin, stdout)
    out = stdout.getvalue()
    assert out.startswith("Content-Length: ")
    header, _, payload = out.partition("\r\n\r\n")
    assert json.loads(payload)["result"] == {}
    assert int(header.split(":")[1]) == len(payload.encode())


def test_transform_ndjson_rejects_finalize(client):
    rules = RULES_V1 + "finalize:\n  limit: 1\n"
    resp = client.call("transform",
                       {"rules_text": rules,
                        "input_text": '[{"id": 1}]', "ndjson": True},
                       rid=41)
    assert resp["result"]["isError"] is True
    errs = resp["result"]["meta"]["errors"]
    assert errs[0]["kind"] == "InvalidInput"
    assert "finalize" in errs[0]["message"]


def test_transform_truncation_and_preview(client):
    args = {"rules_text": RULES_V1,
            "input_text": json.dumps([{"id": i} for i in range(10)]),
            "ndjson": True, "preview_rows": 3}
    resp = client.call("transform", args, rid=42)
    text = resp["result"]["content"][0]["text"]
    assert len(text.rstrip("\n").split("\n")) == 3
    assert resp["result"]["meta"]["truncated"] is True

    resp = client.call("transform",
                       {"rules_text": RULES_V1,
                        "input_text": json.dumps(
                            [{"id": i} for i in range(10)]),
                        "max_output_bytes": 20}, rid=43)
    assert len(resp["result"]["content"][0]["text"].encode()) <= 20
    assert resp["result"]["meta"]["truncated"] is True
    assert resp["result"]["meta"]["output_bytes"] > 20


def test_transform_validate_option_surfaces_errors(client):
    bad = RULES_V1.replace('source: "id"', "expr: [\"@input.s\", "
                           "\"nope_op\"]").replace("version: 1",
                                                   "version: 2")
    resp = client.call("transform",
                       {"rules_text": bad, "input_text": "[]",
                        "validate": True}, rid=44)
    assert resp["result"]["isError"] is True
    assert any(e["code"] == "UnknownOp"
               for e in resp["result"]["meta"]["errors"])


def test_transform_error_shape(client):
    """A per-record transform failure maps to the structured
    {type, kind, message, path} error JSON (main.rs:4818-4828)."""
    rules = """version: 1
input:
  format: json
  json: {}
mappings:
  - target: "id"
    source: "id"
    required: true
"""
    resp = client.call("transform",
                       {"rules_text": rules,
                        "input_text": '[{"nope": 1}]'}, rid=45)
    assert resp["result"]["isError"] is True
    err = resp["result"]["meta"]["errors"][0]
    assert err["type"] == "transform"
    assert err["kind"] == "MissingRequired"


def test_analyze_input_records_path_errors(client):
    resp = client.send({"jsonrpc": "2.0", "id": 50,
                        "method": "tools/call",
                        "params": {"name": "analyze_input",
                                   "arguments": {
                                       "input_json": {"a": {"b": 1}},
                                       "records_path": "a..b"}}})
    assert resp["error"]["code"] == -32602  # invalid path syntax

    resp = client.call("analyze_input",
                       {"input_json": {"a": {"b": 1}},
                        "records_path": "missing"}, rid=51)
    assert resp["result"]["isError"] is True
    assert "did not match" in resp["result"]["content"][0]["text"]

    resp = client.call("analyze_input",
                       {"input_json": {"a": {"b": 1}},
                        "records_path": "a.b"}, rid=52)
    assert resp["result"]["isError"] is True
    assert "object or array" in resp["result"]["content"][0]["text"]


def test_generate_rules_from_base_csv_input(client):
    """CSV sample + explicit format rewrites the rule's input spec to
    csv (update_yaml_input_spec, main.rs:4400-4428)."""
    rules_text = """version: 1
input:
  format: json
  json: {}
mappings:
  - target: "name"
"""
    resp = client.call("generate_rules_from_base",
                       {"rules_text": rules_text,
                        "input_text": "name,age\nAda,30\n",
                        "format": "csv"}, rid=53)
    out = __import__("yaml").safe_load(
        resp["result"]["content"][0]["text"])
    assert out["input"]["format"] == "csv"
    assert out["mappings"][0]["source"] == "name"


def test_generate_rules_from_dto_nested_types(client):
    """Object-typed fields recurse into dotted targets with
    optionality inherited from the parent
    (build_mappings_for_type, main.rs:4128-4171)."""
    from rulemorph_spark.model import parse_rule_file
    dto = """
export interface Record {
  id: string;
  user?: User;
}
export interface User {
  name: string;
  age: number;
}
"""
    resp = client.call("generate_rules_from_dto",
                       {"dto_text": dto, "dto_language": "typescript",
                        "input_json": {"id": "1",
                                       "user": {"name": "Ada",
                                                "age": 30}}}, rid=60)
    rule = parse_rule_file(resp["result"]["content"][0]["text"])
    by_target = {m.target: m for m in rule.mappings}
    assert set(by_target) == {"id", "user.name", "user.age"}
    assert by_target["id"].required is True
    # parent optionality propagates to nested fields
    assert by_target["user.name"].required is False
    assert by_target["user.age"].required is False
    assert by_target["user.age"].value_type == "float"  # ts number


def test_generate_rules_from_dto_unknown_type_errors(client):
    resp = client.call("generate_rules_from_dto",
                       {"dto_text": "export interface Record "
                                    "{ x: Mystery; }",
                        "dto_language": "typescript",
                        "input_json": {"x": 1}}, rid=61)
    assert resp["result"]["isError"] is True
    assert "unknown dto type" in resp["result"]["content"][0]["text"]
