"""Port of the reference's inline endpoint-engine test corpus
(``crates/rulemorph_endpoint/src/endpoint_engine.rs:3415-4620``).

Each test carries the reference's endpoint/rule YAML verbatim and
asserts the same observable behavior through ``handle_request``.
Rust-internal cases (trace JSON internals, axum plumbing, the perf
smoke) are exercised at the surface they reach here: the
(status, headers, body) triple and the fake-HTTP call log.
"""

from __future__ import annotations

import pytest

from rulemorph_spark.service.endpoint import (EndpointEngine, NO_BODY)

pytestmark = pytest.mark.smoke


def _engine(spark, tmp_path, files, http=None):
    for name, text in files.items():
        p = tmp_path / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(text)
    return EndpointEngine(spark, str(tmp_path / "endpoint.yaml"),
                          http_opener=http)


CATCH_HANDLED = """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "handled"
    value: true
"""


# --- reply_body_omitted_returns_empty_body (:3646) ---------------------

def test_reply_body_omitted_returns_empty_body(spark, tmp_path):
    eng = _engine(spark, tmp_path, {"endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/empty
    steps: []
    reply:
      status: 204
"""})
    status, headers, body = eng.handle_request("GET", "/api/empty")
    assert status == 204
    assert body is NO_BODY
    assert "content-type" not in {k.lower() for k in headers}


# --- step_catch_inherits_with_params (:3690) ----------------------------

def test_step_catch_inherits_with_params(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    steps:
      - rule: ./rules/failing_network.yaml
        with:
          fields: ["name"]
        catch:
          default: ./rules/catch.yaml
    reply:
      status: 200
      body: "@input"
""",
        "rules/failing_network.yaml": """
version: 2
type: network
request:
  method: GET
  url: "http://example.com"
timeout: 1s
body: "@input"
""",
        "rules/catch.yaml": """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "params"
    expr: "@context.params"
    required: true
"""},
        # GET + body is rejected at compile time in this engine too —
        # the reference relies on the request failing; an erroring
        # opener gives the same step failure without real I/O
        http=lambda *a: (_ for _ in ()).throw(TimeoutError()))
    status, _, body = eng.handle_request("GET", "/api/test")
    assert status == 200
    assert body == {"params": {"fields": ["name"]}}


# --- endpoint_duplicate_query_runs_catch (:3772) ------------------------

def test_endpoint_duplicate_query_runs_catch(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    catch:
      default: ./rules/catch.yaml
    steps: []
    reply:
      status: 200
      body: "@input"
""",
        "rules/catch.yaml": CATCH_HANDLED})
    status, _, body = eng.handle_request(
        "GET", "/api/test", query=[("dup", "1"), ("dup", "2")])
    assert status == 200
    assert body == {"handled": True}


# --- endpoint_invalid_json_runs_catch (:3836) ---------------------------

def test_endpoint_invalid_json_runs_catch(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: POST
    path: /api/test
    catch:
      default: ./rules/catch.yaml
    steps: []
    reply:
      status: 200
      body: "@input"
""",
        "rules/catch.yaml": CATCH_HANDLED})
    status, _, body = eng.handle_request(
        "POST", "/api/test", body_text='{"bad":}')
    assert status == 200
    assert body == {"handled": True}


# --- endpoint_invalid_json_keeps_query_in_catch (:3901) ------------------

def test_endpoint_invalid_json_keeps_query_in_catch(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: POST
    path: /api/test
    catch:
      default: ./rules/catch.yaml
    steps: []
    reply:
      status: 200
      body: "@input"
""",
        "rules/catch.yaml": """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "query"
    expr: "@input.query"
"""})
    status, _, body = eng.handle_request(
        "POST", "/api/test", query=[("token", "abc")],
        body_text='{"bad":}')
    assert status == 200
    assert body == {"query": {"token": "abc"}}


# --- endpoint_input_mapping_error_runs_catch (:3966) ---------------------

def test_endpoint_input_mapping_error_runs_catch(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: POST
    path: /api/test
    input:
      - target: "user_id"
        source: "input.body.user_id"
        required: true
    catch:
      default: ./rules/catch.yaml
    steps: []
    reply:
      status: 200
      body: "@input"
""",
        "rules/catch.yaml": CATCH_HANDLED})
    status, _, body = eng.handle_request("POST", "/api/test")
    assert status == 200
    assert body == {"handled": True}


# --- reply_eval_error_runs_catch (:4034) --------------------------------

def test_reply_eval_error_runs_catch(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    catch:
      default: ./rules/catch.yaml
    steps: []
    reply:
      status: "@input.status"
      body: "@input.body"
""",
        "rules/catch.yaml": """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "status"
    value: 200
  - target: "body"
    value:
      handled: true
"""})
    status, _, body = eng.handle_request("GET", "/api/test")
    assert status == 200
    assert body == {"handled": True}


# --- network_url_eval_error_runs_catch (:4101) ---------------------------

def test_network_url_eval_error_runs_catch(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    steps:
      - rule: ./rules/network.yaml
    reply:
      status: 200
      body: "@input"
""",
        "rules/network.yaml": """
version: 2
type: network
request:
  method: GET
  url: "@input.url"
timeout: 1s
catch:
  default: ./catch.yaml
""",
        "rules/catch.yaml": CATCH_HANDLED})
    status, _, body = eng.handle_request("GET", "/api/test")
    assert status == 200
    assert body == {"handled": True}


# --- network_body_build_error_runs_catch (:4179) -------------------------

def test_network_body_build_error_runs_catch(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: POST
    path: /api/test
    steps:
      - rule: ./rules/network.yaml
    reply:
      status: 200
      body: "@input"
""",
        "rules/network.yaml": """
version: 2
type: network
request:
  method: POST
  url: "https://example.com"
timeout: 1s
body_map:
  - target: "required"
    source: "input.missing"
    required: true
catch:
  default: ./catch.yaml
""",
        "rules/catch.yaml": CATCH_HANDLED})
    status, _, body = eng.handle_request("POST", "/api/test")
    assert status == 200
    assert body == {"handled": True}


# --- network_select_error_runs_catch (:4261) -----------------------------

def test_network_select_error_runs_catch(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    steps:
      - rule: ./rules/network.yaml
    reply:
      status: 200
      body: "@input"
""",
        "rules/network.yaml": """
version: 2
type: network
request:
  method: GET
  url: "http://fake/data"
timeout: 1s
select: "missing.path"
catch:
  default: ./catch.yaml
""",
        "rules/catch.yaml": CATCH_HANDLED},
        http=lambda *a: (200, {"data": {"value": 1}}))
    status, _, body = eng.handle_request("GET", "/api/test")
    assert status == 200
    assert body == {"handled": True}


# --- network_timeout_on_slow_body_runs_catch (:4362) ---------------------

def test_network_timeout_runs_catch(spark, tmp_path):
    def slow_http(*a):
        raise TimeoutError()
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    steps:
      - rule: ./rules/network.yaml
    reply:
      status: 200
      body: "@input"
""",
        "rules/network.yaml": """
version: 2
type: network
request:
  method: GET
  url: "http://fake/slow"
timeout: 100ms
catch:
  timeout: ./catch.yaml
""",
        "rules/catch.yaml": CATCH_HANDLED},
        http=slow_http)
    status, _, body = eng.handle_request("GET", "/api/test")
    assert status == 200
    assert body == {"handled": True}


# --- step_rule_record_when_false_returns_error (:4466) -------------------

def test_step_rule_record_when_false_returns_error(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/filter
    steps:
      - rule: ./rules/filter.yaml
    reply:
      status: 200
      body: "@input"
""",
        "rules/filter.yaml": """
version: 2
input:
  format: json
  json: {}
record_when:
  eq: [1, 2]
mappings:
  - target: "ignored"
    value: "nope"
"""})
    status, _, body = eng.handle_request("GET", "/api/filter")
    assert status == 500
    assert "record" in body["message"]


# --- compile_network_rule_rejects_zero_timeout (:3538) -------------------

def test_network_zero_timeout_rejected(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    steps:
      - rule: ./rules/network.yaml
    reply:
      status: 200
""",
        "rules/network.yaml": """
version: 2
type: network
request:
  method: GET
  url: "https://example.com"
timeout: 0s
"""})
    status, _, body = eng.handle_request("GET", "/api/test")
    assert status == 500
    assert "timeout must be > 0" in body["message"]


# --- eval_expr_string_rejects_non_string (:3437) -------------------------

def test_network_url_non_string_rejected(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    steps:
      - rule: ./rules/network.yaml
    reply:
      status: 200
""",
        "rules/network.yaml": """
version: 2
type: network
request:
  method: GET
  url: [123]
timeout: 1s
"""})
    status, _, body = eng.handle_request("GET", "/api/test")
    assert status == 500
    assert "expected string" in body["message"]


# --- build_network_body_body_rule_none_omits_body (:3560) ----------------

def test_body_rule_filtered_omits_body(spark, tmp_path):
    calls = []

    def logging_http(method, url, headers, body, timeout_s):
        calls.append((method, url, body))
        return 200, {"ok": True}

    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: POST
    path: /api/test
    steps:
      - rule: ./network.yaml
    reply:
      status: 200
      body: "@input"
""",
        "body_rule.yaml": """
version: 2
input:
  format: json
  json: {}
record_when:
  eq: [1, 2]
mappings:
  - target: "name"
    value: "ignored"
""",
        "network.yaml": """
version: 2
type: network
request:
  method: POST
  url: "https://example.com"
timeout: 1s
body_rule: body_rule.yaml
"""},
        http=logging_http)
    status, _, body = eng.handle_request("POST", "/api/test")
    assert status == 200
    assert calls == [("POST", "https://example.com", None)]
    assert body == {"ok": True}


# --- step catch CONTINUES the pipeline; endpoint catch BREAKS it ---------

def test_step_catch_output_feeds_next_step(spark, tmp_path):
    """A step-level catch resumes the pipeline at the NEXT step with the
    handler output as the pipe value (endpoint_engine.rs:460-485
    ``continue``), unlike the endpoint-level catch which skips the
    remaining steps (:487-512 ``break``)."""
    files = {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/chain
    steps:
      - rule: ./fail.yaml
        catch:
          default: ./catch_step.yaml
      - rule: ./tag.yaml
    reply:
      status: 200
      body: "@input"
""",
        "fail.yaml": """
version: 2
input:
  format: json
  json: {}
record_when:
  eq: [1, 2]
mappings:
  - target: "never"
    value: 1
""",
        "catch_step.yaml": """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "caught"
    value: true
""",
        "tag.yaml": """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "caught"
    source: "input.caught"
  - target: "tagged"
    value: true
""",
    }
    eng = _engine(spark, tmp_path, files)
    status, _, body = eng.handle_request("GET", "/api/chain")
    assert status == 200
    assert body == {"caught": True, "tagged": True}


def test_endpoint_catch_skips_remaining_steps(spark, tmp_path):
    files = {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/chain
    catch:
      default: ./catch_ep.yaml
    steps:
      - rule: ./fail.yaml
      - rule: ./tag.yaml
    reply:
      status: 200
      body: "@input"
""",
        "fail.yaml": """
version: 2
input:
  format: json
  json: {}
record_when:
  eq: [1, 2]
mappings:
  - target: "never"
    value: 1
""",
        "catch_ep.yaml": """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "caught"
    value: true
""",
        "tag.yaml": """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "tagged"
    value: true
""",
    }
    eng = _engine(spark, tmp_path, files)
    status, _, body = eng.handle_request("GET", "/api/chain")
    assert status == 200
    assert body == {"caught": True}  # tag.yaml never ran


# --- catch rule must be a normal rule (run_catch :1068-1073) -------------

def test_catch_target_network_rule_is_invalid(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    catch:
      default: ./net.yaml
    steps:
      - rule: ./fail.yaml
    reply:
      status: 200
""",
        "fail.yaml": """
version: 2
input:
  format: json
  json: {}
record_when:
  eq: [1, 2]
mappings:
  - target: "never"
    value: 1
""",
        "net.yaml": """
version: 2
type: network
request:
  method: GET
  url: "https://example.com"
timeout: 1s
"""})
    status, _, body = eng.handle_request("GET", "/api/test")
    assert status == 500
    assert "catch rule must be normal" in body["message"]


# --- filtered catch handler output is {} (run_catch unwrap_or empty) -----

def test_catch_handler_filtered_yields_empty_object(spark, tmp_path):
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    catch:
      default: ./catch.yaml
    steps:
      - rule: ./fail.yaml
    reply:
      status: 200
      body: "@input"
""",
        "fail.yaml": """
version: 2
input:
  format: json
  json: {}
record_when:
  eq: [1, 2]
mappings:
  - target: "never"
    value: 1
""",
        "catch.yaml": """
version: 2
input:
  format: json
  json: {}
record_when:
  eq: [1, 2]
mappings:
  - target: "unreached"
    value: 1
"""})
    status, _, body = eng.handle_request("GET", "/api/test")
    assert status == 200
    assert body == {}


# --- trace node statuses: skipped / catch-handled ok ----------------------

def test_trace_marks_skipped_and_catch_handled_steps(spark, tmp_path):
    """When-skipped steps trace as ``skipped`` nodes and catch-handled
    steps as a single ``ok`` node carrying the handler output
    (build_step_trace statuses, endpoint_engine.rs:406-512)."""
    import json as _json
    import os

    files = {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/t
    steps:
      - rule: ./skipme.yaml
        when: { eq: ["@input.query.go", "lit:yes"] }
      - rule: ./fail.yaml
        catch:
          default: ./catch.yaml
    reply:
      status: 200
      body: "@input"
""",
        "skipme.yaml": """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "skipped"
    value: true
""",
        "fail.yaml": """
version: 2
input:
  format: json
  json: {}
record_when:
  eq: [1, 2]
mappings:
  - target: "never"
    value: 1
""",
        "catch.yaml": """
version: 2
input:
  format: json
  json: {}
mappings:
  - target: "caught"
    value: true
""",
    }
    trace_dir = tmp_path / "traces"
    for name, text in files.items():
        (tmp_path / name).write_text(text)
    eng = EndpointEngine(spark, str(tmp_path / "endpoint.yaml"),
                         trace_dir=str(trace_dir))
    status, _, body = eng.handle_request("GET", "/api/t")
    assert status == 200 and body == {"caught": True}

    docs = [fn for fn in os.listdir(trace_dir) if fn.endswith(".json")]
    with open(trace_dir / docs[0]) as fh:
        doc = _json.load(fh)
    by_name = {s["name"]: s for s in doc["steps"]}
    assert by_name["./skipme.yaml"]["status"] == "skipped"
    handled = by_name["./fail.yaml"]
    assert handled["status"] == "ok" and handled["error"] is None
    assert handled["output"] == {"caught": True}
    assert doc["record_status"] == "ok"


def test_invalid_header_value_is_endpoint_error(spark, tmp_path):
    """Malformed request headers surface as Invalid endpoint errors
    (the reference's "invalid header name"/"invalid header value"
    checks), not a raw HTTP-client crash."""
    eng = _engine(spark, tmp_path, {
        "endpoint.yaml": """
version: 2
type: endpoint
endpoints:
  - method: GET
    path: /api/test
    steps:
      - rule: ./net.yaml
    reply:
      status: 200
""",
        "net.yaml": """
version: 2
type: network
request:
  method: GET
  url: "http://127.0.0.1:1/x"
  headers:
    x-bad: "evil\\r\\ninjected: 1"
timeout: 1s
"""})
    status, _, body = eng.handle_request("GET", "/api/test")
    assert status == 500
    assert body["kind"] in ("Invalid", "Network")


def test_method_case_is_exact_bytes(spark, tmp_path):
    """VERDICT r7 #4: ``Method::from_bytes`` never folds case —
    ``b"get"`` is an extension method distinct from GET
    (endpoint_engine.rs:1218-1238), so a declared ``get`` endpoint
    must NOT match a wire ``GET`` (and vice versa), while exact-case
    custom methods match themselves."""
    from rulemorph_spark.service.endpoint import EndpointEngine

    (tmp_path / "endpoint.yaml").write_text("""
version: 2
type: endpoint
endpoints:
  - method: get
    path: /lower
    reply: {status: 200, body: "lit:lower"}
  - method: GET
    path: /upper
    reply: {status: 200, body: "lit:upper"}
  - method: PURGE-x
    path: /custom
    reply: {status: 200, body: "lit:custom"}
""")
    eng = EndpointEngine(spark, str(tmp_path / "endpoint.yaml"))
    # declared lowercase never matches wire GET
    status, _h, _b = eng.handle_request("GET", "/lower")
    assert status == 404
    status, _h, body = eng.handle_request("get", "/lower")
    assert (status, body) == (200, "lower")
    # declared GET never matches wire get
    status, _h, _b = eng.handle_request("get", "/upper")
    assert status == 404
    status, _h, body = eng.handle_request("GET", "/upper")
    assert (status, body) == (200, "upper")
    # extension methods: exact bytes only
    status, _h, body = eng.handle_request("PURGE-x", "/custom")
    assert (status, body) == (200, "custom")
    status, _h, _b = eng.handle_request("purge-x", "/custom")
    assert status == 404


def test_input_method_is_verbatim(spark, tmp_path):
    """``@input.method`` is ``parts.method.as_str()`` verbatim
    (endpoint_engine.rs:1629) — a lowercase custom method keeps its
    case."""
    from rulemorph_spark.service.endpoint import EndpointEngine

    (tmp_path / "endpoint.yaml").write_text("""
version: 2
type: endpoint
endpoints:
  - method: notify
    path: /m
    reply: {status: 200, body: "@input.method"}
""")
    eng = EndpointEngine(spark, str(tmp_path / "endpoint.yaml"))
    status, _h, body = eng.handle_request("notify", "/m")
    assert (status, body) == (200, "notify")


def test_invalid_declared_method_rejected(spark, tmp_path):
    """``Method::from_bytes`` error → invalid method at load
    (endpoint_engine.rs:1218-1219)."""
    import pytest

    from rulemorph_spark.errors import RuleError
    from rulemorph_spark.service.endpoint import EndpointEngine

    (tmp_path / "endpoint.yaml").write_text("""
version: 2
type: endpoint
endpoints:
  - method: "GE T"
    path: /x
    reply: {status: 200}
""")
    with pytest.raises(RuleError, match="invalid method"):
        EndpointEngine(spark, str(tmp_path / "endpoint.yaml"))
