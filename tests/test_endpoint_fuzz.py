"""Endpoint-level tri-state fuzz (VERDICT r6 next-round #6).

Random multi-step endpoints where step N's missing/null output feeds
step N+1's ``@input``, asserted end-to-end through ``handle_request``
against an ORACLE that folds the documented flow over the standalone
interpreter (``rulemorph_spark.interp``):

- each step transforms the current document (``_run_rule_file``);
  a ``record_when`` exclusion is the "record excluded" error
  (endpoint_engine.rs:757);
- a step error tries the STEP catch (handler output becomes the pipe
  value, execution CONTINUES), then the ENDPOINT catch (remaining
  steps SKIPPED), else the request is a 500
  (endpoint_engine.rs:406-531);
- the reply body is the final document.

The in-suite run covers EP_FUZZ_ITERS seeds (default 60); the round-7
campaign ran 200+ via
``EP_FUZZ_ITERS=200 pytest tests/test_endpoint_fuzz.py``.
"""

from __future__ import annotations

import json
import os
import random
import tempfile

import pytest

from rulemorph_spark import interp
from rulemorph_spark.service.endpoint import EndpointEngine

ITERS = int(os.environ.get("EP_FUZZ_ITERS", "60"))

# mapping exprs over the rolling document: @input.{a,b,n,s,absent} plus
# the request body fields on step 1 — mix of value-producing,
# missing-producing, null-producing and RAISING pipes
EXPRS = [
    '["@input.n", {add: [1]}]',
    '["@input.n", {divide: [0]}]',                      # raises
    '["@input.s", {concat: ["lit:-", "@input.a"]}]',    # missing arg →
    '["@input.absent"]',                                # missing
    '["@input.m"]',                                     # null
    '["@input.s", {int: []}]',                          # raises (abc)
    '["@input.n", {if: {cond: {gt: ["$", 1]}, then: ["@input.absent"],'
    ' else: ["$"]}}]',
    '["@input.a", {coalesce: ["@input.b", 9]}]',
    '[{x: 1}, {get: ["x"]}]',
    '["@input.n", {to_string: []}]',
    # request-body fields: material for the FIRST step (later steps
    # see only what previous steps emitted)
    '["@input.body.n", {add: [1]}]',
    '["@input.body.s"]',
    '["@input.body.m"]',
    '["@input.body.s", {concat: ["@input.body.m"]}]',   # raises (null)
]

TARGETS = ["a", "b", "n", "s", "m"]

CATCH_RULE = """
version: 2
input: {format: json}
mappings:
  - target: caught
    value: true
  - target: n
    value: 1
  - target: s
    source: input.s
"""


def _gen_step_rule(rng: random.Random) -> str:
    lines = ["version: 2", "input: {format: json}"]
    if rng.random() < 0.15:
        lines += ["record_when:", '  eq: ["@input.s", "lit:never"]']
    lines.append("mappings:")
    for _ in range(rng.randrange(1, 4)):
        t = rng.choice(TARGETS)
        e = rng.choice(EXPRS)
        lines.append(f"  - target: {t}")
        lines.append(f"    expr: {e}")
        r = rng.random()
        if r < 0.15:
            lines.append("    default: 0")
        elif r < 0.25:
            lines.append("    required: true")          # raises on miss
    return "\n".join(lines) + "\n"


class _OracleErr(Exception):
    pass


def _interp_step(rule_text: str, record):
    try:
        out = interp.transform_record(rule_text, record)
    except (interp.InterpError, interp.InterpRuleError) as e:
        raise _OracleErr(str(e))
    if out is interp.MISSING or out is None:
        raise _OracleErr("record excluded")              # rs:757
    return out


def _oracle(steps: list[tuple[str, bool]], ep_catch: bool, record):
    """→ (status, body) folding the endpoint flow over the interp."""
    current = record
    for rule_text, has_catch in steps:
        try:
            current = _interp_step(rule_text, current)
        except _OracleErr:
            if has_catch:
                current = _interp_step(CATCH_RULE, current)
                continue                                  # step catch
            if ep_catch:
                current = _interp_step(CATCH_RULE, current)
                break                                     # skip rest
            return 500, None
    return 200, current


@pytest.mark.parametrize("seed", range(ITERS))
def test_endpoint_tristate_flow(spark, seed):
    rng = random.Random(9000 + seed)
    n_steps = rng.randrange(2, 5)
    steps = [(_gen_step_rule(rng), rng.random() < 0.3)
             for _ in range(n_steps)]
    ep_catch = rng.random() < 0.3

    with tempfile.TemporaryDirectory() as td:
        for i, (text, _) in enumerate(steps):
            with open(f"{td}/step{i}.yaml", "w") as fh:
                fh.write(text)
        with open(f"{td}/catch.yaml", "w") as fh:
            fh.write(CATCH_RULE)
        ep_lines = ["version: 2", "type: endpoint", "endpoints:",
                    "  - method: POST", "    path: /f", "    steps:"]
        for i, (_, has_catch) in enumerate(steps):
            ep_lines.append(f"      - rule: step{i}.yaml")
            if has_catch:
                ep_lines.append("        catch: {default: catch.yaml}")
        ep_lines += ["    reply:", "      status: 200",
                     '      body: "@input"']
        if ep_catch:
            ep_lines += ["    catch: {default: catch.yaml}"]
        with open(f"{td}/endpoint.yaml", "w") as fh:
            fh.write("\n".join(ep_lines) + "\n")

        eng = EndpointEngine(spark, f"{td}/endpoint.yaml")
        body_doc = {"n": 3, "s": "abc", "m": None, "a": "x"}
        status, _hdrs, body = eng.handle_request(
            "POST", "/f", body_text=json.dumps(body_doc))

        record = {"method": "POST", "path": {}, "query": {},
                  "headers": {}, "body": body_doc}
        want_status, want_body = _oracle(steps, ep_catch, record)
        assert status == want_status, \
            (seed, status, want_status, body, steps)
        if want_status == 200:
            assert body == want_body, (seed, body, want_body, steps)
