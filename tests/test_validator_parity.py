"""Validator error-code parity (round 5).

Pins the structural checks the reference validator performs beyond the
golden fixtures (``crates/rulemorph/src/validator.rs``): missing
sections (``:427-447``), missing mappings (``:43-47``), empty targets
(``:305-311``), step shape (``:54-92,119-126,171-186``), and finalize
shape (``:202-259``).  Each case asserts the exact (code, path) the
reference emits.
"""

import pytest

from rulemorph_spark.model import parse_rule_file
from rulemorph_spark.validator import validate_rule_source

CASES = [
    ("version: 1\ninput:\n  format: csv\nmappings: []\n",
     [("MissingCsvSection", "input.csv"),
      ("MissingMappings", "mappings")]),
    ("version: 1\ninput: {format: json}\nmappings:\n"
     "  - {target: a, source: a}\n",
     [("MissingJsonSection", "input.json")]),
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: '  ', source: a}\n",
     [("MissingTarget", "mappings[0].target")]),
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: '', source: a}\n",
     [("MissingTarget", "mappings[0].target"),
      ("InvalidPath", "mappings[0].target")]),
    ("version: 1\ninput: {format: json, json: {}}\nsteps:\n"
     "  - mappings:\n      - {target: a, source: a}\n",
     [("InvalidStep", "steps")]),
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - mappings:\n      - {target: a, source: a}\n"
     "    record_when: {eq: ['@input.a', 1]}\n",
     [("InvalidStep", "steps[0]")]),
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - name: only-a-name\n",
     [("InvalidStep", "steps[0]")]),
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - asserts:\n      - when: {eq: ['@input.a', 1]}\n"
     "        error: {code: ' ', message: ''}\n",
     [("InvalidStep", "steps[0].asserts[0].error")]),
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - branch:\n      when: {eq: ['@input.a', 1]}\n      then: ''\n",
     [("InvalidStep", "steps[0].branch.then")]),
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - branch:\n      when: {eq: ['@input.a', 1]}\n"
     "      then: x.yaml\n      else: ''\n",
     [("InvalidStep", "steps[0].branch.else")]),
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a}\nfinalize:\n  limit: 1\n",
     [("InvalidFinalize", "finalize")]),
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a}\nfinalize:\n"
     "  sort: {by: a, order: sideways}\n",
     [("InvalidFinalize", "finalize.sort.order")]),
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a}\nfinalize:\n  sort: {by: 'a..b'}\n",
     [("InvalidPath", "finalize.sort.by")]),
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a}\nfinalize:\n"
     "  filter: {op: '>', args: [{ref: item.a}, 1]}\n",
     [("InvalidFinalize", "finalize.filter")]),
]

# -- round-5 sweep: v1 arity (validate_op validator.rs:1307 /
# validate_chain_op :876), v1 ref shape (validate_ref :1593+), source
# shape (validate_source :654), cyclic @out deps
# (validate_no_cyclic_dependencies v2_validator.rs:958), v2 ref path
# syntax (validate_v2_ref v2_validator.rs:699-748), and strict v2 step
# ranges (validate_op_args_count v2_validator.rs:784).

CASES += [
    # standalone v1 op with empty args: non-empty check AND per-op range
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: {op: trim, args: []}}\n",
     [("InvalidArgs", "mappings[0].expr.args"),
      ("InvalidArgs", "mappings[0].expr.args")]),
    # split takes exactly (value, delim)
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: {op: split, args: [{ref: input.a}, ',', 'x']}}\n",
     [("InvalidArgs", "mappings[0].expr.args")]),
    # v1 divide is binary-only (validate_op: exactly two items) even
    # though the v2 range is (1, None)
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: {op: '/', args: [{ref: input.a}, 2, 3]}}\n",
     [("InvalidArgs", "mappings[0].expr.args")]),
    # chain op arity counts the pipe value: trim with an explicit arg
    # overflows (args_len != 1, validate_chain_op)
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - target: a\n    expr:\n      chain:\n"
     "        - {ref: input.a}\n"
     "        - {op: trim, args: [{ref: input.b}]}\n",
     [("InvalidArgs", "mappings[0].expr.chain[1].args")]),
    # chain items after the first must be ops
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - target: a\n    expr:\n      chain:\n"
     "        - {ref: input.a}\n"
     "        - {ref: input.b}\n",
     [("InvalidExprShape", "mappings[0].expr.chain[1]")]),
    # standalone lookup arity and key_path literal checks
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: {op: lookup_first,\n"
     "      args: [{ref: context.c}, k]}}\n",
     [("InvalidArgs", "mappings[0].expr.args")]),
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: {op: lookup_first,\n"
     "      args: [{ref: context.c}, {ref: input.k}, 1]}}\n",
     [("InvalidArgs", "mappings[0].expr.args[1]")]),
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: {op: lookup_first,\n"
     "      args: [{ref: context.c}, 'k..x', 1]}}\n",
     [("InvalidArgs", "mappings[0].expr.args[1]")]),
    # v1 refs must be ns.path with a known namespace and non-empty path
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: {ref: name}}\n",
     [("InvalidRefNamespace", "mappings[0].expr")]),
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: {ref: input.a..b}}\n",
     [("InvalidPath", "mappings[0].expr")]),
    # v1 item refs must start with value/index (validate_ref)
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: {op: map, args: [{ref: input.xs},\n"
     "      {ref: item.foo}]}}\n",
     [("InvalidPath", "mappings[0].expr.args[1]")]),
    # dotted sources must be namespaced input|context|out
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: user.name}\n",
     [("InvalidRefNamespace", "mappings[0].source")]),
    # v2 step arity is the exact pipe-context range: fold needs 2 args
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: ['@input.xs', {fold: [['lit:x']]}]}\n",
     [("InvalidArgs", "mappings[0].expr[1]")]),
    # v2 ref subpaths must parse (validate_path_syntax)
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: ['@input.a..b', 'to_string']}\n",
     [("InvalidPath", "mappings[0].expr[0]")]),
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: ['@input.xs',\n"
     "      {map: [{concat: ['@item.value..foo']}]}]}\n",
     [("InvalidPath", "mappings[0].expr[1].map[0].args[0]")]),
    # self-referential @out is both a forward ref and a cycle
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: ['@out.a', 'to_string']}\n",
     [("ForwardOutReference", "mappings[0].expr[0]"),
      ("CyclicDependency", "mappings.a")]),
    # indirect cycle: every target on the cycle is reported
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: ['@out.b', 'to_string']}\n"
     "  - {target: b, expr: ['@out.a', 'to_string']}\n",
     [("ForwardOutReference", "mappings[0].expr[0]"),
      ("CyclicDependency", "mappings.a"),
      ("CyclicDependency", "mappings.b")]),
    # reference DFS quirk: rec_stack is not unwound on the found-cycle
    # path, so a target that merely REACHES a cycle is reported too
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: c, expr: ['@out.a', 'to_string']}\n"
     "  - {target: a, expr: ['@out.b', 'to_string']}\n"
     "  - {target: b, expr: ['@out.a', 'to_string']}\n",
     [("ForwardOutReference", "mappings[0].expr[0]"),
      ("ForwardOutReference", "mappings[1].expr[0]"),
      ("CyclicDependency", "mappings.c"),
      ("CyclicDependency", "mappings.a"),
      ("CyclicDependency", "mappings.b")]),
    # duplicate targets can close a cycle with no forward refs at all
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: ['lit:x']}\n"
     "  - {target: b, expr: ['@out.a', 'to_string']}\n"
     "  - {target: a, expr: ['@out.b', 'to_string']}\n",
     [("DuplicateTarget", "mappings[2].target"),
      ("CyclicDependency", "mappings.b"),
      ("CyclicDependency", "mappings.a")]),
    # steps-level cycle check spans all steps (validator.rs:195)
    ("version: 2\ninput: {format: json, json: {}}\nsteps:\n"
     "  - mappings:\n"
     "      - {target: a, expr: ['@out.b', 'to_string']}\n"
     "  - mappings:\n"
     "      - {target: b, expr: ['@out.a', 'to_string']}\n",
     [("ForwardOutReference", "steps[0].mappings[0].expr[0]"),
      ("CyclicDependency", "steps.a"),
      ("CyclicDependency", "steps.b")]),
    # v1 when: a non-boolean-returning op is InvalidWhenType — the op
    # table is bool_expr_kind's (map is NotBool; the old repo table
    # missed the whole array family)
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - target: a\n    source: a\n"
     "    when: {op: map, args: [{ref: input.xs},\n"
     "      {op: to_string, args: [{ref: item.value}]}]}\n",
     [("InvalidWhenType", "mappings[0].when")]),
    # v1 when: condition dicts and arrays are non-bool literals
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a, when: {eq: [1, 1]}}\n",
     [("InvalidWhenType", "mappings[0].when")]),
    ("version: 1\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a, when: [true]}\n",
     [("InvalidWhenType", "mappings[0].when")]),
    # v2 expr conditions are type-checked (infer_v2_expr_type):
    # a lit: string is String, a to_string tail is String
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a, when: 'lit:yes'}\n",
     [("InvalidWhenType", "mappings[0].when")]),
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a, when: ['@input.flag', 'to_string']}\n",
     [("InvalidWhenType", "mappings[0].when")]),
    # v2 comparisons need exactly 2 args (validate_v2_comparison)
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, source: a, when: {eq: [1]}}\n",
     [("InvalidArgs", "mappings[0].when")]),
    # if-step conditions are validated (validate_v2_if_step): expr
    # typing, comparison arity, and refs inside the cond
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: ['@input.a',\n"
     "      {if: {cond: ['lit:x'], then: ['lit:T']}}]}\n",
     [("InvalidWhenType", "mappings[0].expr[1].if.cond")]),
    ("version: 2\ninput: {format: json, json: {}}\nmappings:\n"
     "  - {target: a, expr: ['@input.a',\n"
     "      {if: {cond: {gt: ['@undefined_v']}, then: ['lit:T']}}]}\n",
     [("InvalidArgs", "mappings[0].expr[1].if.cond"),
      ("UndefinedVariable", "mappings[0].expr[1].if.cond.args[0]")]),
]

VALID = [
    # finalize.filter with @item in scope is legal
    "version: 2\ninput: {format: json, json: {}}\nmappings:\n"
    "  - {target: a, source: a}\nfinalize:\n"
    "  filter: {gt: ['@item.a', 1]}\n",
    # a merging branch step followed by an @out ref to its targets
    "version: 2\ninput: {format: json, json: {}}\nsteps:\n"
    "  - branch: {when: {eq: ['@input.k', 'x']}, then: ./b.yaml}\n"
    "  - mappings:\n"
    "      - {target: c, expr: ['@out.from_branch', 'to_string']}\n",
    # chain from_entries with no explicit args: the pipe value is the
    # implicit operand (validate_chain_op args_len = 0 + 1 ∈ 1..=2)
    "version: 1\ninput: {format: json, json: {}}\nmappings:\n"
    "  - target: a\n    expr:\n      chain:\n"
    "        - {ref: input.entries}\n"
    "        - {op: from_entries, args: []}\n",
    # sort_by with a literal order arg (v2_validator.rs inline
    # test_validate_sort_by_order_arg_allowed)
    "version: 2\ninput: {format: json, json: {}}\nmappings:\n"
    "  - {target: a, expr: ['@input.items',\n"
    "      {sort_by: [['@item.value'], ['lit:desc']]}]}\n",
    # zip_with's last arg runs in @item scope (inline
    # test_validate_zip_with_item_scope_allowed)
    "version: 2\ninput: {format: json, json: {}}\nmappings:\n"
    "  - {target: a, expr: ['@input.left',\n"
    "      {zip_with: [['@input.right'], ['@item']]}]}\n",
    # backward @out refs do not form a cycle
    "version: 2\ninput: {format: json, json: {}}\nmappings:\n"
    "  - {target: a, expr: ['lit:x']}\n"
    "  - {target: b, expr: ['@out.a', 'to_string']}\n",
    # a v1 when that statically returns bool is fine (contains → Bool)
    "version: 1\ninput: {format: json, json: {}}\nmappings:\n"
    "  - target: a\n    source: a\n"
    "    when: {op: contains, args: [{ref: input.xs}, 1]}\n",
    # v2 ref/pipe-value whens are Unknown-typed: no InvalidWhenType
    "version: 2\ninput: {format: json, json: {}}\nmappings:\n"
    "  - {target: a, source: a, when: '@input.flag'}\n",
    "version: 2\ninput: {format: json, json: {}}\nmappings:\n"
    "  - {target: a, source: a, when: ['@input.n', {coalesce: [[true]]}]}\n",
    # a well-formed if-step condition passes
    "version: 2\ninput: {format: json, json: {}}\nmappings:\n"
    "  - {target: a, expr: ['@input.a',\n"
    "      {if: {cond: {gt: ['$', 1]}, then: ['lit:T'],\n"
    "            else: ['lit:F']}}]}\n",
]


@pytest.mark.parametrize("rules,expect", CASES,
                         ids=[e[0][0] + "-" + str(i)
                              for i, e in enumerate(CASES)])
def test_structural_validation_codes(rules, expect):
    errors = validate_rule_source(parse_rule_file(rules), rules)
    got = [(e.code, e.path) for e in errors]
    assert got == expect, got


@pytest.mark.parametrize("rules", VALID)
def test_structural_validation_accepts(rules):
    errors = validate_rule_source(parse_rule_file(rules), rules)
    assert errors == [], [(e.code, e.path) for e in errors]


def test_all_reference_error_codes_emittable():
    """Every ErrorCode the reference validator can emit has at least
    one push site in this validator (diff of validator.rs vs
    validator.py, round-5 sweep)."""
    import re
    from pathlib import Path
    src = Path("rulemorph_spark/validator.py").read_text()
    mine = set(re.findall(r'push\("([A-Za-z]+)"', src))
    reference_codes = {
        "DuplicateTarget", "ForwardOutReference", "InvalidArgs",
        "InvalidDelimiterLength", "InvalidExprShape", "InvalidFinalize",
        "InvalidPath", "InvalidRefNamespace", "InvalidStep",
        "InvalidTypeName", "InvalidVersion", "InvalidWhenType",
        "MissingCsvColumns", "MissingCsvSection", "MissingJsonSection",
        "MissingMappingValue", "MissingMappings", "MissingTarget",
        "SourceValueExprExclusive", "StepsMappingExclusive", "UnknownOp",
        # v2_validator.rs codes (round-5 late sweep)
        "CyclicDependency", "InvalidItemRef", "InvalidAccRef",
        "UndefinedVariable",
    }
    missing = reference_codes - mine
    assert not missing, missing


def test_v1_arity_table_matches_reference():
    """The v1 per-op effective arity table mirrors ``validate_op``
    (validator.rs:1307+); parsed straight from the reference source so
    drift fails loudly.  Skipped when the reference tree is absent."""
    import re
    from pathlib import Path
    src_path = Path("/root/reference/crates/rulemorph/src/validator.rs")
    if not src_path.exists():
        pytest.skip("reference tree not available")
    from rulemorph_spark.validator import _V1_ARITY
    body = src_path.read_text().split("fn validate_op(")[1].split("\nfn ")[0]
    words = {"one": 1, "two": 2, "three": 3, "four": 4}
    ref: dict[str, tuple[int, int | None]] = {}
    for m in re.finditer(
            r'((?:"[^"]+"\s*\|\s*)*"[^"]+")\s*=>\s*\{\s*if\s+(.*?)\{', body,
            re.S):
        ops = re.findall(r'"([^"]+)"', m.group(1))
        cond = m.group(2)
        rng = re.search(r'!\((\d+)\.\.=(\d+)\)', cond)
        if rng:
            bounds = (int(rng.group(1)), int(rng.group(2)))
        elif "!=" in cond:
            n = int(re.search(r'!=\s*(\d+)', cond).group(1))
            bounds = (n, n)
        elif "<" in cond:
            n = int(re.search(r'<\s*(\d+)', cond).group(1))
            bounds = (n, None)
        else:
            continue
        for op in ops:
            ref[op] = bounds
    ref.pop("lookup", None)   # delegated to validate_lookup_args
    ref.pop("lookup_first", None)
    assert ref, "failed to parse reference arity arms"
    assert ref == _V1_ARITY, {
        k: (ref.get(k), _V1_ARITY.get(k))
        for k in set(ref) | set(_V1_ARITY)
        if ref.get(k) != _V1_ARITY.get(k)}


def test_v2_arity_table_matches_reference():
    """OP_ARITY mirrors ``get_op_arg_range`` (v2_validator.rs:812-863),
    parsed from the reference source."""
    import re
    from pathlib import Path
    src_path = Path(
        "/root/reference/crates/rulemorph/src/v2_validator.rs")
    if not src_path.exists():
        pytest.skip("reference tree not available")
    from rulemorph_spark.registry import OP_ARITY
    body = src_path.read_text().split(
        "fn get_op_arg_range")[1].split("\n}\n")[0]
    ref = {}
    for m in re.finditer(
            r'((?:"[^"]+"\s*\|?\s*)+)=>\s*\((\d+),\s*(Some\((\d+)\)|None)\)',
            body):
        ops = re.findall(r'"([^"]+)"', m.group(1))
        mx = None if m.group(3) == "None" else int(m.group(4))
        for op in ops:
            ref[op] = (int(m.group(2)), mx)
    assert ref, "failed to parse reference v2 arity table"
    assert ref == dict(OP_ARITY), {
        k: (ref.get(k), OP_ARITY.get(k))
        for k in set(ref) | set(OP_ARITY)
        if ref.get(k) != OP_ARITY.get(k)}
