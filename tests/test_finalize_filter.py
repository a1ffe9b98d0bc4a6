"""finalize.filter parity with the reference (``transform.rs:619-644``),
engine vs the interpreter oracle:

- ``@out`` inside the condition = the WHOLE pre-filter output array
  (the engine previously bound ``{}``);
- ``@item.index`` = a dense enumerate over the OUTPUT array — diverges
  from the input index once record_when dropped records;
- evaluation errors are HARD (the reference ``?``s them; the engine
  previously compiled the condition lenient and silently dropped);
- UDF-backed ops (object_flatten/deep_merge/dynamic pick) trapped in
  condition positions route through the interp bridge instead of
  failing analysis (VERDICT r8 "what's missing" #1);
- the per-record BRANCH finalize (``transform.rs:288-308``) shares all
  of the above with ``@out`` bound to the singleton output array.
"""

from __future__ import annotations

import json

import pytest

from rulemorph_spark import interp as I
from rulemorph_spark.engine import transform
from rulemorph_spark.errors import TransformEngineError


def _engine(spark, rule, records, context=None):
    try:
        return ("ok", transform(spark, rule, input_text=json.dumps(records),
                                context=context))
    except TransformEngineError as e:
        return ("err", e.kind, e.message, e.path)


def _oracle(rule, records, context=None):
    try:
        return ("ok", I.transform(rule, input_text=json.dumps(records),
                                  context=context))
    except I.InterpError as e:
        return ("err", e.kind, e.message, e.path)


BASE = """
version: 2
input: {format: json}
mappings:
  - target: name
    source: input.name
  - target: score
    source: input.score
"""

ROWS = [{"name": "a", "score": 5}, {"name": "b", "score": 11},
        {"name": "c", "score": 8}, {"name": "d", "score": 20}]

CASES = [
    # @out: keep items scoring above the first output item's score —
    # needs the whole base array (driver interp path)
    (BASE + """
finalize:
  filter:
    gt: ["@item.score", "@out[0].score"]
""", ROWS),
    # @out via len(): condition references the pre-filter count
    (BASE + """
finalize:
  filter:
    expr: ["@out", {len: []}, {gte: [2]}]
""", ROWS),
    # @item.index dense over OUTPUT order after record_when dropped
    # rows — input __idx__ has gaps, reference renumbers
    (BASE + """
record_when:
  gte: ["@input.score", 8]
finalize:
  filter:
    eq: ["@item.index", 1]
""", ROWS),
    # same but keeping even output positions via index comparison
    (BASE + """
record_when:
  ne: ["@input.name", "b"]
finalize:
  filter:
    lte: ["@item.index", 1]
""", ROWS),
    # trapped UDF op: object_flatten inside the condition's pipe arg
    ("""
version: 2
input: {format: json}
mappings:
  - target: obj
    source: input.obj
  - target: keep
    source: input.keep
finalize:
  filter:
    expr: ["@item.obj", {object_flatten: []}, {get: ["a.b"]}, {eq: [1]}]
""", [{"obj": {"a": {"b": 1}}, "keep": True},
      {"obj": {"a": {"b": 2}}, "keep": False}]),
    # trapped UDF op: deep_merge in a condition arg
    ("""
version: 2
input: {format: json}
mappings:
  - target: obj
    source: input.obj
finalize:
  filter:
    expr: ["@item.obj", {deep_merge: [{"flag": true}]},
           {get: ["flag"]}]
""", [{"obj": {"x": 1}}, {"obj": {"flag": False}}]),
    # hard evaluation error: non-boolean bare-expression condition —
    # the reference propagates, nothing is silently dropped
    (BASE + """
finalize:
  filter:
    expr: ["@item.score"]
""", ROWS),
    # hard evaluation error: invalid regex in a match comparison
    (BASE + """
finalize:
  filter:
    match: ["@item.name", "("]
""", ROWS),
    # hard evaluation error inside a trapped-UDF condition
    ("""
version: 2
input: {format: json}
mappings:
  - target: obj
    source: input.obj
finalize:
  filter:
    expr: ["@item.obj", {object_flatten: []}, {len: []}, {gte: [1]}]
""", [{"obj": {"a": 1}}, {"obj": 7}]),
    # plain condition regression (no refs beyond @item.<field>)
    (BASE + """
finalize:
  filter:
    gte: ["@item.score", 10]
  sort: {by: score, order: desc}
""", ROWS),
    # @out + @item.index together (driver path carries the index too)
    (BASE + """
record_when:
  ne: ["@input.name", "a"]
finalize:
  filter:
    any:
      - eq: ["@item.index", 0]
      - gt: ["@item.score", "@out[0].score"]
""", ROWS),
]


@pytest.mark.parametrize("rule,records",
                         CASES, ids=range(len(CASES)))
def test_finalize_filter_matches_interpreter(spark, rule, records):
    assert _engine(spark, rule, records) == _oracle(rule, records)


BRANCH_MAIN = """
version: 2
input: {format: json}
steps:
  - mappings:
      - target: name
        source: input.name
  - branch:
      when: { eq: [1, 1] }
      then: sub.yaml
      return: true
"""

BRANCH_SUBS = [
    # trapped UDF op in the per-record finalize filter
    """
version: 2
input: {format: json}
mappings:
  - target: obj
    source: input.obj
finalize:
  filter:
    expr: ["@item.obj", {object_flatten: []}, {len: []}, {gte: [1]}]
""",
    # @out in the per-record finalize = the singleton output array
    """
version: 2
input: {format: json}
mappings:
  - target: score
    source: input.score
finalize:
  filter:
    eq: ["@item.score", "@out[0].score"]
""",
    # hard error in the per-record finalize filter
    """
version: 2
input: {format: json}
mappings:
  - target: name
    source: input.name
finalize:
  filter:
    expr: ["@item.name"]
""",
]

BRANCH_ROWS = [{"name": "a", "obj": {"x": {"y": 1}}, "score": 3},
               {"name": "b", "obj": {}, "score": 9}]


@pytest.mark.parametrize("sub", BRANCH_SUBS, ids=range(len(BRANCH_SUBS)))
def test_branch_record_finalize_matches_interpreter(spark, tmp_path, sub):
    (tmp_path / "sub.yaml").write_text(sub)
    eng = None
    try:
        eng = ("ok", transform(spark, BRANCH_MAIN,
                               input_text=json.dumps(BRANCH_ROWS),
                               base_dir=str(tmp_path)))
    except TransformEngineError as e:
        eng = ("err", e.kind, e.message, e.path)
    try:
        orc = ("ok", I.transform(BRANCH_MAIN,
                                 input_text=json.dumps(BRANCH_ROWS),
                                 base_dir=str(tmp_path)))
    except I.InterpError as e:
        orc = ("err", e.kind, e.message, e.path)
    assert eng == orc
