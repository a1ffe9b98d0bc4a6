"""Declarative corpus-pipeline runner (llm/pipeline.py): the compiled
spec must equal the hand-chained operators, validation is eager, and
the whole chain stays one lazy plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rulemorph_spark.llm import dedup, sampling, text
from rulemorph_spark.llm.pipeline import (PipelineSpecError,
                                          compile_pipeline, run_pipeline)

SF_DIR = "/root/testdata/sf0.001"

SPEC = """
steps:
  - {op: quality_filter, min_score: 0.5}
  - {op: dedup_exact}
  - {op: mixture_sample, weights: {src0: 1.0, src1: 0.6, src2: 0.3}}
  - {op: chunk, chunk_tokens: 32, overlap: 8}
"""


def test_pipeline_matches_hand_chain(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = run_pipeline(docs, SPEC)

    step1 = docs.filter(
        F.round(text.quality_score(F.col("text")), 6) >= 0.5)
    step2 = dedup.dedup_exact(step1, text.fingerprint(F.col("text")),
                              "doc_id")
    step3 = sampling.mixture_sample(
        step2, "source", {"src0": 1.0, "src1": 0.6, "src2": 0.3})
    expected = text.chunk_documents(step3, "text", "doc_id", 32, 8)

    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, expected.collect()))
    assert g == e and len(g) > 0


def test_pipeline_validation_is_eager():
    with pytest.raises(PipelineSpecError, match="unknown op"):
        compile_pipeline({"steps": [{"op": "nope"}]})
    with pytest.raises(PipelineSpecError, match="steps"):
        compile_pipeline({"not_steps": []})
    with pytest.raises(PipelineSpecError, match="mapping with 'op'"):
        compile_pipeline({"steps": ["quality_filter"]})


def test_pipeline_bad_kwargs_fail_at_compile_time():
    with pytest.raises(PipelineSpecError, match=r"steps\[0\]"):
        compile_pipeline(
            {"steps": [{"op": "quality_filter", "wrong_kw": 1}]})
    with pytest.raises(PipelineSpecError, match=r"steps\[1\].*min_score"):
        compile_pipeline(
            {"steps": [{"op": "dedup_exact"},
                       {"op": "quality_filter"}]})  # missing min_score


def test_docstring_spec_runs_end_to_end(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 5)
    bench_path = str(tmp_path / "bench")
    bench.write.parquet(bench_path)
    out = run_pipeline(docs, f"""
steps:
  - {{op: quality_filter, min_score: 0.5}}
  - {{op: lang_filter, langs: [en, other]}}
  - {{op: dedup_exact}}
  - {{op: pii_redact}}
  - {{op: decontaminate, benchmark_path: "{bench_path}"}}
  - {{op: mixture_sample, weights: {{src0: 1.0, src1: 0.5}}}}
  - {{op: chunk, chunk_tokens: 64, overlap: 16}}
  - {{op: token_bins, budget: 2000, part_col: doc_id,
     order_col: chunk_index}}
""")
    rows = out.collect()
    assert rows and {"doc_id", "chunk_index", "chunk_text", "n_tokens",
                     "bin"} <= set(out.columns)
