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


def test_pipeline_filter_and_split_stages(spark):
    """The round-2 stages (c4_clean, gopher_filter, remove_dup_spans,
    hash_split, semdedup) dispatch onto their operators exactly."""
    from rulemorph_spark.llm import filters
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    got = run_pipeline(docs, """
steps:
  - {op: remove_dup_spans, n: 6}
  - {op: hash_split, weights: {train: 0.8, valid: 0.2}}
""")
    expected = filters.hash_split(
        dedup.remove_dup_spans(docs, "text", "doc_id", 6, 2),
        "doc_id", {"train": 0.8, "valid": 0.2})
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, expected.collect()))

    # gopher_filter on synthetic docs kills everything via stopwords —
    # construction doc passes
    good = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog and then "
             "keeps running through the quiet field while the farmer "
             "watches from the old wooden fence near the barn as the "
             "evening light settles slowly over the warm countryside "
             "and the animals begin to rest for the night after work")],
        ["doc_id", "text"])
    assert run_pipeline(good, "steps: [{op: gopher_filter}]").count() == 1
    assert run_pipeline(docs.limit(50),
                        "steps: [{op: gopher_filter}]").count() == 0


def test_pipeline_semdedup_stage(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = run_pipeline(emb, """
steps:
  - {op: semdedup, id_col: vec_id, vec_col: embedding, k: 4,
     iters: 1, eps: 0.2}
""")
    n = out.count()
    assert 0 < n <= emb.count()
    assert set(out.columns) == set(emb.columns)


def test_pipeline_lm_bucket_stage(spark):
    from rulemorph_spark.llm import lm
    from rulemorph_spark.llm.pipeline import run_pipeline

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = run_pipeline(docs, {"steps": [
        {"op": "lm_bucket_filter", "keep": ["head", "middle"],
         "by": "source"}]})
    # hand chain: score, bucket per source, keep head+middle
    scored = lm.lm_quality(docs)
    buckets = lm.perplexity_buckets(
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "avg_lp_micro"), by="source")
    keep = buckets.filter("ppl_bucket in ('head','middle')") \
        .select("doc_id")
    expected = docs.join(keep, "doc_id", "left_semi")
    assert out.exceptAll(expected).isEmpty()
    assert expected.exceptAll(out).isEmpty()
    # the tail really is dropped (~1/3 per source)
    n_all, n_kept = docs.count(), out.count()
    assert 0.55 < n_kept / n_all < 0.78


def test_pipeline_html_front_door(spark):
    """Raw crawl shape: (url, html) → domain gate → extraction →
    line cleanup, all declaratively."""
    from rulemorph_spark.llm.pipeline import run_pipeline

    rows = [(1, "https://good.org/a",
             "<html><body><p>A page with plenty of useful words to "
             "keep around for training.</p></body></html>"),
            (2, "https://spam.tracker.com/b",
             "<html><body><p>blocked domain page with words.</p>"
             "</body></html>")]
    df = spark.createDataFrame(rows, "doc_id long, url string, "
                                     "html string")
    out = run_pipeline(df, {"steps": [
        {"op": "domain_filter", "domains": ["tracker.com"],
         "mode": "block"},
        {"op": "html_extract"},
        {"op": "c4_clean", "min_line_words": 3}]})
    got = out.collect()
    assert [r["doc_id"] for r in got] == [1]
    assert "useful words" in got[0]["text"]
