"""Declarative corpus-preparation pipelines: a YAML/dict spec compiled
to a chain of the llm operators, in the same spirit as the reference's
rule files (declare WHAT, the engine decides HOW).

Spec shape (note: ``chunk`` reshapes the table to
(doc_id, chunk_index, chunk_text, n_tokens), so steps after it must
name columns that still exist)::

    steps:
      - {op: c4_clean, min_line_words: 3}       # reshapes text
      - {op: gopher_filter}                     # Rae et al. rule set
      - {op: quality_filter, min_score: 0.5}
      - {op: lang_filter, langs: [en]}
      - {op: dedup_exact}                       # by text fingerprint
      - {op: remove_dup_spans, n: 8}            # reshapes text
      - {op: semdedup, vec_col: embedding}      # embedding near-dups
      - {op: pii_redact}
      - {op: mixture_sample, weights: {src0: 1.0, src1: 0.5}}
      - {op: hash_split, weights: {train: 0.98, valid: 0.01,
         test: 0.01}}
      - {op: chunk, chunk_tokens: 64, overlap: 16}
      - {op: token_bins, budget: 2000, part_col: doc_id,
         order_col: chunk_index}

Every step is a thin dispatch onto an existing, individually oracle- or
unit-gated operator; the pipeline itself stays a lazy DataFrame chain,
so Catalyst fuses adjacent narrow steps into one pass over the corpus
and the whole spec runs with the minimum number of shuffles its
operators require.  Unknown ops / bad arity fail at compile time (the
closed-op-set discipline of the reference validator,
``crates/rulemorph/src/v2_validator.rs:666-766``).
"""

from __future__ import annotations

from typing import Any

import yaml
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as _dedup
from . import filters as _filters
from . import sampling as _sampling
from . import text as _text


class PipelineSpecError(ValueError):
    """Unknown op or invalid arguments in a pipeline spec."""


def _quality_filter(df, *, min_score: float, text_col: str = "text"):
    return df.filter(
        F.round(_text.quality_score(F.col(text_col)), 6) >= min_score)


def _lang_filter(df, *, langs: list[str], text_col: str = "text"):
    """Keep documents whose detected language is in ``langs``.  The
    binary en/other detector serves pure-English gates (matching the
    q_text_metrics oracle); requesting any other language switches to
    the multi-language stopword-profile detector."""
    wanted = list(langs)
    if set(wanted) <= {"en", "other"}:
        detected = _text.lang_id_en(F.col(text_col))
    else:
        detected = _text.lang_id_multi(F.col(text_col))
    return df.filter(detected.isin(wanted))


def _dedup_exact(df, *, text_col: str = "text", id_col: str = "doc_id"):
    return _dedup.dedup_exact(df, _text.fingerprint(F.col(text_col)),
                              id_col)


def _pii_redact(df, *, text_col: str = "text"):
    return df.withColumn(text_col, _text.redact_pii(F.col(text_col)))


def _mixture_sample(df, *, weights: dict[str, float],
                    stratum_col: str = "source", id_col: str = "doc_id"):
    return _sampling.mixture_sample(df, stratum_col, weights, id_col)


def _hash_sample(df, *, fraction: float, id_col: str = "doc_id"):
    return _sampling.hash_sample(df, fraction, id_col)


def _decontaminate(df, *, benchmark_path: str, text_col: str = "text",
                   id_col: str = "doc_id", n: int = 8):
    """Drop documents sharing any n-token shingle with the benchmark
    table at ``benchmark_path`` (anti-join against the contaminated-id
    set, which is broadcast-sized)."""
    bench = df.sparkSession.read.parquet(benchmark_path)
    hits = _text.decontaminate(df, bench, text_col, id_col, n)
    return df.join(hits.select(id_col), id_col, "left_anti")


def _chunk(df, *, chunk_tokens: int = 64, overlap: int = 16,
           text_col: str = "text", id_col: str = "doc_id"):
    return _text.chunk_documents(df, text_col, id_col, chunk_tokens,
                                 overlap)


def _token_bins(df, *, budget: int, token_col: str = "n_tokens",
                part_col: str = "source", order_col: str = "doc_id"):
    if token_col not in df.columns:
        df = df.withColumn(token_col,
                           _text.token_count(F.col("text")).cast("long"))
    return _text.assign_token_bins(df, token_col, budget,
                                   part_col=part_col, order_col=order_col)


def _gopher_filter(df, *, text_col: str = "text",
                   id_col: str = "doc_id"):
    return _filters.gopher_filter(df, text_col, id_col)


def _c4_clean(df, *, text_col: str = "text", id_col: str = "doc_id",
              min_line_words: int = 3, min_lines: int = 1):
    return _filters.c4_clean_lines(df, text_col, id_col,
                                   min_line_words, min_lines)


def _remove_dup_spans(df, *, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 8,
                      min_docs: int = 2):
    """NOTE: reshapes to (id, text, n_tokens, removed_tokens) — like
    ``chunk``, later steps must use the new columns."""
    return _dedup.remove_dup_spans(df, text_col, id_col, n, min_docs)


def _semdedup(df, *, id_col: str = "doc_id", vec_col: str = "vec",
              k: int = 16, iters: int = 4, eps: float = 0.05,
              keep: str = "centroid_far"):
    from . import semdedup as _sd
    verdicts = _sd.semdedup(df, id_col, vec_col, k=k, iters=iters,
                            eps=eps, keep=keep)
    keep_ids = verdicts.filter(F.col("keep")).select(id_col)
    return df.join(keep_ids, id_col, "left_semi")


def _dedup_fuzzy(df, *, id_col: str = "doc_id", text_col: str = "text",
                 num_hashes: int = 16, bands: int = 8,
                 threshold: float = 0.7, verify: str = "exact"):
    return _dedup.dedup_fuzzy(df, id_col, text_col,
                              num_hashes=num_hashes, bands=bands,
                              threshold=threshold, verify=verify)


def _hash_split(df, *, id_col: str = "doc_id",
                weights: dict[str, float] | None = None,
                salt: str = "split"):
    return _filters.hash_split(df, id_col, weights, salt)


def _html_extract(df, *, html_col: str = "html",
                  text_col: str = "text"):
    from . import extract as _extract
    return _extract.html_to_text(df, html_col, text_col)


def _domain_filter(df, *, domains: list[str], url_col: str = "url",
                   mode: str = "block", max_labels: int = 5):
    from . import extract as _extract
    return _extract.domain_filter(df, domains, url_col, mode,
                                  max_labels)


def _lm_bucket_filter(df, *, keep: list[str] | None = None,
                      by: str | None = None, text_col: str = "text",
                      id_col: str = "doc_id",
                      cuts: list[float] | None = None):
    """CCNet perplexity stratification as a pipeline gate: self-train a
    unigram LM, bucket head/middle/tail (per ``by`` group if given),
    keep the requested buckets (default: drop the tail)."""
    from . import lm as _lm
    scored = _lm.lm_quality(df, text_col, id_col)
    buckets = _lm.perplexity_buckets(
        scored.select(id_col, "avg_lp_micro")
        if by is None else
        scored.join(df.select(id_col, by), id_col)
        .select(id_col, by, "avg_lp_micro"),
        by=by, cuts=tuple(cuts) if cuts else (1 / 3, 2 / 3))
    wanted = list(keep) if keep is not None else ["head", "middle"]
    ids = buckets.filter(F.col("ppl_bucket").isin(wanted)).select(id_col)
    return df.join(ids, id_col, "left_semi")


_OPS = {
    "html_extract": _html_extract,
    "domain_filter": _domain_filter,
    "quality_filter": _quality_filter,
    "lm_bucket_filter": _lm_bucket_filter,
    "lang_filter": _lang_filter,
    "dedup_exact": _dedup_exact,
    "pii_redact": _pii_redact,
    "mixture_sample": _mixture_sample,
    "hash_sample": _hash_sample,
    "decontaminate": _decontaminate,
    "chunk": _chunk,
    "token_bins": _token_bins,
    "gopher_filter": _gopher_filter,
    "c4_clean": _c4_clean,
    "remove_dup_spans": _remove_dup_spans,
    "semdedup": _semdedup,
    "dedup_fuzzy": _dedup_fuzzy,
    "hash_split": _hash_split,
}


def compile_pipeline(spec: str | dict[str, Any]):
    """Parse + validate a pipeline spec → ``DataFrame -> DataFrame``.

    Validation is eager: unknown ops, non-dict steps, and unknown /
    missing kwargs (checked by binding against the operator's
    signature) fail here, not mid-job — the reference's
    validate-before-run contract.  Errors raised inside an operator at
    run time propagate unwrapped, with their original tracebacks.
    """
    import inspect

    if isinstance(spec, str):
        spec = yaml.safe_load(spec)
    if not isinstance(spec, dict) or not isinstance(spec.get("steps"), list):
        raise PipelineSpecError("spec must be a mapping with a 'steps' list")
    steps = []
    for i, step in enumerate(spec["steps"]):
        if not isinstance(step, dict) or "op" not in step:
            raise PipelineSpecError(f"steps[{i}] must be a mapping with 'op'")
        kwargs = {k: v for k, v in step.items() if k != "op"}
        fn = _OPS.get(step["op"])
        if fn is None:
            raise PipelineSpecError(
                f"steps[{i}]: unknown op {step['op']!r} "
                f"(known: {sorted(_OPS)})")
        try:
            inspect.signature(fn).bind(None, **kwargs)
        except TypeError as e:
            raise PipelineSpecError(
                f"steps[{i}] ({step['op']}): {e}") from None
        steps.append((fn, kwargs))

    def run(df: DataFrame) -> DataFrame:
        for fn, kwargs in steps:
            df = fn(df, **kwargs)
        return df

    return run


def run_pipeline(df: DataFrame, spec: str | dict[str, Any]) -> DataFrame:
    return compile_pipeline(spec)(df)
