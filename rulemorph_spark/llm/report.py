"""Corpus health report: the per-source statistics table every
curation pipeline prints between stages (docs, tokens, quality, lang
mix, duplicate pressure) — ONE aggregation pass over the corpus.

Scale shape (100 TB):
- every signal is a per-row Column (token counts, quality score,
  lang id, fingerprint) feeding ONE groupBy(source) — map-side
  partial aggregation, shuffle key space = number of sources;
- distinct fingerprints use the HLL sketch (``approx_count_distinct``)
  — exact distinct would carry every fingerprint through the shuffle,
  the sketch carries ~1.6 KB per group;
- token percentiles use the same mergeable-sketch route
  (``approx_percentile``).

The approximate columns are suffixed ``_approx`` so downstream
consumers can't mistake them for exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, lang_id_en, quality_score, token_count


def corpus_report(df: DataFrame, text_col: str = "text",
                  source_col: str = "source") -> DataFrame:
    """Per-source report: one row per source with document counts,
    token statistics (sum/avg/p50/p95), mean quality, english
    fraction, and the approximate exact-duplicate fraction
    (1 − distinct fingerprints / docs)."""
    text = F.col(text_col)
    base = df.select(
        F.col(source_col).alias("source"),
        token_count(text).cast("long").alias("__tok__"),
        F.length(text).cast("long").alias("__chars__"),
        quality_score(text).alias("__q__"),
        (lang_id_en(text) == "en").cast("int").alias("__en__"),
        fingerprint(text).alias("__fp__"))
    agg = base.groupBy("source").agg(
        F.count("*").alias("docs"),
        F.sum("__tok__").alias("tokens"),
        F.round(F.avg("__tok__"), 2).alias("avg_tokens"),
        F.percentile_approx("__tok__", [0.5, 0.95])
        .alias("__tok_pct__"),
        F.sum("__chars__").alias("chars"),
        F.round(F.avg("__q__"), 4).alias("avg_quality"),
        F.round(F.avg("__en__"), 4).alias("english_frac"),
        F.approx_count_distinct("__fp__").alias("__dfp__"))
    return agg.select(
        "source", "docs", "tokens", "avg_tokens",
        F.col("__tok_pct__")[0].alias("p50_tokens"),
        F.col("__tok_pct__")[1].alias("p95_tokens"),
        "chars", "avg_quality", "english_frac",
        F.round(F.greatest(
            F.lit(0.0),
            F.lit(1.0) - F.col("__dfp__").cast("double") /
            F.col("docs").cast("double")), 4)
        .alias("dup_frac_approx"))


def corpus_report_total(df: DataFrame,
                        text_col: str = "text") -> DataFrame:
    """Whole-corpus single-row variant of :func:`corpus_report`."""
    return corpus_report(
        df.withColumn("__all__", F.lit("ALL")), text_col,
        source_col="__all__")
