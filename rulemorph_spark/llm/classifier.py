"""Learned quality classifier over text — the GPT-3 / CCNet recipe:
train a linear classifier (logistic regression over hashed n-gram
bag-of-words features) to separate "high quality" from "low quality"
text, then score and filter the whole corpus.

Spark-first shapes:
- **featurization is per-row Column work**: tokens (+ bigrams) hash
  into ``num_features`` buckets (JVM ``xxhash64``), per-row counts come
  from a run-length scan of the sorted index array (the same
  shuffle-free trick as ``text.repetition_cols``), L1-normalized.
  No UDF, no shuffle.
- **scoring** is an Arrow-batched pandas UDF over the sparse
  (indices, values) arrays with the dense weight vector broadcast —
  one narrow pass over the corpus, ~a dot product per row.
- **training** is deterministic full-batch gradient descent: each
  iteration scores the (cached) feature table, then the gradient is
  one explode + a feature-keyed aggregation (key space =
  ``num_features``, map-side combinable) collected to the driver
  (≤ num_features rows — model-sized, not corpus-sized).  At 100 TB
  you would train on a sampled slice (classifiers need ~10⁵ rows,
  not the corpus); scoring is the full-corpus pass and stays narrow.

No external ML library — public algorithm, numpy only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import WORD_SPLIT_RE


def _grams(text: Column, bigrams: bool = True) -> Column:
    words = F.split(F.lower(F.trim(text)), WORD_SPLIT_RE)
    if not bigrams:
        return words

    # let-bind the tokenization (see text.shingle_strings) so the
    # bigram construction reuses one evaluated array per row
    def build(w: Column) -> Column:
        pairs = F.zip_with(w, F.slice(w, 2, 2_000_000_000),
                           lambda a, b: F.concat_ws(" ", a, b))
        # zip_with pads the shorter side with null → concat_ws drops
        # it, leaving the trailing unigram; drop that duplicate
        return F.concat(w, F.slice(pairs, 1,
                                   F.greatest(F.size(w) - 1, F.lit(0))))

    return F.transform(F.array(words), build)[0]


def hashed_features(text: Column, num_features: int = 1 << 16,
                    bigrams: bool = True) -> Column:
    """Sparse hashed bag-of-words as a struct column
    ``(indices array<int>, values array<double>)`` — per-row Column
    work only: hash → sort → run-length count → L1 normalize."""
    idx = F.array_sort(F.transform(
        _grams(text, bigrams),
        lambda g: F.pmod(F.xxhash64(g), F.lit(num_features)).cast("int")))
    acc0 = F.struct(
        F.lit(-1).cast("int").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.expr("array()").cast("array<int>").alias("is_"),
        F.expr("array()").cast("array<long>").alias("cs"))

    def step(acc, i):
        same = acc["prev"] == i
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        close = (~same) & (acc["prev"] >= 0)
        return F.struct(
            i.alias("prev"), run.alias("run"),
            F.when(close, F.concat(acc["is_"], F.array(acc["prev"])))
            .otherwise(acc["is_"]).alias("is_"),
            F.when(close, F.concat(acc["cs"], F.array(acc["run"])))
            .otherwise(acc["cs"]).alias("cs"))

    def fin(acc):
        is_ = F.when(acc["prev"] >= 0,
                     F.concat(acc["is_"], F.array(acc["prev"]))) \
               .otherwise(acc["is_"])
        cs = F.when(acc["prev"] >= 0,
                    F.concat(acc["cs"], F.array(acc["run"]))) \
              .otherwise(acc["cs"])
        # total gram count = sum of the run lengths (≡ size(idx), but
        # derived from the ACCUMULATOR: referencing the idx subtree
        # here would re-hash-and-sort the document per element of the
        # normalize lambda below — O(rows²) interpreted-HOF re-eval,
        # measured 19× slower at sf0.1, growing quadratically with
        # document length).  The sum itself is hoisted
        # through a single-element transform so it, too, evaluates
        # once, not per normalized element.
        total = F.aggregate(cs, F.lit(0).cast("long"),
                            lambda a, x: a + x).cast("double")
        return F.element_at(
            F.transform(
                F.array(total),
                lambda tot: F.struct(
                    is_.alias("indices"),
                    F.transform(cs, lambda c: c.cast("double") / tot)
                    .alias("values"))), 1)

    return F.aggregate(idx, acc0, step, fin)


def _margin_udf(weights_bc):
    @F.pandas_udf("double")
    def margin(indices: pd.Series, values: pd.Series) -> pd.Series:
        w = weights_bc.value
        out = np.empty(len(indices))
        for i in range(len(indices)):
            ix = np.asarray(indices.iloc[i], dtype=np.int64)
            if ix.size:
                out[i] = float(np.dot(w[ix],
                                      np.asarray(values.iloc[i])))
            else:
                out[i] = 0.0
        return pd.Series(out)
    return margin


def train_quality_classifier(df: DataFrame, label_col: str,
                             text_col: str = "text",
                             num_features: int = 1 << 16,
                             iters: int = 30, lr: float = 2.0,
                             l2: float = 1e-6,
                             bigrams: bool = True) -> np.ndarray:
    """Full-batch logistic regression on hashed features.  Returns the
    dense weight vector (length ``num_features``).  ``label_col`` is
    0/1.  Deterministic given the data (zero init, fixed schedule)."""
    sc = df.sparkSession.sparkContext
    feats = (df.select(F.col(label_col).cast("double").alias("__y__"),
                       hashed_features(F.col(text_col), num_features,
                                       bigrams).alias("__f__"))
             .select("__y__", F.col("__f__.indices").alias("__i__"),
                     F.col("__f__.values").alias("__v__"))
             .localCheckpoint(eager=True))
    n = feats.count()
    w = np.zeros(num_features)
    for _ in range(iters):
        bc = sc.broadcast(w)
        m = _margin_udf(bc)
        resid = (feats
                 .withColumn("__m__", m(F.col("__i__"), F.col("__v__")))
                 .withColumn("__r__",
                             F.lit(1.0) /
                             (F.lit(1.0) + F.exp(-F.col("__m__")))
                             - F.col("__y__")))
        grad_rows = (resid
                     .select(F.explode(F.arrays_zip(
                         F.col("__i__").alias("i"),
                         F.col("__v__").alias("v"))).alias("z"),
                         F.col("__r__"))
                     .groupBy(F.col("z.i").alias("i"))
                     .agg(F.sum(F.col("z.v") * F.col("__r__"))
                          .alias("g"))
                     .collect())
        grad = np.zeros(num_features)
        for r in grad_rows:
            grad[r["i"]] = r["g"]
        w = w - lr * (grad / n + l2 * w)
        bc.unpersist()
    return w


def score_quality(df: DataFrame, weights: np.ndarray,
                  text_col: str = "text",
                  num_features: int | None = None,
                  bigrams: bool = True,
                  out_col: str = "quality_prob") -> DataFrame:
    """Append the classifier probability — ONE narrow Arrow-batched
    pass over the corpus (this is the 100 TB-scale step)."""
    nf = num_features if num_features is not None else len(weights)
    bc = df.sparkSession.sparkContext.broadcast(np.asarray(weights))
    m = _margin_udf(bc)
    feats = hashed_features(F.col(text_col), nf, bigrams)
    return (df.withColumn("__f__", feats)
            .withColumn("__m__", m(F.col("__f__.indices"),
                                   F.col("__f__.values")))
            .withColumn(out_col,
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m__"))))
            .drop("__f__", "__m__"))
