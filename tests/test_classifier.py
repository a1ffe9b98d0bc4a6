"""Learned quality classifier (llm/classifier.py): hashed-feature
logistic regression — featurization correctness vs a Python reference,
training convergence on separable data, and full-GD parity with a
NumPy implementation of the identical schedule.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

XX = None  # filled lazily: Spark's xxhash64 via a probe query

D = 1 << 12


def _spark_xxhash(spark, grams: list[str]) -> list[int]:
    """Replay Spark's xxhash64 % D for given strings."""
    if not grams:
        return []
    df = spark.createDataFrame([(g,) for g in grams], ["g"])
    rows = (df.select("g", F.pmod(F.xxhash64("g"), F.lit(D))
                      .cast("int").alias("h")).collect())
    m = {r["g"]: r["h"] for r in rows}
    return [m[g] for g in grams]


def _py_features(spark, text: str):
    words = text.strip().lower().split()
    grams = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
    hs = _spark_xxhash(spark, grams)
    counts: dict[int, int] = {}
    for h in hs:
        counts[h] = counts.get(h, 0) + 1
    total = float(len(hs))
    idx = sorted(counts)
    return idx, [counts[i] / total for i in idx]


def _toy_corpus(spark, n=200):
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, f"helpful detailed article number {i} with "
                            f"clear structured explanation", 1))
        else:
            rows.append((i, f"buy cheap pills now {i} click winner "
                            f"free prize spam", 0))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_hashed_features_match_python(spark):
    from rulemorph_spark.llm.classifier import hashed_features
    df = _toy_corpus(spark, 6)
    got = (df.select("text",
                     hashed_features(F.col("text"), D).alias("f"))
           .collect())
    for r in got:
        idx, vals = _py_features(spark, r["text"])
        assert list(r["f"]["indices"]) == idx
        assert np.allclose(list(r["f"]["values"]), vals)


def test_training_separates_toy_corpus(spark):
    from rulemorph_spark.llm.classifier import (score_quality,
                                                train_quality_classifier)
    df = _toy_corpus(spark).cache()
    w = train_quality_classifier(df, "label", num_features=D, iters=30,
                                 lr=8.0)
    scored = score_quality(df, w, num_features=D)
    acc = (scored.select(
        ((F.col("quality_prob") > 0.5).cast("int") == F.col("label"))
        .cast("int").alias("ok")).agg(F.avg("ok")).collect()[0][0])
    assert acc >= 0.99
    # scores are actual probabilities, separated
    stats = scored.groupBy("label").agg(
        F.avg("quality_prob").alias("m")).collect()
    by = {r["label"]: r["m"] for r in stats}
    assert by[1] > 0.75 and by[0] < 0.25


def test_training_matches_numpy_reference(spark):
    from rulemorph_spark.llm.classifier import (hashed_features,
                                                train_quality_classifier)
    df = _toy_corpus(spark, 60).cache()
    iters, lr, l2 = 8, 1.0, 1e-4
    w = train_quality_classifier(df, "label", num_features=D,
                                 iters=iters, lr=lr, l2=l2)

    feats = (df.select("label",
                       hashed_features(F.col("text"), D).alias("f"))
             .collect())
    ys = np.array([r["label"] for r in feats], dtype=float)
    sparse = [(np.array(list(r["f"]["indices"])),
               np.array(list(r["f"]["values"]))) for r in feats]
    n = len(ys)
    wr = np.zeros(D)
    for _ in range(iters):
        grad = np.zeros(D)
        for (ix, v), y in zip(sparse, ys):
            m = float(wr[ix] @ v) if ix.size else 0.0
            r = 1.0 / (1.0 + np.exp(-m)) - y
            grad[ix] += v * r
        wr = wr - lr * (grad / n + l2 * wr)
    assert np.allclose(w, wr, atol=1e-8)


def test_scoring_is_single_narrow_pass(spark):
    import re
    from rulemorph_spark.llm.classifier import score_quality
    df = _toy_corpus(spark, 20)
    plan = (score_quality(df, np.zeros(D), num_features=D)
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" in plan
    assert not re.findall(r"Exchange (?:hashpartitioning|"
                          r"rangepartitioning|SinglePartition)", plan)
