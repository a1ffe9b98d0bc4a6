"""Sequence packing materialization (text.pack_sequences): bins become
trainer-ready rows with order, totals, and utilization."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    rows = [(i, f"src{i % 2}", " ".join(f"w{i}x{j}" for j in range(10)),
             10) for i in range(12)]
    return spark.createDataFrame(
        rows, ["doc_id", "source", "text", "n_tokens"])


def test_pack_sequences_matches_binning(spark):
    from rulemorph_spark.llm.text import (assign_token_bins,
                                          pack_sequences)
    df = _docs(spark)
    packed = pack_sequences(df, "n_tokens", budget=25,
                            part_col="source", order_col="doc_id")
    binned = assign_token_bins(df, "n_tokens", 25, "source", "doc_id")

    want = {}
    for r in binned.collect():
        want.setdefault((r["source"], r["bin"]), []).append(r["doc_id"])
    got = {(r["source"], r["bin"]): r for r in packed.collect()}
    assert set(got) == set(want)
    for k, ids in want.items():
        r = got[k]
        assert r["docs"] == sorted(ids)           # deterministic order
        assert r["n_docs"] == len(ids)
        assert r["n_tokens"] == 10 * len(ids)
        assert r["fill_frac"] == round(10 * len(ids) / 25, 4)
        # concatenated text is the members' text in order
        assert r["text"].count("\n") == len(ids) - 1
        first = r["text"].split("\n")[0]
        assert first.startswith(f"w{sorted(ids)[0]}x0")


def test_pack_sequences_budget_shapes(spark):
    from rulemorph_spark.llm.text import pack_sequences
    df = _docs(spark)
    packed = pack_sequences(df, "n_tokens", budget=30,
                            part_col="source", order_col="doc_id")
    rows = packed.collect()
    # 6 docs × 10 tokens per source, budget 30 → 2 bins of 3 per source
    assert len(rows) == 4
    assert all(r["n_docs"] == 3 and r["n_tokens"] == 30 and
               r["fill_frac"] == 1.0 for r in rows)
