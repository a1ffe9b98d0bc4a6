"""Trainable BPE tokenizer (llm/bpe.py): merge-loop correctness on a
hand-computable corpus, distributed-encode ≡ driver-encode parity,
decode round trip, and token counting."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_merge_loop_hand_example():
    from rulemorph_spark.llm.bpe import (EOW,
                                         train_bpe_from_frequencies)
    # classic Sennrich example shape: 'low'×5, 'lowest'×2, 'newer'×6
    merges = train_bpe_from_frequencies(
        [("low", 5), ("lowest", 2), ("newer", 6)],
        num_merges=4, min_pair_freq=2)
    # hand-derived: (w,e)=2+6=8 wins round 1; (l,o)=7 round 2; then
    # the 6-count tie (e,we)/(n,e)/(r,</w>)/(we,r) breaks
    # lexicographically to (e,we); newer = n·ewe·r → (ewe,r) round 4
    assert merges == [("w", "e"), ("l", "o"), ("e", "we"),
                      ("ewe", "r")]
    assert EOW == "</w>"


def test_encode_word_follows_merge_order():
    from rulemorph_spark.llm.bpe import EOW, encode_word
    ranks = {("e", "r"): 0, ("er", EOW): 1, ("l", "o"): 2,
             ("lo", "w"): 3}
    # lower: (e,r)→er, (er,</w>)→er</w>, (l,o)→lo, (lo,w)→low
    assert encode_word("lower", ranks) == ("low", "er" + EOW)
    assert encode_word("newer", ranks) == ("n", "e", "w", "er</w>")
    assert encode_word("low", ranks) == ("low", EOW)


def test_train_and_encode_distributed_matches_driver(spark):
    from rulemorph_spark.llm.bpe import (bpe_encode, encode_word,
                                         train_bpe)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(F.col("doc_id") < 100)
    merges = train_bpe(docs, num_merges=80, min_pair_freq=2)
    assert len(merges) == 80

    got = {r["doc_id"]: r["tokens"]
           for r in bpe_encode(docs, merges).collect()}
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for r in docs.collect():
        toks = []
        for w in r["text"].strip().lower().split():
            toks.extend(encode_word(w, ranks))
        assert got[r["doc_id"]] == toks, r["doc_id"]


def test_decode_round_trip(spark):
    from rulemorph_spark.llm.bpe import (bpe_decode_tokens, bpe_encode,
                                         train_bpe)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(F.col("doc_id") < 50)
    merges = train_bpe(docs, num_merges=50)
    enc = bpe_encode(docs, merges).collect()
    for r in enc:
        original = " ".join(r["text"].strip().lower().split())
        assert bpe_decode_tokens(r["tokens"]) == original


def test_token_count_compresses_with_more_merges(spark):
    from rulemorph_spark.llm.bpe import bpe_token_count, train_bpe
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(F.col("doc_id") < 100)
    few = train_bpe(docs, num_merges=5)
    many = train_bpe(docs, num_merges=200)
    n_few = bpe_token_count(docs, few) \
        .agg(F.sum("n_tokens")).collect()[0][0]
    n_many = bpe_token_count(docs, many) \
        .agg(F.sum("n_tokens")).collect()[0][0]
    # more merges → strictly better compression on this corpus
    assert n_many < n_few
    # and never fewer than one token per word
    n_words = docs.select(
        F.sum(F.size(F.split(F.lower(F.trim(F.col("text"))),
                             r"\s+")))).collect()[0][0]
    assert n_many >= n_words


def test_word_frequencies_matches_sql(spark):
    from rulemorph_spark.llm.bpe import word_frequencies
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {(r["word"], r["freq"])
           for r in word_frequencies(docs).collect()}
    import duckdb
    con = duckdb.connect()
    want = set(map(tuple, con.execute(f"""
        SELECT w AS word, COUNT(*) AS freq FROM (
          SELECT unnest(string_split_regex(
                   lower(trim(text)), '\\s+')) AS w
          FROM '{SF_DIR}/documents.parquet') t
        WHERE w != '' GROUP BY w""").fetchall()))
    assert got == want


def test_incremental_trainer_matches_full_recount():
    """The heap+inverted-index trainer must produce the IDENTICAL
    merge sequence to the classic full-recount loop (exact counts at
    every step, same (count desc, pair asc) tie-break) — including
    overlapping-pair words like 'aaaa'."""
    import random

    from rulemorph_spark.llm.bpe import (EOW, _merge_word,
                                         train_bpe_from_frequencies)

    def full_recount(freqs, num_merges, min_pair_freq=2):
        vocab = {}
        for w, c in freqs:
            vocab[tuple(w) + (EOW,)] = vocab.get(tuple(w) + (EOW,), 0) + c
        merges = []
        for _ in range(num_merges):
            pairs = {}
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pairs[p] = pairs.get(p, 0) + c
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < min_pair_freq:
                break
            merges.append(best[0])
            vocab = {_merge_word(s, best[0]): c for s, c in vocab.items()}
        return merges

    rng = random.Random(11)
    freqs = [("".join(rng.choice("abcdef") for _ in
                      range(rng.randint(1, 9))), rng.randint(1, 40))
             for _ in range(1500)]
    freqs += freqs[:100]  # duplicate words must aggregate
    for nm in (1, 7, 60, 200):
        assert full_recount(freqs, nm) == \
            train_bpe_from_frequencies(freqs, nm), nm
    overlap = [("a" * n, n * 3 + 1) for n in range(1, 25)] + \
              [("ab" * n, n) for n in range(1, 15)]
    assert full_recount(overlap, 80) == \
        train_bpe_from_frequencies(overlap, 80)


def test_incremental_trainer_scales_to_many_merges():
    """8k merges over a 20k-word table stay in interactive time (the
    old full recount extrapolates to ~minutes)."""
    import random
    import time

    from rulemorph_spark.llm.bpe import train_bpe_from_frequencies

    rng = random.Random(3)
    freqs = [("".join(rng.choice("abcdefghijkl") for _ in
                      range(rng.randint(2, 12))), rng.randint(1, 500))
             for _ in range(20000)]
    t0 = time.perf_counter()
    merges = train_bpe_from_frequencies(freqs, 8000)
    took = time.perf_counter() - t0
    assert len(merges) > 4000
    assert took < 60, f"incremental trainer too slow: {took:.1f}s"
