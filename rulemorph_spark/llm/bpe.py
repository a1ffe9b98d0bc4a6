"""Byte-pair-encoding tokenizer, trained from the corpus and applied
distributed — the real token counter behind token-budget decisions
(the regex ``token_count`` is the cheap estimate; this is the
trainable exact one).

Public recipe (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units"; same shape as GPT-2's tokenizer):

- **Training** operates on the WORD-FREQUENCY table, not the corpus:
  BPE's merge statistics are exactly recoverable from (word, count)
  pairs.  Spark computes that table with one groupBy (key space =
  vocabulary, map-side combined), the driver runs the classic merge
  loop over the bounded table (``max_words`` cap — standard practice;
  at 100 TB the frequency table is still ~10⁶ rows, not 100 TB).
  Deterministic: ties in pair frequency break lexicographically.
- **Encoding** is a narrow distributed pass: merges broadcast to the
  executors, each Arrow batch tokenizes with a per-word memo cache
  (natural-language batches repeat words heavily, so the per-word
  merge loop amortizes to ~O(1) per occurrence).

Within-word segmentation uses character symbols with an end-of-word
marker ``</w>`` (decode = concatenate, marker → space), lowercased
whitespace tokenization — matching the repo's other text operators.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import WORD_SPLIT_RE

EOW = "</w>"


def word_frequencies(df: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """(word, freq) over the lowercased whitespace vocabulary — ONE
    explode + groupBy, the only corpus-wide pass training needs."""
    words = F.split(F.lower(F.trim(F.col(text_col))), WORD_SPLIT_RE)
    return (df.select(F.explode(words).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq")))


def _merge_word(symbols: tuple[str, ...],
                pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if (i < len(symbols) - 1 and
                (symbols[i], symbols[i + 1]) == pair):
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe_from_frequencies(freqs: Iterable[tuple[str, int]],
                               num_merges: int,
                               min_pair_freq: int = 2
                               ) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a (word, count) table.  Pure
    driver-side Python — deterministic (count desc, pair asc)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in freqs:
        vocab[tuple(w) + (EOW,)] = vocab.get(tuple(w) + (EOW,), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {_merge_word(s, pair): c for s, c in vocab.items()}
    return merges


def train_bpe(df: DataFrame, text_col: str = "text",
              num_merges: int = 1000, min_pair_freq: int = 2,
              max_words: int = 100_000) -> list[tuple[str, str]]:
    """Train merges from the corpus: distributed frequency table →
    driver-side merge loop.  ``max_words`` keeps the driver table
    bounded (most frequent words first — the tail contributes
    negligibly to merge statistics and the cut is deterministic via
    the (freq desc, word asc) order)."""
    rows = (word_frequencies(df, text_col)
            .orderBy(F.col("freq").desc(), F.col("word").asc())
            .limit(max_words).collect())
    return train_bpe_from_frequencies(
        [(r["word"], r["freq"]) for r in rows], num_merges,
        min_pair_freq)


def encode_word(word: str, ranks: dict[tuple[str, str], int]
                ) -> tuple[str, ...]:
    """Apply merges to one word: repeatedly merge the lowest-rank
    adjacent pair (the GPT-2 encode loop)."""
    syms = tuple(word) + (EOW,)
    while len(syms) > 1:
        ranked = [(ranks[(syms[i], syms[i + 1])], i)
                  for i in range(len(syms) - 1)
                  if (syms[i], syms[i + 1]) in ranks]
        if not ranked:
            break
        r, _ = min(ranked)
        pair = None
        for rr, i in ranked:
            if rr == r:
                pair = (syms[i], syms[i + 1])
                break
        syms = _merge_word(syms, pair)
    return syms


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "tokens") -> DataFrame:
    """Add ``out_col`` (array<string> of BPE tokens) — one narrow
    Arrow-batched pass, merges broadcast, per-word memo cache."""
    spark = df.sparkSession
    merges_bc = spark.sparkContext.broadcast(
        [tuple(m) for m in merges])

    @F.pandas_udf("array<string>")
    def tok(texts: pd.Series) -> pd.Series:
        ranks = {p: i for i, p in enumerate(merges_bc.value)}
        cache: dict[str, tuple[str, ...]] = {}
        import re
        split = re.compile(WORD_SPLIT_RE)
        out = []
        for t in texts:
            toks: list[str] = []
            if t is not None:
                for w in split.split(t.strip().lower()):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, tok(F.col(text_col)))


def bpe_decode_tokens(tokens: Iterable[str]) -> str:
    """Inverse of the encode segmentation: concatenate, ``</w>`` →
    word boundary."""
    return "".join(t for t in tokens).replace(EOW, " ").strip()


def bpe_token_count(df: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text",
                    out_col: str = "n_tokens") -> DataFrame:
    """Convenience: add the exact trained-tokenizer token count (feed
    into the token-budget binning operators)."""
    enc = bpe_encode(df, merges, text_col, out_col="__toks__")
    return enc.withColumn(out_col,
                          F.size("__toks__").cast("long")) \
        .drop("__toks__")
