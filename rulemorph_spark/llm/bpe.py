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
    driver-side Python — deterministic (count desc, pair asc).

    Incremental trainer (the standard BPE trick, VERDICT r2 next #6):
    instead of recounting every pair over the whole vocabulary per
    merge (O(vocab × merges)), it keeps

    - exact pair counts, updated only for the words CONTAINING the
      merged pair (an inverted ``pair → word ids`` index finds them),
    - a lazy-deletion heap of ``(-count, pair)`` candidates: stale
      entries are discarded on pop by checking the live count, so the
      arg-min per merge is O(log P) amortized instead of an O(P) scan.

    Produces the IDENTICAL merge sequence to the full recount (counts
    are exact at every step; the heap's tuple order is exactly the
    old ``min(..., key=(-count, pair))`` tie-break).
    """
    import heapq

    agg: dict[tuple[str, ...], int] = {}
    for w, c in freqs:
        k = tuple(w) + (EOW,)
        agg[k] = agg.get(k, 0) + c
    words: list[list] = [[list(s), c] for s, c in agg.items()]

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, c) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            where.setdefault(p, set()).add(wi)
    heap = [(-n, p) for p, n in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negn, pair = heapq.heappop(heap)
        live = pair_counts.get(pair)
        if live is None or live != -negn:
            continue                      # stale heap entry
        if live < min_pair_freq:
            break                         # heap top = global max count
        merges.append(pair)
        # pop first: the per-word bookkeeping below discards members
        # of other pairs' sets and must not mutate the one we iterate
        affected = where.pop(pair, set())
        for wi in affected:               # only words containing it
            syms, c = words[wi]
            old_pairs = [(syms[i], syms[i + 1])
                         for i in range(len(syms) - 1)]
            for p in old_pairs:
                n = pair_counts[p] - c
                if n <= 0:
                    del pair_counts[p]
                else:
                    pair_counts[p] = n
            new_syms = list(_merge_word(tuple(syms), pair))
            words[wi][0] = new_syms
            new_pairs = [(new_syms[i], new_syms[i + 1])
                         for i in range(len(new_syms) - 1)]
            touched = set(old_pairs) | set(new_pairs)
            for p in new_pairs:
                pair_counts[p] = pair_counts.get(p, 0) + c
            for p in touched:
                n = pair_counts.get(p)
                if n is not None and p != pair:
                    heapq.heappush(heap, (-n, p))
            olds, news = set(old_pairs), set(new_pairs)
            for p in olds - news:
                s = where.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del where[p]
            for p in news - olds:
                where.setdefault(p, set()).add(wi)
        pair_counts.pop(pair, None)
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
