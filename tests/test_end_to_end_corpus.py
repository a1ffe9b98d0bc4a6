"""End-to-end corpus preparation: raw NDJSON with corrupt lines →
quarantine ingest → quality gates → exact + fuzzy dedup → span trim →
split → report.  One integration path over the real operator surface —
the flow a user of the engine actually runs.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _write_crawl(tmp_path):
    boiler = ("subscribe to our newsletter for daily updates and "
              "special offers from our partners every single morning")
    good_body = ("the quick brown fox jumps over the lazy dog and then "
                 "keeps running through the quiet field while the "
                 "farmer watches from the old wooden fence near the "
                 "barn as evening light settles slowly over the warm "
                 "countryside and the animals begin to rest for the "
                 "night after a long day of honest work in the sun")
    def doc_text(i):
        # shared head + boiler tail (span-trim targets) around a long
        # per-doc unique middle (keeps pairwise Jaccard far below the
        # dedup threshold)
        unique = " ".join(f"marker{j} nr{i} word{i}x{j}"
                          for j in range(20))
        return f"{good_body} {unique} {boiler}"

    lines = []
    for i in range(30):
        lines.append(json.dumps(
            {"doc_id": i, "text": doc_text(i), "source": f"src{i % 3}"}))
    # exact duplicates of doc 0 under new ids
    for i in (100, 101):
        lines.append(json.dumps(
            {"doc_id": i, "text": doc_text(0), "source": "src0"}))
    lines.insert(7, "{corrupt line that will not parse")
    lines.insert(19, "another corrupt entry")
    p = tmp_path / "crawl.ndjson"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_corpus_prep_end_to_end(spark, tmp_path):
    from rulemorph_spark.llm.dedup import dedup_fuzzy, remove_dup_spans
    from rulemorph_spark.llm.filters import gopher_filter, hash_split
    from rulemorph_spark.llm.report import corpus_report
    from rulemorph_spark.sources import read_ndjson_quarantine

    path = _write_crawl(tmp_path)
    good, quarantine = read_ndjson_quarantine(
        spark, path, "doc_id long, text string, source string")
    assert quarantine.count() == 2
    assert good.count() == 32

    gated = gopher_filter(good)
    assert gated.count() == 32  # constructed docs pass every rule

    # fuzzy dedup folds the two exact re-crawls of doc 0
    deduped = dedup_fuzzy(gated, threshold=0.9)
    kept_ids = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert 0 in kept_ids and not ({100, 101} & kept_ids)
    assert len(kept_ids) == 30

    # span trim removes the shared boilerplate tail from every doc
    trimmed = remove_dup_spans(deduped, n=8, min_docs=5)
    rows = trimmed.collect()
    assert all("subscribe" not in r["text"] for r in rows)
    assert all(r["removed_tokens"] >= 8 for r in rows)
    # the unique marker and body survive
    assert all("marker" in r["text"] for r in rows)

    # deterministic split, then the health report over the final table
    final = hash_split(
        trimmed.join(deduped.select("doc_id", "source"), "doc_id"),
        weights={"train": 0.9, "valid": 0.1})
    rep = {r["source"]: r for r in
           corpus_report(final).collect()}
    assert sum(r["docs"] for r in rep.values()) == 30
    assert all(r["dup_frac_approx"] <= 0.1 for r in rep.values())

    # whole flow is deterministic: re-running from the raw file gives
    # byte-identical output
    good2, _ = read_ndjson_quarantine(
        spark, path, "doc_id long, text string, source string")
    final2 = hash_split(
        remove_dup_spans(dedup_fuzzy(gopher_filter(good2),
                                     threshold=0.9), n=8, min_docs=5)
        .join(dedup_fuzzy(gopher_filter(good2), threshold=0.9)
              .select("doc_id", "source"), "doc_id"),
        weights={"train": 0.9, "valid": 0.1})
    assert sorted(map(tuple, final.collect())) == \
        sorted(map(tuple, final2.collect()))
