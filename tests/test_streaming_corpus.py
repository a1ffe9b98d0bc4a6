"""End-to-end incremental corpus ingestion (streaming/corpus.py):
stream of document files → declarative cleaning → dedup against the
persistent fingerprint store → per-epoch idempotent sink.

Verifies the three invariants the module promises:
1. a drained stream's admitted output == batch dedup_exact survivors
   of the cleaned input;
2. a second stream run over NEW files admits only unseen fingerprints;
3. re-running a fully-committed epoch admits nothing and leaves the
   durable output untouched.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rulemorph_spark.llm.text import fingerprint
from rulemorph_spark.streaming.corpus import (ingest_batch,
                                              ingest_corpus_stream)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _expected_keep_ids(docs_df):
    """batch-side truth: min doc_id per fingerprint."""
    keyed = docs_df.select(fingerprint(F.col("text")).alias("fp"),
                           "doc_id")
    return sorted(r["keep_id"] for r in
                  keyed.groupBy("fp")
                  .agg(F.min("doc_id").alias("keep_id")).collect())


def _drop_file(df, src_dir, name):
    """Materialize df as a single parquet FILE directly inside the
    stream source dir (the file source does not recurse into the
    directory a plain .write.parquet would create)."""
    with tempfile.TemporaryDirectory() as stage:
        df.coalesce(1).write.parquet(os.path.join(stage, "d"))
        part = next(f for f in os.listdir(os.path.join(stage, "d"))
                    if f.endswith(".parquet"))
        shutil.copy(os.path.join(stage, "d", part),
                    os.path.join(src_dir, name))


def _run_stream(spark, src_dir, schema, store, out, ckpt):
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = ingest_corpus_stream(stream, store_path=store, out_path=out,
                             checkpoint_path=ckpt)
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_ingest_matches_batch_dedup(spark):
    docs = _docs(spark)
    schema = docs.schema
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        store, out = os.path.join(d, "store"), os.path.join(d, "out")
        ckpt = os.path.join(d, "ckpt")

        # epoch 1: the first half of the corpus
        first = docs.filter(F.col("doc_id") < 250)
        _drop_file(first, src, "f1.parquet")
        _run_stream(spark, src, schema, store, out, ckpt)
        got1 = sorted(r["doc_id"] for r in
                      spark.read.parquet(out).select("doc_id").collect())
        assert got1 == _expected_keep_ids(first)

        # epoch 2: second half + full overlap with the first half —
        # only fingerprints never seen before may be admitted
        _drop_file(docs, src, "f2.parquet")
        _run_stream(spark, src, schema, store, out, ckpt)
        got2 = sorted(r["doc_id"] for r in
                      spark.read.parquet(out).select("doc_id").collect())
        want_all = _expected_keep_ids(docs)
        # every admitted fingerprint set matches the global batch truth
        got_fps = sorted(r["fp"] for r in spark.read.parquet(out)
                         .select(fingerprint(F.col("text")).alias("fp"))
                         .collect())
        want_fps = sorted(r["fp"] for r in docs
                          .select(fingerprint(F.col("text")).alias("fp"))
                          .distinct().collect())
        assert got_fps == want_fps
        # ids: first-epoch winners stay; new fps admit their min id
        assert set(got1) <= set(got2)
        assert len(got2) == len(want_all)


def test_ingest_batch_rerun_is_idempotent(spark):
    docs = _docs(spark).filter(F.col("doc_id") < 100)
    key = fingerprint(F.col("text"))
    with tempfile.TemporaryDirectory() as d:
        store, out = os.path.join(d, "store"), os.path.join(d, "out")
        n1 = ingest_batch(docs, 0, store_path=store, out_path=out,
                          key=key)
        assert n1 > 0
        first = sorted(r["doc_id"] for r in
                       spark.read.parquet(out).collect())
        # re-run the SAME epoch after full commit: nothing admitted,
        # durable output untouched (the regression the round-1 advisor
        # flagged on dedup_incremental)
        n2 = ingest_batch(docs, 0, store_path=store, out_path=out,
                          key=key)
        assert n2 == 0
        again = sorted(r["doc_id"] for r in
                       spark.read.parquet(out).collect())
        assert again == first


def test_ingest_batch_applies_cleaning_spec(spark):
    docs = _docs(spark).filter(F.col("doc_id") < 200)
    key = fingerprint(F.col("text"))
    spec = {"steps": [{"op": "hash_sample", "fraction": 0.5}]}
    with tempfile.TemporaryDirectory() as d:
        store, out = os.path.join(d, "store"), os.path.join(d, "out")
        ingest_batch(docs, 0, store_path=store, out_path=out, key=key,
                     spec=spec)
        from rulemorph_spark.llm.pipeline import run_pipeline
        from rulemorph_spark.llm.dedup import dedup_exact
        cleaned = run_pipeline(docs, spec)
        want = sorted(r["doc_id"] for r in
                      dedup_exact(cleaned.withColumn("__k__", key),
                                  F.col("__k__"), "doc_id")
                      .select("doc_id").collect())
        got = sorted(r["doc_id"] for r in
                     spark.read.parquet(out).collect())
        assert got == want


def test_versioned_stream_replay_after_checkpoint_loss(spark):
    """The OTHER crash ordering (VERDICT r2 next #7): the epoch fully
    committed (corpus version + fp write) but the crash hit BEFORE the
    streaming checkpoint recorded it.  On restart Structured Streaming
    replays the same batch_id with the same data — the epoch-tag dedup
    (note 'epoch=N' already present) must admit nothing: no duplicate
    rows, no duplicate version, no lost epoch."""
    from rulemorph_spark.sources.versioned import CorpusStore
    from rulemorph_spark.streaming.corpus import \
        ingest_corpus_stream_versioned

    docs = _docs(spark).filter(F.col("doc_id") < 60)
    schema = docs.schema
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        corpus_root = os.path.join(d, "corpus")
        fps = os.path.join(d, "fps")
        ckpt = os.path.join(d, "ckpt")
        _drop_file(docs, src, "b0.parquet")

        def run():
            stream = spark.readStream.schema(schema).parquet(src)
            q = ingest_corpus_stream_versioned(
                stream, corpus_root=corpus_root, fp_store_path=fps,
                checkpoint_path=ckpt)
            q.awaitTermination(120)
            assert not q.isActive

        run()
        store = CorpusStore(spark, corpus_root)
        rows1 = sorted(r["doc_id"] for r in store.read().collect())
        vs1 = [(m["version"], m["note"]) for m in store.versions()]
        assert vs1 and vs1[0][1] == "epoch=0"

        # crash-before-checkpoint: lose the checkpoint entirely → the
        # restarted stream replays batch 0 over the same file
        shutil.rmtree(ckpt)
        run()
        store = CorpusStore(spark, corpus_root)
        assert sorted(r["doc_id"]
                      for r in store.read().collect()) == rows1
        assert [(m["version"], m["note"])
                for m in store.versions()] == vs1  # no new version

        # both orderings stacked: also lose the epoch's fp dir (crash
        # between commit and fp write) before the replay — recovery
        # must rebuild fps from the store's own diff, still admit 0
        shutil.rmtree(os.path.join(fps, "epoch=0"))
        shutil.rmtree(ckpt)
        run()
        store = CorpusStore(spark, corpus_root)
        assert sorted(r["doc_id"]
                      for r in store.read().collect()) == rows1
        assert [(m["version"], m["note"])
                for m in store.versions()] == vs1
        # rebuilt fps still gate later epochs: a recrawl of the same
        # texts admits nothing
        recrawl = docs.withColumn("doc_id", F.col("doc_id") + 10_000)
        _drop_file(recrawl, src, "b1.parquet")
        run()
        store = CorpusStore(spark, corpus_root)
        assert sorted(r["doc_id"]
                      for r in store.read().collect()) == rows1
