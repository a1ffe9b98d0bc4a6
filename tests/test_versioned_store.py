"""Versioned corpus store (sources/versioned.py): snapshot isolation,
time travel, crash-orphan invisibility, vacuum, commit conflicts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _store(spark, tmp_path):
    from rulemorph_spark.sources.versioned import CorpusStore
    return CorpusStore(spark, str(tmp_path / "store"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"))


def test_append_read_time_travel(spark, tmp_path):
    st = _store(spark, tmp_path)
    v1 = st.append(_df(spark, 0, 10), note="initial crawl")
    v2 = st.append(_df(spark, 10, 15), note="day 2")
    assert (v1, v2) == (1, 2)
    assert st.latest_version() == 2
    assert st.read().count() == 15
    assert st.read(version=1).count() == 10
    assert sorted(r["doc_id"] for r in st.read(version=2).collect()) \
        == list(range(15))
    vs = st.versions()
    assert [m["note"] for m in vs] == ["initial crawl", "day 2"]
    d = st.diff(1, 2)
    assert len(d["added"]) == 1 and d["removed"] == []


def test_overwrite_keeps_old_versions_readable(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.append(_df(spark, 0, 10))
    st.overwrite(_df(spark, 100, 103), note="rebuild")
    assert st.read().count() == 3
    assert st.read(version=1).count() == 10  # time travel intact


def test_orphan_data_dir_is_invisible_and_vacuumable(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.append(_df(spark, 0, 10))
    # simulate a crash between data write and manifest commit
    orphan = st._write_data_dir(_df(spark, 50, 60))
    assert st.read().count() == 10  # reader never sees it
    deleted = st.vacuum()
    assert deleted == [orphan]
    assert st.read().count() == 10


def test_vacuum_reclaims_pre_overwrite_dirs(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.append(_df(spark, 0, 10))
    st.overwrite(_df(spark, 100, 103))
    deleted = st.vacuum(keep_from_version=2)
    assert len(deleted) == 1
    assert st.read().count() == 3
    with pytest.raises(FileNotFoundError):
        st.read(version=1)


def test_commit_conflict_detected(spark, tmp_path):
    from rulemorph_spark.sources.versioned import CommitConflict
    st = _store(spark, tmp_path)
    st.append(_df(spark, 0, 5))
    # another writer lands v2 first
    other = _store(spark, tmp_path)
    other.append(_df(spark, 5, 8))
    # simulate this writer racing for the SAME version number
    d = st._write_data_dir(_df(spark, 8, 9))
    import json
    v = 2
    tmp = st._Path(f"{st.root}/_versions/.tmp-race")
    s = st._fs.create(tmp, True)
    s.write(json.dumps({"dirs": [d], "note": None}).encode())
    s.close()
    assert not st._fs.rename(tmp, st._version_path(v))


def test_read_missing_version_errors(spark, tmp_path):
    st = _store(spark, tmp_path)
    with pytest.raises(FileNotFoundError):
        st.read()
    st.append(_df(spark, 0, 3))
    with pytest.raises(FileNotFoundError):
        st.read(version=7)


# -------------------------------------- versioned exactly-once ingestion

def _ingest(spark, tmp_path, batch, batch_id):
    from rulemorph_spark.llm.text import fingerprint
    from rulemorph_spark.sources.versioned import CorpusStore
    from rulemorph_spark.streaming.corpus import ingest_batch_versioned
    corpus = CorpusStore(spark, str(tmp_path / "corpus"))
    return corpus, ingest_batch_versioned(
        batch, batch_id, corpus=corpus,
        fp_store_path=str(tmp_path / "fps"),
        key=fingerprint(F.col("text")))


def _docs(spark, pairs):
    return spark.createDataFrame(pairs, ["doc_id", "text"])


def test_versioned_ingest_epochs_and_dedup(spark, tmp_path):
    b1 = _docs(spark, [(1, "first unique document text here"),
                       (2, "second unique document text here")])
    corpus, n1 = _ingest(spark, tmp_path, b1, 0)
    assert n1 == 2
    # epoch 2: one repeat of doc 1's text + one new doc
    b2 = _docs(spark, [(10, "first unique document text here"),
                       (11, "a third topic appears in epoch two")])
    corpus, n2 = _ingest(spark, tmp_path, b2, 1)
    assert n2 == 1
    assert corpus.read().count() == 3
    assert corpus.read(version=1).count() == 2
    assert [m["note"] for m in corpus.versions()] == \
        ["epoch=0", "epoch=1"]


def test_versioned_ingest_rerun_admits_nothing(spark, tmp_path):
    b1 = _docs(spark, [(1, "alpha doc"), (2, "beta doc")])
    _ingest(spark, tmp_path, b1, 0)
    corpus, again = _ingest(spark, tmp_path, b1, 0)
    assert again == 0
    assert corpus.read().count() == 2
    assert corpus.latest_version() == 1  # no duplicate version


def test_versioned_ingest_crash_recovery_rebuilds_fps(spark, tmp_path):
    import shutil
    b1 = _docs(spark, [(1, "alpha doc"), (2, "beta doc")])
    _ingest(spark, tmp_path, b1, 0)
    # simulate a crash AFTER the manifest commit but BEFORE the fp
    # write: delete the epoch's fp dir
    shutil.rmtree(str(tmp_path / "fps" / "epoch=0"))
    corpus, n = _ingest(spark, tmp_path, b1, 0)
    assert n == 0  # epoch already committed
    # fps were rebuilt from the store's own diff: a later epoch with
    # the same text is correctly rejected
    b2 = _docs(spark, [(9, "alpha doc"), (10, "gamma fresh doc")])
    corpus, n2 = _ingest(spark, tmp_path, b2, 1)
    assert n2 == 1
    assert sorted(r["doc_id"] for r in corpus.read().collect()) == \
        [1, 2, 10]
