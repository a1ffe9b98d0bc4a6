"""Versioned corpus store: snapshot-isolated reads over immutable
parquet — the continual-pretraining bookkeeping layer (which exact
corpus trained run N? what did last week's ingest add?) implemented
with the transaction-log recipe the public lakehouse formats use
(Delta Lake: Armbrust et al., VLDB 2020): immutable data directories +
an ordered log of manifest files; a version IS its manifest.

Layout under ``root``::

    data/<hex>/part-*.parquet     immutable once written
    _versions/v0000000001.json    {"dirs": [...], "note": ..., "ts"?}

Commit protocol (crash-safe, single-writer):

1. write the new data directory FULLY (Spark parquet write);
2. write the manifest to a temp name, then atomically rename it to
   ``v<next>.json``.

A crash between 1 and 2 leaves an orphan data dir that no manifest
references — invisible to every reader, reclaimable by ``vacuum()``.
Readers never see a partial commit: they list ``_versions``, pick the
highest (or requested) version, and read exactly its directories.
Time travel is ``read(version=k)``; nothing is ever rewritten, so old
versions stay exactly reproducible until explicitly vacuumed.

Scale notes (100 TB): manifests hold directory paths, not file lists —
listing/planning stays O(dirs) on the driver while the data itself is
read by the normal distributed parquet scan (predicate pushdown /
partition pruning untouched, since ``spark.read.parquet(*dirs)`` is
the same multi-path scan users write by hand).  All filesystem access
goes through the Hadoop FileSystem API, so file://, hdfs://, s3a://
all work.  Concurrency: single writer by design (the rename-commit
rejects an already-existing version file, so two racing writers
cannot both win the same version number).
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed this version number first."""


class CorpusStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(self.root).getFileSystem(
            spark._jsc.hadoopConfiguration())

    # ------------------------------------------------------------ paths
    def _versions_dir(self):
        return self._Path(f"{self.root}/_versions")

    def _version_path(self, v: int):
        return self._Path(f"{self.root}/_versions/v{v:010d}.json")

    # ---------------------------------------------------------- reading
    def versions(self) -> list[dict]:
        """Ordered commit log: [{version, note, dirs}, ...]."""
        vd = self._versions_dir()
        if not self._fs.exists(vd):
            return []
        out = []
        for st in self._fs.listStatus(vd):
            name = st.getPath().getName()
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            v = int(name[1:-5])
            stream = self._fs.open(st.getPath())
            try:
                raw = bytes(
                    self.spark._jvm.org.apache.commons.io.IOUtils
                    .toByteArray(stream))
            finally:
                stream.close()
            m = json.loads(raw.decode("utf-8"))
            out.append({"version": v, "note": m.get("note"),
                        "dirs": m["dirs"]})
        return sorted(out, key=lambda m: m["version"])

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1]["version"] if vs else None

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read of ``version`` (default: latest)."""
        vs = {m["version"]: m for m in self.versions()}
        if not vs:
            raise FileNotFoundError(f"no commits under {self.root}")
        v = max(vs) if version is None else version
        if v not in vs:
            raise FileNotFoundError(f"version {v} does not exist "
                                    f"(have {sorted(vs)})")
        return self.spark.read.parquet(*vs[v]["dirs"])

    def diff(self, v_old: int, v_new: int) -> dict[str, list[str]]:
        """Data directories added / removed between two versions."""
        vs = {m["version"]: set(m["dirs"]) for m in self.versions()}
        return {"added": sorted(vs[v_new] - vs[v_old]),
                "removed": sorted(vs[v_old] - vs[v_new])}

    # ---------------------------------------------------------- writing
    def _write_data_dir(self, df: DataFrame) -> str:
        d = f"{self.root}/data/{uuid.uuid4().hex}"
        df.write.parquet(d)
        return d

    def _commit(self, dirs: list[str], note: str | None) -> int:
        v = (self.latest_version() or 0) + 1
        payload = json.dumps({"dirs": dirs, "note": note},
                             ensure_ascii=False).encode("utf-8")
        self._fs.mkdirs(self._versions_dir())
        tmp = self._Path(
            f"{self.root}/_versions/.tmp-{uuid.uuid4().hex}")
        stream = self._fs.create(tmp, True)
        try:
            stream.write(payload)
        finally:
            stream.close()
        final = self._version_path(v)
        # rename refuses to clobber an existing file → the losing
        # racer of two concurrent commits fails loudly, never
        # silently overwrites
        if not self._fs.rename(tmp, final):
            self._fs.delete(tmp, False)
            raise CommitConflict(
                f"version {v} was committed concurrently")
        return v

    def append(self, df: DataFrame, note: str | None = None) -> int:
        """New version = previous snapshot + ``df``.  Returns the
        committed version number."""
        prev = self.versions()
        dirs = (prev[-1]["dirs"] if prev else []) + \
            [self._write_data_dir(df)]
        return self._commit(dirs, note)

    def overwrite(self, df: DataFrame, note: str | None = None) -> int:
        """New version containing ONLY ``df`` (old versions still
        readable — nothing is deleted)."""
        return self._commit([self._write_data_dir(df)], note)

    # --------------------------------------------------------- cleaning
    def vacuum(self, keep_from_version: int = 1) -> list[str]:
        """Delete data directories unreachable from every version ≥
        ``keep_from_version`` (and drop the older manifests).  Orphan
        dirs from crashed commits are removed too.  Returns deleted
        paths."""
        vs = self.versions()
        keep = {d for m in vs if m["version"] >= keep_from_version
                for d in m["dirs"]}
        deleted = []
        data_root = self._Path(f"{self.root}/data")
        if self._fs.exists(data_root):
            for st in self._fs.listStatus(data_root):
                p = st.getPath()
                full = f"{self.root}/data/{p.getName()}"
                if full not in keep:
                    self._fs.delete(p, True)
                    deleted.append(full)
        for m in vs:
            if m["version"] < keep_from_version:
                self._fs.delete(self._version_path(m["version"]), False)
        return deleted
