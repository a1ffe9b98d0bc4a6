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
import re
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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

    def _check_schema(self, df: DataFrame, dirs: list[str]) -> None:
        """Appending a drifted schema would poison every later
        multi-dir read (parquet union-by-name surprises) — fail at
        commit time with the exact field diff instead."""
        have = {f.name: f.dataType.simpleString()
                for f in self.spark.read.parquet(*dirs).schema.fields}
        new = {f.name: f.dataType.simpleString()
               for f in df.schema.fields}
        if have != new:
            missing = sorted(have.keys() - new.keys())
            extra = sorted(new.keys() - have.keys())
            changed = sorted(k for k in have.keys() & new.keys()
                             if have[k] != new[k])
            raise ValueError(
                "schema drift vs current snapshot — "
                f"missing: {missing}, extra: {extra}, retyped: "
                f"{[f'{k}: {have[k]}->{new[k]}' for k in changed]}; "
                "use overwrite() for an intentional schema change")

    def append(self, df: DataFrame, note: str | None = None) -> int:
        """New version = previous snapshot + ``df``.  Returns the
        committed version number.  The schema must match the current
        snapshot exactly (see ``_check_schema``)."""
        prev = self.versions()
        if prev:
            self._check_schema(df, prev[-1]["dirs"])
        dirs = (prev[-1]["dirs"] if prev else []) + \
            [self._write_data_dir(df)]
        return self._commit(dirs, note)

    def overwrite(self, df: DataFrame, note: str | None = None) -> int:
        """New version containing ONLY ``df`` (old versions still
        readable — nothing is deleted)."""
        return self._commit([self._write_data_dir(df)], note)

    # ------------------------------------------- copy-on-write rewrites
    def _tagged_snapshot(self, dirs: list[str]) -> DataFrame:
        """Snapshot scan with the owning data-directory hex captured
        as ``__dirhex__``.  ``input_file_name()`` is only valid inside
        the scan stage, so it must be materialized into a column HERE —
        evaluated after a shuffle/join it silently returns ''."""
        return self.spark.read.parquet(*dirs).withColumn(
            "__dirhex__", F.regexp_extract(
                F.input_file_name(), r"data/([0-9a-f]{32})/", 1))

    def _affected_dirs(self, dirs: list[str],
                       matched: DataFrame) -> list[str]:
        """Which of ``dirs`` contain at least one row of ``matched``
        (a ``_tagged_snapshot`` subset)?  O(#dirs) on the driver,
        never O(rows)."""
        hexes = {r["__dirhex__"] for r in
                 matched.select("__dirhex__").distinct().collect()}
        return [d for d in dirs
                if re.search(r"data/([0-9a-f]{32})$", d)
                and re.search(r"data/([0-9a-f]{32})$", d).group(1)
                in hexes]

    def merge(self, updates: DataFrame, key_col: str,
              note: str | None = None) -> int:
        """Copy-on-write upsert (the lakehouse MERGE shape, Delta Lake
        §3.2): rows of ``updates`` REPLACE snapshot rows with the same
        ``key_col``; unmatched keys are inserted.  Only the data
        directories that actually contain a matched key are rewritten —
        every untouched directory is carried into the new manifest
        by reference, so a 10-row fix to a 100 TB corpus rewrites one
        directory, not the corpus.  Old versions stay readable (time
        travel) until vacuumed.

        ``updates`` must be key-unique (two update rows with one key
        would both survive).  Returns the committed version number.
        """
        if key_col not in updates.columns:
            raise ValueError(f"key column {key_col!r} not in updates "
                             f"({updates.columns})")
        vs = self.versions()
        if not vs:
            return self._commit([self._write_data_dir(updates)], note)
        dirs = vs[-1]["dirs"]
        self._check_schema(updates, dirs)
        keys = updates.select(key_col).distinct()
        snap = self._tagged_snapshot(dirs)
        matched = snap.join(keys, on=key_col, how="left_semi")
        affected = self._affected_dirs(dirs, matched)
        if not affected:  # pure insert — nothing to rewrite
            return self._commit(
                dirs + [self._write_data_dir(updates)], note)
        survivors = (self.spark.read.parquet(*affected)
                     .join(keys, on=key_col, how="left_anti"))
        rewritten = survivors.unionByName(
            updates.select(*survivors.columns))
        new_dir = self._write_data_dir(rewritten)
        kept = [d for d in dirs if d not in set(affected)]
        return self._commit(kept + [new_dir], note)

    def delete_where(self, condition: Column | str,
                     note: str | None = None) -> int:
        """Copy-on-write delete: new version without the rows matching
        ``condition``; only directories containing a match are
        rewritten (directories whose rows all match are simply dropped
        from the manifest — no write at all)."""
        cond = F.expr(condition) if isinstance(condition, str) \
            else condition
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no commits under {self.root}")
        dirs = vs[-1]["dirs"]
        snap = self._tagged_snapshot(dirs)
        affected = self._affected_dirs(dirs, snap.filter(cond))
        if not affected:
            return self._commit(dirs, note)  # no-op version (explicit)
        # NULL-predicate rows must SURVIVE: a row where ``cond`` is NULL
        # did not match (that is the semantics used for affected-dir
        # detection above), so the survivor filter is NOT(coalesce(cond,
        # false)) rather than NOT(cond) — plain ~cond would silently
        # delete NULL rows that merely share a directory with a match.
        survivors = (self.spark.read.parquet(*affected)
                     .filter(~F.coalesce(cond, F.lit(False))))
        kept = [d for d in dirs if d not in set(affected)]
        if survivors.isEmpty():
            return self._commit(kept, note)
        return self._commit(kept + [self._write_data_dir(survivors)],
                            note)

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
