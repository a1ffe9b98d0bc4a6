"""Trainer-ready sharded export: determinism, exactness, manifest
verification (llm/export.py)."""

import pytest
from pyspark.sql import functions as F

from rulemorph_spark.llm.export import (
    read_manifest,
    read_training_shards,
    verify_shards,
    write_training_shards,
)

N, SHARDS = 500, 8


def _docs(spark, n=N):
    return spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("text for document "), F.col("id")).alias("text"),
        (F.col("id") % 37 + 5).alias("n_tokens"),
        F.array(F.col("id"), F.col("id") * 2).alias("extra"))


def test_round_trip_exact_and_one_file_per_shard(spark, tmp_path):
    out = str(tmp_path / "export")
    df = _docs(spark)
    man = write_training_shards(df, out, SHARDS, token_col="n_tokens")
    back = read_training_shards(spark, out)
    assert back.drop("shard").exceptAll(df).isEmpty()
    assert df.exceptAll(back.drop("shard")).isEmpty()
    assert man["total_rows"] == N
    assert man["total_tokens"] == df.agg(
        F.sum("n_tokens")).collect()[0][0]
    # each shard directory holds exactly one data file
    for k in range(SHARDS):
        files = [p for p in (tmp_path / "export" / f"shard={k}")
                 .iterdir() if p.name.startswith("part-")]
        assert len(files) == 1, f"shard {k}: {files}"
    # hash sharding is roughly balanced
    rows = [s["rows"] for s in man["shards"]]
    assert min(rows) > 0 and max(rows) < 3 * (N // SHARDS)


def test_deterministic_assignment_and_order(spark, tmp_path):
    df = _docs(spark, 300)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(df, a, SHARDS, salt=7)
    write_training_shards(df.repartition(13), b, SHARDS, salt=7)
    da = spark.read.parquet(a).select("doc_id", "shard")
    db = (spark.read.parquet(b).select("doc_id", "shard")
          .withColumnRenamed("shard", "shard_b"))
    moved = da.join(db, "doc_id").filter("shard != shard_b")
    assert moved.isEmpty()
    # same checksums file-for-file ⇒ same content per shard
    ma, mb = read_manifest(spark, a), read_manifest(spark, b)
    assert ma["shards"] == mb["shards"]
    # a different salt is an independent permutation
    c = str(tmp_path / "c")
    write_training_shards(df, c, SHARDS, salt=8)
    mc = read_manifest(spark, c)
    assert mc["shards"] != ma["shards"]


def test_shard_subset_read_prunes(spark, tmp_path):
    out = str(tmp_path / "export")
    write_training_shards(_docs(spark), out, SHARDS)
    sub = read_training_shards(spark, out, shards=[0, 3])
    got = {r["shard"] for r in sub.select("shard").distinct().collect()}
    assert got <= {0, 3}
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "shard" in plan


def test_verify_clean_then_tampered(spark, tmp_path):
    out = str(tmp_path / "export")
    write_training_shards(_docs(spark), out, SHARDS,
                          token_col="n_tokens")
    assert verify_shards(spark, out) == []
    # tamper: drop one shard's data file
    victim = next((tmp_path / "export" / "shard=2").glob("part-*"))
    victim.unlink()
    problems = verify_shards(spark, out)
    assert [p["shard"] for p in problems] == [2]
    assert problems[0]["actual"]["rows"] == 0


def test_empty_and_bad_args(spark, tmp_path):
    with pytest.raises(ValueError):
        write_training_shards(_docs(spark), str(tmp_path / "x"), 0)
    with pytest.raises(ValueError):
        write_training_shards(_docs(spark), str(tmp_path / "y"), 4,
                              id_col="nope")
    # an empty input still produces a valid, verifiable export
    out = str(tmp_path / "empty")
    man = write_training_shards(_docs(spark).filter("false"), out, 3)
    assert man["total_rows"] == 0
    assert all(s["rows"] == 0 for s in man["shards"])
    assert verify_shards(spark, out) == []


def test_cli_export_and_verify(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    src = str(tmp_path / "corpus")
    _docs(spark, 300).write.parquet(src)
    out = str(tmp_path / "shards")
    r = subprocess.run(
        [sys.executable, "-m", "rulemorph_spark.cli", "export",
         "-i", src, "-o", out, "-n", "6", "--token-col", "n_tokens"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-800:]
    summary = _json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_shards"] == 6 and summary["total_rows"] == 300

    rv = subprocess.run(
        [sys.executable, "-m", "rulemorph_spark.cli", "export",
         "-o", out, "--verify"],
        capture_output=True, text=True, cwd="/root/repo")
    assert rv.returncode == 0, rv.stderr[-800:]
    assert _json.loads(rv.stdout.strip().splitlines()[-1])["verified"]

    next((tmp_path / "shards" / "shard=1").glob("part-*")).unlink()
    rb = subprocess.run(
        [sys.executable, "-m", "rulemorph_spark.cli", "export",
         "-o", out, "--verify"],
        capture_output=True, text=True, cwd="/root/repo")
    assert rb.returncode == 3
    bad = _json.loads(rb.stdout.strip().splitlines()[-1])
    assert [p["shard"] for p in bad["problems"]] == [1]


def test_export_rejects_reserved_column_collision(spark, tmp_path):
    """Inputs already carrying 'shard' or '__ord__' must be rejected —
    withColumn would silently replace the user's data."""
    base = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text"))
    for bad in ("shard", "__ord__"):
        df = base.withColumn(bad, F.lit(99))
        with pytest.raises(ValueError, match=bad.replace("_", "_")):
            write_training_shards(df, str(tmp_path / f"out_{bad}"), 2)
