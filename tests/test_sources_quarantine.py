"""Robust corpus ingestion (sources/corpus.py): every non-empty input
line lands in exactly one of (good, quarantine); nothing is silently
dropped or silently nulled."""

from __future__ import annotations

import pytest


def _write(path, text):
    path.write_text(text, encoding="utf-8")
    return str(path)


def test_ndjson_quarantine_splits_lines(spark, tmp_path):
    from rulemorph_spark.sources import read_ndjson_quarantine
    p = _write(tmp_path / "docs.ndjson", "\n".join([
        '{"doc_id": 1, "text": "hello world"}',
        'this is not json at all',
        '{"doc_id": 2, "text": "second", "extra_field": true}',
        '',
        '{"doc_id": 3}',
        '{broken json',
    ]) + "\n")
    good, bad = read_ndjson_quarantine(
        spark, p, "doc_id long, text string")
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    # drift semantics: extra field ignored, missing field NULL
    assert rows == {1: "hello world", 2: "second", 3: None}
    q = sorted(r["raw"] for r in bad.collect())
    assert q == ["this is not json at all", "{broken json"]
    assert all(r["source_file"].endswith("docs.ndjson")
               for r in bad.collect())


def test_ndjson_quarantine_empty_and_all_good(spark, tmp_path):
    from rulemorph_spark.sources import read_ndjson_quarantine
    p = _write(tmp_path / "ok.ndjson",
               '{"a": 1}\n{"a": 2}\n')
    good, bad = read_ndjson_quarantine(spark, p, "a int")
    assert sorted(r["a"] for r in good.collect()) == [1, 2]
    assert bad.count() == 0


def test_csv_quarantine_arity_and_parse(spark, tmp_path):
    from rulemorph_spark.sources import read_csv_quarantine
    p = _write(tmp_path / "rows.csv", "\n".join([
        "1,alpha,10.5",
        "2,beta",              # truncated: arity 2 != 3
        "3,gamma,1.5,extra",   # over-long: arity 4 != 3
        "4,delta,2.25",
    ]) + "\n")
    good, bad = read_csv_quarantine(
        spark, p, "id int, name string, score double")
    assert sorted((r["id"], r["name"], r["score"])
                  for r in good.collect()) == \
        [(1, "alpha", 10.5), (4, "delta", 2.25)]
    assert sorted(r["raw"] for r in bad.collect()) == \
        ["2,beta", "3,gamma,1.5,extra"]


def test_csv_quarantine_header_dropped_per_file(spark, tmp_path):
    from rulemorph_spark.sources import read_csv_quarantine
    d = tmp_path / "csvs"
    d.mkdir()
    _write(d / "a.csv", "id,name\n1,x\n2,y\n")
    _write(d / "b.csv", "id,name\n3,z\n")
    good, bad = read_csv_quarantine(
        spark, str(d), "id int, name string", header=True)
    assert sorted((r["id"], r["name"]) for r in good.collect()) == \
        [(1, "x"), (2, "y"), (3, "z")]
    # headers are dropped, not quarantined
    assert bad.count() == 0


def test_csv_quarantine_regex_separator_escaped(spark, tmp_path):
    from rulemorph_spark.sources import read_csv_quarantine
    p = _write(tmp_path / "pipe.csv", "1|one\n2|two\n3|three|oops\n")
    good, bad = read_csv_quarantine(spark, p, "id int, word string",
                                    sep="|")
    assert sorted(r["word"] for r in good.collect()) == ["one", "two"]
    assert [r["raw"] for r in bad.collect()] == ["3|three|oops"]


def test_csv_quarantine_type_corruption_not_silently_nulled(
        spark, tmp_path):
    from rulemorph_spark.sources import read_csv_quarantine
    p = _write(tmp_path / "typed.csv",
               "1,good,2.5\nNOTANUMBER,bad,3.5\n2,fine,xx\n")
    good, bad = read_csv_quarantine(
        spark, p, "id int, name string, score double")
    assert sorted(r["id"] for r in good.collect()) == [1]
    assert sorted(r["raw"] for r in bad.collect()) == \
        ["2,fine,xx", "NOTANUMBER,bad,3.5"]


# --------------------------------------------------- pipeline CLI command

def test_cli_pipeline_ndjson_to_parquet(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    inp = tmp_path / "docs.ndjson"
    lines = [_json.dumps({"doc_id": i, "text": f"document number {i} "
                          + "with some words here", "source": "src0"})
             for i in range(20)]
    lines.insert(5, "NOT JSON")
    inp.write_text("\n".join(lines) + "\n")
    spec = tmp_path / "spec.yaml"
    spec.write_text("""
steps:
  - {op: hash_sample, fraction: 1.0}
  - {op: hash_split, weights: {train: 0.5, valid: 0.5}}
""")
    out = tmp_path / "out"
    quar = tmp_path / "bad"
    r = subprocess.run(
        [sys.executable, "-m", "rulemorph_spark.cli", "pipeline",
         "-s", str(spec), "-i", str(inp), "-o", str(out),
         "--input-schema", "doc_id long, text string, source string",
         "--quarantine", str(quar)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    payload = _json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["rows_out"] == 20
    got = spark.read.parquet(str(out))
    assert got.count() == 20 and "split" in got.columns
    bad = spark.read.parquet(str(quar))
    assert [x["raw"] for x in bad.collect()] == ["NOT JSON"]


def test_cli_pipeline_bad_spec_exit_2(tmp_path):
    import subprocess
    import sys
    spec = tmp_path / "spec.yaml"
    spec.write_text("steps: [{op: no_such_op}]")
    r = subprocess.run(
        [sys.executable, "-m", "rulemorph_spark.cli", "pipeline",
         "-s", str(spec), "-i", "x.parquet", "-o", "y"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 2
    assert "InvalidPipeline" in r.stderr
