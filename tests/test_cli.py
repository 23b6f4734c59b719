"""CLI contract tests: exit codes per the reference's --max-score
semantics (butteraugli-cli main.rs:232-259)."""

import json

from sparkval import fixtures as fx
from sparkval.cli import main as cli_main


def test_cli_roundtrip_exit_codes(spark, tmp_path, capsys):
    base_pdf = fx.make_corpus("random_mid", 500)
    corpus_path = str(tmp_path / "corpus.parquet")
    snap_ok = str(tmp_path / "snap_ok.parquet")
    snap_bad = str(tmp_path / "snap_bad.parquet")
    baseline_path = str(tmp_path / "baseline.parquet")
    out_dir = str(tmp_path / "out")

    spark.createDataFrame(base_pdf).write.parquet(corpus_path)
    spark.createDataFrame(fx.distort(base_pdf, "identity")).write.parquet(snap_ok)
    spark.createDataFrame(fx.distort(base_pdf, "quantize_3")).write.parquet(snap_bad)

    assert cli_main(["build-baseline", "--corpus", corpus_path, "--out", baseline_path]) == 0

    rc = cli_main(
        ["validate", "--corpus", snap_ok, "--baseline", baseline_path,
         "--out-dir", out_dir, "--json"]
    )
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["verdict_counts"]["FAIL"] == 0
    assert metrics["files_validated"] == 500

    rc_bad = cli_main(["validate", "--corpus", snap_bad, "--baseline", baseline_path])
    assert rc_bad == 2

    # metrics sidecar written (lineage requirement)
    with open(f"{out_dir}/metrics.json") as f:
        side = json.load(f)
    assert side["partitions"] > 0


def test_cli_strip_mode_full_validate(spark, tmp_path, capsys):
    """--strips N: the strip walker is reachable from spark-submit and
    is a FULL validate (violations included in metrics/exit code)."""
    import json as _json

    from sparkval import fixtures as fx
    from sparkval.cli import main as cli_main

    pdf = fx.make_corpus("random_mid", 400)
    corpus_path = str(tmp_path / "c.parquet")
    base_path = str(tmp_path / "b.parquet")
    spark.createDataFrame(pdf).repartition(6).write.parquet(corpus_path)
    assert cli_main(["build-baseline", "--corpus", corpus_path,
                     "--out", base_path]) == 0

    rc = cli_main([
        "validate", "--corpus", corpus_path, "--baseline", base_path,
        "--strips", "3", "--checkpoint", str(tmp_path / "ck"), "--json",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0  # identical snapshot: no drift, no violations
    assert out["files_validated"] == 400
    assert sum(out["violations_by_check"].values()) == 0

    # planted duplicates -> exit 2 through the SAME strip path
    dup_path = str(tmp_path / "cdup.parquet")
    spark.createDataFrame(fx.distort(pdf, "dup_5")).repartition(6).write.parquet(dup_path)
    rc2 = cli_main([
        "validate", "--corpus", dup_path, "--baseline", base_path,
        "--strips", "3", "--checkpoint", str(tmp_path / "ck2"), "--json",
    ])
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 2
    assert out2["violations_by_check"].get("uniqueness") == 10  # 5 keys x 2 rows


def test_read_corpus_csv_json_explicit_schema(spark, tmp_path):
    """Format-inferring read_corpus: csv/json read with the EXPLICIT
    corpus schema (no inference scan), parquet-equal content."""
    from sparkval import fixtures as fx
    from sparkval.io import read_corpus

    pdf = fx.make_corpus("random_mid", 50)
    df = spark.createDataFrame(pdf)
    csv_p = str(tmp_path / "c.csv")
    json_p = str(tmp_path / "c.json")
    df.write.option("header", "true").mode("overwrite").csv(csv_p)
    df.write.mode("overwrite").json(json_p)

    want = {(r["repo"], r["path"], r["commit"]) for r in df.collect()}
    got_csv = read_corpus(spark, csv_p)
    got_json = read_corpus(spark, json_p)
    assert got_csv.schema == df.schema == got_json.schema
    assert {(r["repo"], r["path"], r["commit"]) for r in got_csv.collect()} == want
    assert {(r["repo"], r["path"], r["commit"]) for r in got_json.collect()} == want
