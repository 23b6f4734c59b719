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
