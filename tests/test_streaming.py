"""Structured Streaming tests: stream validation parity with batch
(the strip==full discipline applied to micro-batches)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sparkval import fixtures as fx
from sparkval.config import ValidationConfig
from sparkval.engine import ValidationEngine
from sparkval.schema import CORPUS_SCHEMA
from sparkval.streaming import stream_validate, windowed_lang_counts

CFG = ValidationConfig(short_circuit_identical=False)


def test_stream_validate_matches_batch(spark, tmp_path):
    base_pdf = fx.make_corpus("random_mid", 600)
    snap_pdf = fx.distort(base_pdf, "quantize_3")

    src = str(tmp_path / "src")
    spark.createDataFrame(snap_pdf).write.parquet(src)

    eng = ValidationEngine(CFG)
    base = eng.build_baseline(spark.createDataFrame(base_pdf))
    base.persist().count()

    want = eng.validate(spark.createDataFrame(snap_pdf), base)["verdicts"].toPandas()

    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_validate(stream, base, CFG, out, ckpt, trigger_once=True)
    q.awaitTermination(300)

    got = spark.read.parquet(out).toPandas()
    a = want.set_index(["repo_bucket", "lang"])["score"].sort_index()
    b = got.set_index(["repo_bucket", "lang"])["score"].sort_index()
    # single micro-batch -> identical inputs -> identical scores
    assert list(a.index) == list(b.index)
    assert np.allclose(a.to_numpy(), b.to_numpy())


def test_windowed_lang_counts_matches_batch_groupby(spark, tmp_path):
    """The windowed aggregation, run over a real micro-batched stream,
    must reproduce the plain batch groupBy counts."""
    pdf = fx.make_corpus("random_mid", 400)[["repo", "lang"]].copy()
    import pandas as pd

    pdf["ts"] = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        (np.arange(len(pdf)) * 7) % 600, unit="s"
    )
    src = str(tmp_path / "events")
    df = spark.createDataFrame(pdf)
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    # complete mode + memory sink: availableNow may split the input
    # into several micro-batches in arbitrary file order, and append
    # mode would drop cross-batch late rows at the watermark; complete
    # mode keeps all state, so the final table equals the batch agg.
    agg = windowed_lang_counts(stream, ts_col="ts", window="1 minute")

    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "winckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = (
        spark.table("win_counts")
        .toPandas()
        .set_index(["window_start", "lang"])["n"]
        .sort_index()
    )
    want = (
        df.groupBy(F.date_trunc("minute", "ts").alias("window_start"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .set_index(["window_start", "lang"])["n"]
        .sort_index()
    )
    # watermark may hold back nothing with availableNow + append on
    # finite input: all windows flush at end-of-stream
    assert got.equals(want)
