"""Structured Streaming drift monitor.

The reference is strictly batch (SURVEY §2.9: no watermarks/event
time); its incremental story is the strip walker. The engine's
streaming story reuses the batch machinery via ``foreachBatch``: each
micro-batch of newly arrived corpus rows is validated against the
persisted baseline with the SAME code path as batch validation, so
streaming and batch verdicts can never diverge (the strip==full
parity discipline, strip.rs:38-45, applied to streams).

For per-window drift over an event stream there is also a windowed
histogram aggregation built from built-ins only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from sparkval.config import ValidationConfig
from sparkval.drift import drift_verdicts, partition_histograms


def stream_validate(
    stream: DataFrame,
    baseline: DataFrame,
    config: ValidationConfig,
    out_path: str,
    checkpoint: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Validate a streaming corpus source micro-batch-by-micro-batch.

    Each batch's partition histograms are scored against the baseline
    and appended (with batch id) to ``out_path`` — an append-only
    verdict log suitable for alerting on FAIL rows.
    """
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hists = partition_histograms(batch_df, config)
        verdicts = drift_verdicts(baseline, hists, config).withColumn(
            "batch_id", F.lit(batch_id)
        )
        verdicts.write.mode("append").parquet(out_path)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_lang_counts(
    events: DataFrame,
    ts_col: str = "ts",
    lang_col: str = "lang",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Late-data-tolerant per-window lang counts (built-ins only):
    the streaming analog of the lang-mix channel. Aggregating counts
    (not rows) keeps state bounded by windows x langs."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(lang_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(lang_col),
            F.col("n"),
        )
    )
