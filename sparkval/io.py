"""Corpus table IO — Iceberg-first with parquet fallback.

Production target is an Iceberg catalog table (the north rule's input
shape); the sandbox has no Iceberg runtime jar, so the reader gates on
availability and falls back to plain parquet paths. Partition pruning
and column pruning work identically through either source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_corpus(spark: SparkSession, location: str) -> DataFrame:
    """Read the corpus table.

    - ``iceberg:<catalog.table>`` -> Iceberg table (requires the
      iceberg-spark-runtime jar on the cluster; raises a clear error
      if absent).
    - anything else -> parquet path.
    """
    if location.startswith("iceberg:"):
        table = location[len("iceberg:"):]
        try:
            return spark.read.format("iceberg").load(table)
        except Exception as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "Iceberg source requested but the iceberg-spark-runtime "
                "jar is not on the classpath; deploy with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"
            ) from e
    return spark.read.parquet(location)


def snapshot_as_of(spark: SparkSession, table: str, snapshot_id: int) -> DataFrame:
    """Iceberg time-travel read (VERSION AS OF) — the natural way to
    pin the baseline snapshot on a real deployment."""
    return (
        spark.read.format("iceberg")
        .option("snapshot-id", str(snapshot_id))
        .load(table)
    )
