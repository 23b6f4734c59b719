"""Incremental-revalidation cost probe (BENCH.md datapoint, not a
HEADLINE leg — the headline list stays stable across rounds).

Scenario: the bench corpus (lineitem-shaped, same REPEAT content
multiplier as bench.py) written as 64 data files. Measure:

- full:   validate_incremental from an empty cache (== full build)
- delta:  append 1 file (~1/64 churn), revalidate

Report both wall times and delta/full — the churn-proportionality
evidence for docs/SCALE.md's incremental cost model. The finalize
(merge + narrow joins) is a fixed floor, so delta/full approaches
(churn + finalize/full), not churn alone; both numbers are printed.

Usage: python tools/incr_bench.py  [SPARK_GRAFT_SF_DIR, _CPUS as bench.py]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import CPUS, SF_DIR, corpus_from_lineitem  # noqa: E402
from sparkval import ValidationConfig, ValidationEngine  # noqa: E402
from sparkval.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("sparkval-incr-bench", parallelism=CPUS,
                      shuffle_partitions=max(CPUS, 32))
    tmp = tempfile.mkdtemp(prefix="sparkval_incrbench_")
    try:
        snap = f"file://{tmp}/snap"
        virtual = corpus_from_lineitem(spark, SF_DIR)
        virtual.repartition(64).write.parquet(snap)
        corpus = spark.read.parquet(snap)
        eng = ValidationEngine(ValidationConfig(short_circuit_identical=False))
        base_path = f"{tmp}/baseline.parquet"
        eng.build_baseline(corpus).write.parquet(base_path)
        base = spark.read.parquet(base_path)
        cache = f"file://{tmp}/cache"

        def run():
            out = eng.validate_incremental(snap, base, cache)
            out["verdicts"].write.format("noop").mode("overwrite").save()
            out["violations"].write.format("noop").mode("overwrite").save()
            return out

        t0 = time.perf_counter()
        out_full = run()
        full_sec = time.perf_counter() - t0

        # ~1/64 churn: append one file of distorted rows
        assert out_full["n_files_reused"] == 0
        virtual.limit(virtual.count() // 64).withColumn(
            "content", F.translate("content", "0123", "89AB")
        ).withColumn(
            "path", F.concat(F.lit("delta/"), F.col("path"))
        ).coalesce(1).write.mode("append").parquet(snap)

        t0 = time.perf_counter()
        out_delta = run()
        delta_sec = time.perf_counter() - t0

        print(json.dumps({
            "metric": "incremental_revalidate",
            "sf_dir": SF_DIR,
            "cpus": CPUS,
            "n_files": out_delta["n_files_total"],
            "full_sec": round(full_sec, 3),
            "delta_sec": round(delta_sec, 3),
            "delta_over_full": round(delta_sec / full_sec, 3),
            "files_recomputed_delta": out_delta["n_files_recomputed"],
            "files_reused_delta": out_delta["n_files_reused"],
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
