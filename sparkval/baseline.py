"""Baseline snapshot persistence — the ButteraugliReference analog.

The reference precomputes the expensive per-image state once and
reuses it across N comparisons for a ~40-50% speedup
(precompute.rs:3-4, 127-152). The engine's equivalent: build the
per-partition histogram table from a trusted corpus snapshot ONCE,
persist it as Parquet, and broadcast-join it against every future
snapshot. At 10^12 files the baseline table is still only
(#buckets x #langs) rows — kilobytes.

Alongside the histograms we persist a per-partition content
fingerprint enabling the identical-input short-circuit
(diff.rs:766-772): when a partition's fingerprint and row count are
unchanged, its drift score is 0 by definition and the kernel is
skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkval.config import ValidationConfig
from sparkval.drift import partition_histograms
from sparkval.histograms import repo_bucket_py


def partition_fingerprints(corpus: DataFrame, config: ValidationConfig) -> DataFrame:
    """Order-insensitive per-(repo_bucket, lang) content fingerprint.

    bit_xor(xxhash64(content)) — commutative/associative (so it
    partial-aggregates map-side and is partitioning-invariant) and
    overflow-free under ANSI mode. XOR cancels identical pairs, so the
    row count travels with it: any add/remove that XOR misses moves
    fp_n_files.
    """
    from sparkval.histograms import _lang_norm  # noqa: F401 (same normalization)

    lang = F.lower(F.coalesce(F.col("lang"), F.lit("other")))
    from sparkval.config import LANG_VOCAB

    lang = F.when(lang.isin(LANG_VOCAB), lang).otherwise(F.lit("other"))
    bucket = _bucket_col(config.n_repo_buckets)
    # the hash covers (lang, content): a lang relabel with unchanged
    # content must still move the fingerprint, because the lang-mix
    # drift channel is bucket-wide (see ValidationEngine short-circuit)
    return (
        corpus.select(
            bucket.alias("repo_bucket"),
            lang.alias("lang"),
            F.xxhash64(lang, F.coalesce(F.col("content"), F.lit("\\x00NULL"))).alias("h"),
        )
        .groupBy("repo_bucket", "lang")
        .agg(F.bit_xor("h").alias("fingerprint"), F.count(F.lit(1)).alias("fp_n_files"))
    )


def _bucket_col(n_buckets: int) -> F.Column:
    """JVM-side crc32-based bucket, bit-equal to histograms.repo_bucket_py."""
    return F.pmod(F.crc32(F.col("repo").cast("binary")), F.lit(n_buckets)).cast("int")


def build_baseline(corpus: DataFrame, config: ValidationConfig) -> DataFrame:
    """Histograms + fingerprints for a trusted snapshot."""
    hists = partition_histograms(corpus, config)
    fps = partition_fingerprints(corpus, config)
    return hists.join(fps, ["repo_bucket", "lang"], "left")


def save_baseline(baseline: DataFrame, path: str) -> None:
    baseline.write.mode("overwrite").parquet(path)


def load_baseline(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
