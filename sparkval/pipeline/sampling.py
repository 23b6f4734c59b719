"""Deterministic, engine-portable sampling for training-data pipelines.

``df.sample`` is seed+partitioning dependent: the same fraction on the
same data yields different rows after a repartition, which breaks
reproducible dataset releases and cross-engine verification. These
operators key selection on a cryptographic hash of a stable id, so the
sample is a pure function of the data — identical across runs,
partitionings, Spark versions, and engines (a DuckDB oracle can
reproduce it exactly), and composable (a 20% sample is a superset of a
10% sample of the same column).

Scale notes: selection is a codegen'd filter on the scan — no shuffle,
no state; the predicate pushes down past column pruning so unsampled
rows cost only the id column read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: bucket space for per-mille thresholds
_BUCKETS = 1000


def _hash_bucket(id_col: str) -> F.Column:
    """Stable bucket in [0, 1000): first 4 hex chars of
    sha256(str(id)) as an integer, mod 1000. sha256 on the decimal
    string representation is the lowest common denominator every
    engine computes identically."""
    return (
        F.conv(F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 4), 16, 10)
        .cast("long")
        % _BUCKETS
    )


def deterministic_sample(df: DataFrame, permille: int, id_col: str = "doc_id") -> DataFrame:
    """Keep rows whose hash bucket < ``permille`` (0..1000): a
    reproducible ~permille/1000 sample, nested across rates."""
    if not 0 <= permille <= _BUCKETS:
        raise ValueError(f"permille out of range: {permille}")
    return df.filter(_hash_bucket(id_col) < permille)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    permille: dict[str, int],
    id_col: str = "doc_id",
    default_permille: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix
    composition step (e.g. keep 50% of en, 25% of fr, drop the rest).
    Thresholds resolve via one CASE expression; unlisted strata get
    ``default_permille``."""
    for k, v in permille.items():
        if not 0 <= v <= _BUCKETS:
            raise ValueError(f"permille out of range for {k!r}: {v}")
    thr = F.lit(default_permille)
    for stratum, p in sorted(permille.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(p)).otherwise(thr)
    return df.filter(_hash_bucket(id_col) < thr)
