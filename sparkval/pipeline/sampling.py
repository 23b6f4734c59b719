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


def _order_key(id_col: str) -> F.Column:
    """Engine-portable deterministic shuffle order: the full sha256 hex
    of str(id) — lexicographic order any engine reproduces."""
    return F.sha2(F.col(id_col).cast("string"), 256)


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 3,
) -> DataFrame:
    """Per-group TOKEN-budget sampling — the training-mix step that
    caps each group (language, source, ...) at a token count rather
    than a row fraction: keep, per group, the prefix of a
    deterministic hash shuffle whose INCLUSIVE cumulative whitespace
    token count fits ``budget_tokens``; a document that would
    overflow the budget is dropped along with everything after it
    (prefix semantics — reproducible and nested: a larger budget's
    sample is a superset).

    Scale shape (the part a naive window gets wrong): a
    Window.partitionBy(group) cumsum puts EVERY row of a group in one
    task — a hot language is petabytes. Instead the hash key's first
    ``prefix_len`` hex chars (4096 buckets at 3) bucket each group
    WITHOUT breaking the global hash order (bucket = key prefix, so
    bucket-major order IS key order). Pass 1 aggregates per-(group,
    bucket) token sums — a tiny table — whose running sum finds each
    group's boundary bucket; full buckets resolve with a broadcast
    join, ONLY the boundary bucket's rows (~1/4096 of the group) pay
    a row-level window. Exactly equal to the flat per-row cumsum rule
    (oracle-checked), two narrow shuffles, no content movement."""
    from pyspark.sql import Window

    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0: {budget_tokens}")
    key = _order_key(id_col)
    bucket = F.substring(key, 1, prefix_len)
    toks = F.when(
        F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""), F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    rows = df.withColumn("_tbs_key", key).withColumn(
        "_tbs_bucket", bucket
    ).withColumn("_tbs_tokens", toks.cast("long"))

    # pass 1: per-(group, bucket) token sums -> running sum over the
    # TINY bucket table (groups x 4096 rows; the window here is fine)
    wb = Window.partitionBy(group_col).orderBy("_tbs_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    buckets = (
        rows.groupBy(group_col, "_tbs_bucket")
        .agg(F.sum("_tbs_tokens").alias("_tbs_sum"))
        .withColumn("_tbs_cum", F.sum("_tbs_sum").over(wb))
        .withColumn("_tbs_before", F.col("_tbs_cum") - F.col("_tbs_sum"))
    )
    full = buckets.filter(F.col("_tbs_cum") <= budget_tokens).select(
        group_col, "_tbs_bucket"
    )
    boundary = buckets.filter(
        (F.col("_tbs_cum") > budget_tokens) & (F.col("_tbs_before") <= budget_tokens)
    ).select(group_col, "_tbs_bucket", "_tbs_before")

    kept_full = rows.join(F.broadcast(full), [group_col, "_tbs_bucket"], "left_semi")

    # pass 2: row-level prefix inside each group's single boundary
    # bucket (1/4096 of the group's rows shuffle into this window)
    wr = Window.partitionBy(group_col, "_tbs_bucket").orderBy(
        "_tbs_key", id_col
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kept_boundary = (
        rows.join(F.broadcast(boundary), [group_col, "_tbs_bucket"])
        .withColumn("_tbs_rowcum", F.sum("_tbs_tokens").over(wr))
        .filter(F.col("_tbs_before") + F.col("_tbs_rowcum") <= budget_tokens)
        .drop("_tbs_before", "_tbs_rowcum")
    )
    drop_cols = ("_tbs_key", "_tbs_bucket", "_tbs_tokens")
    return kept_full.unionByName(kept_boundary).drop(*drop_cols)
