"""Per-partition distribution vectors — the engine's "planar image" layer.

The reference's fundamental tensor is the f32 plane (`ImageF`,
image.rs:156-161); ours is the per-(repo_bucket, lang) distribution
vector: byte-frequency (256 bins), log2-length (64 bins), and lang mix
(LANG_VOCAB bins). The interleaved->planar conversion
(opsin.rs:346-376) becomes histogram aggregation.

Scale design (the part that must survive 100 TB):

1. ``partial_histograms`` — mapInPandas over the scan. Each Arrow
   batch collapses to at most (#keys-in-batch) rows of packed count
   vectors. This is the map-side combine: raw content NEVER shuffles.
   100 TB of content becomes ~(tasks x keys) rows of ~2.6 KB each.
2. ``merge_histograms`` — posexplode the partial vectors and run a
   built-in partial+final hash aggregation on (key, bin): Spark's
   own StripReducer (strip.rs:126-209 analog), whole-stage codegen,
   no Python. The per-key result reassembles into arrays with
   array_sort(collect_list(struct(bin, count))).

The histogram bins are uniform by construction, so the merge stage
has zero skew even when repos are hot — skew lives only in the
map stage, where AQE/file-split sizing handles it.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from sparkval.config import BYTE_BINS, LANG_VOCAB, LEN_BINS, ValidationConfig

PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("repo_bucket", T.IntegerType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("n_files", T.LongType(), False),
        T.StructField("n_null_content", T.LongType(), False),
        T.StructField("total_bytes", T.LongType(), False),
        T.StructField("byte_hist", T.ArrayType(T.LongType()), False),
        T.StructField("len_hist", T.ArrayType(T.LongType()), False),
    ]
)


def repo_bucket_py(repo: str, n_buckets: int) -> int:
    """Deterministic repo->bucket hash, identical in every context.

    crc32 rather than Spark's hash() so pandas-side and JVM-side
    bucket assignments can never diverge.
    """
    return zlib.crc32(repo.encode("utf-8")) % n_buckets


def _lang_norm(s: pd.Series) -> pd.Series:
    low = s.fillna("other").str.lower()
    return low.where(low.isin(LANG_VOCAB), "other")


def partial_histograms(corpus: DataFrame, config: ValidationConfig) -> DataFrame:
    """Map-side partial histograms: one output row per (key, batch).

    All byte work is numpy over the Arrow batch: contents join into a
    single buffer per group, np.bincount over uint8 — no per-row
    Python function calls (north-rule requirement).
    """
    n_buckets = config.n_repo_buckets

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            bucket = pdf["repo"].map(lambda r: repo_bucket_py(r, n_buckets))
            lang = _lang_norm(pdf["lang"])
            out = []
            for (b, lg), grp in pdf.assign(_b=bucket, _l=lang).groupby(["_b", "_l"]):
                content = grp["content"]
                nulls = int(content.isna().sum())
                present = content.dropna()
                if len(present):
                    blob = np.frombuffer(
                        "\x00".join(present.tolist()).encode("utf-8", "replace"),
                        dtype=np.uint8,
                    )
                    # strip the join separators from the counts
                    bh = np.bincount(blob, minlength=BYTE_BINS).astype(np.int64)
                    bh[0] -= len(present) - 1
                    lens = present.str.len().to_numpy(dtype=np.int64)
                    lh = np.bincount(
                        np.clip(np.log2(lens + 1).astype(np.int64), 0, LEN_BINS - 1),
                        minlength=LEN_BINS,
                    ).astype(np.int64)
                    total = int(lens.sum())
                else:
                    bh = np.zeros(BYTE_BINS, dtype=np.int64)
                    lh = np.zeros(LEN_BINS, dtype=np.int64)
                    total = 0
                out.append(
                    {
                        "repo_bucket": int(b),
                        "lang": lg,
                        "n_files": int(len(grp)),
                        "n_null_content": nulls,
                        "total_bytes": total,
                        "byte_hist": bh,
                        "len_hist": lh,
                    }
                )
            yield pd.DataFrame(out)

    return corpus.select("repo", "lang", "content").mapInPandas(gen, PARTIAL_SCHEMA)


def _vector_sum(df: DataFrame, keys: list[str], col: str, n_bins: int) -> DataFrame:
    """Element-wise array sum per key via built-ins (no Python).

    posexplode -> hash-agg on (keys, bin) with map-side partial sums
    -> reassemble ordered array. Bin cardinality is fixed and uniform:
    skew-free by construction.
    """
    exploded = df.select(*keys, F.posexplode(col).alias("bin", "cnt"))
    summed = exploded.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))
    return summed.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bin", "cnt"))), lambda s: s["cnt"]
        ).alias(col)
    )


def merge_histograms(partials: DataFrame) -> DataFrame:
    """Final per-(repo_bucket, lang) histogram table."""
    keys = ["repo_bucket", "lang"]
    scalars = partials.groupBy(*keys).agg(
        F.sum("n_files").alias("n_files"),
        F.sum("n_null_content").alias("n_null_content"),
        F.sum("total_bytes").alias("total_bytes"),
    )
    bytes_ = _vector_sum(partials, keys, "byte_hist", BYTE_BINS)
    lens = _vector_sum(partials, keys, "len_hist", LEN_BINS)
    return scalars.join(bytes_, keys).join(lens, keys)


def corpus_histograms(corpus: DataFrame, config: ValidationConfig) -> DataFrame:
    """scan -> map-side partials -> built-in merge. The one-stop API."""
    return merge_histograms(partial_histograms(corpus, config))


def add_lang_hist(hists: DataFrame) -> DataFrame:
    """Per-bucket lang-mix vector (LANG_VOCAB order) joined back on.

    A window-free two-step: per-bucket totals are tiny (#buckets rows),
    broadcast back onto the per-(bucket, lang) rows.
    """
    per_bucket = (
        hists.groupBy("repo_bucket")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("lang", "n_files"))).alias("m"),
        )
        .select(
            "repo_bucket",
            F.array(
                *[F.coalesce(F.col("m").getItem(l), F.lit(0)).cast("double") for l in LANG_VOCAB]
            ).alias("lang_hist_raw"),
        )
        .select(
            "repo_bucket",
            F.transform(
                "lang_hist_raw",
                lambda v: v
                / F.greatest(F.aggregate("lang_hist_raw", F.lit(0.0), lambda a, x: a + x), F.lit(1.0)),
            ).alias("lang_hist"),
        )
    )
    return hists.join(F.broadcast(per_bucket), "repo_bucket")
