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
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from sparkval.config import BYTE_BINS, LANG_VOCAB, LEN_BINS, ValidationConfig

#: Version tag of the per-row content fingerprint function used for the
#: identical-input short-circuit. Bump whenever prepared_scan's
#: fingerprint expression changes (e.g. the blake2b->xxhash64 switch):
#: baselines persisted under another version must NOT short-circuit
#: against current fingerprints (they'd silently never match).
FP_ALGO = "xxhash64(lang,content)-v1"

PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("repo_bucket", T.IntegerType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("n_files", T.LongType(), False),
        T.StructField("n_null_content", T.LongType(), False),
        T.StructField("total_bytes", T.LongType(), False),
        T.StructField("byte_hist", T.ArrayType(T.LongType()), False),
        T.StructField("len_hist", T.ArrayType(T.LongType()), False),
        # xor of per-row xxhash64(lang, content) (order-insensitive,
        # partition-invariant); rides along so the identical-input
        # short-circuit (diff.rs:766-772) costs zero extra scans
        T.StructField("fingerprint", T.LongType(), False),
    ]
)


#: Sentinel standing in for a NULL repo when bucketing. NULL repos are
#: still *reported* by constraints.null_violations; the histogram scan
#: must tolerate them (crc32(NULL) would NULL the group key and crash
#: the Arrow kernel), so they hash into a deterministic bucket instead.
NULL_REPO_SENTINEL = "\x00NULL_REPO"


def repo_bucket_py(repo: str | None, n_buckets: int) -> int:
    """Deterministic repo->bucket hash, identical in every context.

    crc32 rather than Spark's hash() so pandas-side and JVM-side
    bucket assignments can never diverge. NULL repos map through the
    same sentinel prepared_scan uses.
    """
    if repo is None:
        repo = NULL_REPO_SENTINEL
    return zlib.crc32(repo.encode("utf-8")) % n_buckets


def _lang_norm(s: pd.Series) -> pd.Series:
    low = s.fillna("other").str.lower()
    return low.where(low.isin(LANG_VOCAB), "other")


def prepared_scan(
    corpus: DataFrame,
    n_buckets: int,
    bucket: F.Column | None = None,
    extra: list | None = None,
) -> DataFrame:
    """JVM-side per-row preparation for the histogram scan: bucket,
    normalized lang, 64-bit row fingerprint, char length, and UTF-8
    bytes — all codegen'd expressions, zero per-row Python. The pandas
    stage downstream only groups and bin-counts.

    encode() matters doubly: the Arrow transfer ships raw bytes and the
    Python side never materializes (decode + re-encode) str objects for
    multi-KB contents.

    ``bucket`` overrides the default crc32(repo) % n_buckets partition
    key with any int expression in [0, n_buckets) — the drill-down
    path partitions ONE bucket's rows by a dense per-repo index so the
    same histogram kernel attributes drift to individual repos.
    """
    lang_low = F.lower(F.coalesce(F.col("lang"), F.lit("other")))
    lang_norm = F.when(lang_low.isin(*LANG_VOCAB), lang_low).otherwise(F.lit("other"))
    # coalesce BEFORE crc32: crc32(NULL) is NULL, which would NULL the
    # composite _key and abort the whole mapInArrow scan on the first
    # corpus with a NULL repo (tolerate-and-report, never fatal —
    # null_violations is where NULL keys get flagged)
    repo_nn = F.coalesce(F.col("repo"), F.lit(NULL_REPO_SENTINEL))
    if bucket is None:
        bucket = F.pmod(F.crc32(repo_nn.cast("binary")), F.lit(n_buckets)).cast("int")
    else:
        bucket = bucket.cast("int")
    lang_code = (
        F.array_position(F.array(*[F.lit(l) for l in LANG_VOCAB]), lang_norm).cast("int")
        - F.lit(1)
    )
    return corpus.select(
        bucket.alias("_b"),
        lang_norm.alias("_l"),
        # composite numeric group key (bucket * n_langs + lang_code):
        # lets the Arrow-side kernel group with np.unique instead of
        # hashing strings row-by-row
        (bucket * len(LANG_VOCAB) + lang_code).alias("_key"),
        # includes lang: a relabel with unchanged content must still
        # move the fingerprint (the lang-mix channel is bucket-wide)
        F.xxhash64(lang_norm, F.coalesce(F.col("content"), F.lit("\x00NULL")))
        .alias("_fp"),
        F.length("content").alias("_len"),
        F.encode(F.col("content"), "UTF-8").alias("_bytes"),
        # fused single-scan path: row-check expressions ride the SAME
        # projection so bucket/fingerprint logic has one definition
        *(extra or []),
    )


def partial_histograms(
    corpus: DataFrame, config: ValidationConfig, bucket: F.Column | None = None
) -> DataFrame:
    """Map-side partial histograms: one output row per (key, batch).

    Per-row work (bucket, lang-norm, group key, fingerprint, length,
    UTF-8 bytes) runs JVM-side in prepared_scan; the Python stage is a
    mapInArrow kernel reading the record batch's buffers DIRECTLY:

    - the binary column's data buffer is ONE contiguous allocation for
      the whole batch — per-row views of it feed bincount with ZERO
      copies and zero Python bytes objects (the old mapInPandas path
      materialized every content as a bytes object, then paid another
      full copy joining them into a blob: 2x the memory traffic of
      the data itself, on the stage that is memory-bandwidth-bound);
    - grouping is np.unique over the JVM-computed int key (no string
      hashing), fingerprints fold with one segmented XOR, and length
      histograms are one scatter-add per batch.
    """
    n_langs = len(LANG_VOCAB)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # per-TASK accumulation (guide §2.3, aggregate before the
        # shuffle): fold every batch's per-key partials into one
        # O(present keys) accumulator and emit ONCE per task — the
        # per-batch emit shipped (batches x keys) rows into the merge
        # shuffle (479k rows / ~1.2 GB at the 6M-file bench corpus vs
        # ~20k rows after this change). The fold is the same monoid the
        # merge stage applies (sum/xor), so merged outputs are
        # bit-identical for any batch split.
        acc = _HistAccumulator(n_langs)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            acc.add(*_hist_partial_arrays(batch, n_langs))
        if acc:
            yield acc.to_batch()

    prepped = prepared_scan(corpus, config.n_repo_buckets, bucket=bucket).select(
        "_key", "_fp", "_len", "_bytes"
    )
    return prepped.mapInArrow(gen, PARTIAL_SCHEMA)


class _HistAccumulator:
    """Per-task fold of per-batch histogram partials, keyed by the
    composite int key. Sum/xor only — the identical monoid the merge
    stage applies, so any (batch, task) split yields bit-identical
    merged histograms."""

    def __init__(self, n_langs: int):
        self.n_langs = n_langs
        self.state: dict[int, list] = {}

    def __bool__(self) -> bool:
        return bool(self.state)

    def add(self, ukeys, n_files, nulls, total, bh, lh, fpx) -> None:
        for i, k in enumerate(ukeys.tolist()):
            st = self.state.get(k)
            if st is None:
                self.state[k] = [
                    int(n_files[i]), int(nulls[i]), int(total[i]),
                    int(fpx[i]), bh[i].copy(), lh[i].copy(),
                ]
            else:
                st[0] += int(n_files[i])
                st[1] += int(nulls[i])
                st[2] += int(total[i])
                st[3] ^= int(fpx[i])
                st[4] += bh[i]
                st[5] += lh[i]

    def to_batch(self) -> pa.RecordBatch:
        keys = sorted(self.state)
        rows = [self.state[k] for k in keys]
        karr = np.asarray(keys, dtype=np.int64)
        return pa.record_batch(
            {
                "repo_bucket": pa.array((karr // self.n_langs).astype(np.int32), pa.int32()),
                "lang": pa.array([LANG_VOCAB[int(k) % self.n_langs] for k in keys], pa.string()),
                "n_files": pa.array([r[0] for r in rows], pa.int64()),
                "n_null_content": pa.array([r[1] for r in rows], pa.int64()),
                "total_bytes": pa.array([r[2] for r in rows], pa.int64()),
                "byte_hist": pa.array([r[4] for r in rows], pa.list_(pa.int64())),
                "len_hist": pa.array([r[5] for r in rows], pa.list_(pa.int64())),
                "fingerprint": pa.array([r[3] for r in rows], pa.int64()),
            }
        )


def _hist_partial_cols(batch: pa.RecordBatch, n_langs: int) -> dict:
    """The per-batch histogram-partial kernel over a prepared_scan
    batch whose first four columns are (_key, _fp, _len, _bytes):
    reads the binary column's buffers DIRECTLY (zero copies, zero
    Python bytes objects), groups via np.unique over the JVM int key,
    folds fingerprints with one segmented XOR, scatter-adds length
    bins, and bincounts content bytes. Shared verbatim by
    partial_histograms and fused_scan_partials so the two paths can
    never drift."""
    ukeys, n_files, nulls, total, bh, lh, fpx = _hist_partial_arrays(batch, n_langs)
    return {
        "repo_bucket": pa.array((ukeys // n_langs).astype(np.int32), pa.int32()),
        "lang": pa.array([LANG_VOCAB[int(k) % n_langs] for k in ukeys], pa.string()),
        "n_files": pa.array(n_files),
        "n_null_content": pa.array(nulls),
        "total_bytes": pa.array(total),
        "byte_hist": pa.array(list(bh), pa.list_(pa.int64())),
        "len_hist": pa.array(list(lh), pa.list_(pa.int64())),
        "fingerprint": pa.array(fpx),
    }


def _hist_partial_arrays(batch: pa.RecordBatch, n_langs: int) -> tuple:
    """Numpy form of the per-batch histogram partials (see
    _hist_partial_cols): (ukeys, n_files, nulls, total, bh, lh, fpx)."""
    n = batch.num_rows
    key = batch.column(0).to_numpy()
    fp = batch.column(1).to_numpy().view(np.uint64)
    ln = batch.column(2).fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    barr = batch.column(3)
    # offsets/data buffer views (no copy); binary() carries int32
    # offsets, large_binary() int64
    off_dtype = np.int64 if pa.types.is_large_binary(barr.type) else np.int32
    bufs = barr.buffers()
    off = np.frombuffer(bufs[1], dtype=off_dtype)[barr.offset : barr.offset + n + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )

    ukeys, inv = np.unique(key, return_inverse=True)
    G = len(ukeys)
    n_files = np.bincount(inv, minlength=G).astype(np.int64)
    nulls = np.bincount(inv[ln < 0], minlength=G).astype(np.int64)

    # segmented XOR of row fingerprints per group
    order = np.argsort(inv, kind="stable")
    seg_starts = np.searchsorted(inv[order], np.arange(G))
    fpx = np.bitwise_xor.reduceat(fp[order], seg_starts).view(np.int64)

    pres = ln >= 0
    lh = np.zeros((G, LEN_BINS), dtype=np.int64)
    if pres.any():
        lbin = np.clip(np.log2(ln[pres] + 1).astype(np.int64), 0, LEN_BINS - 1)
        np.add.at(lh, (inv[pres], lbin), 1)
    total = np.zeros(G, dtype=np.int64)
    np.add.at(total, inv[pres], ln[pres])

    bh = np.zeros((G, BYTE_BINS), dtype=np.int64)
    for i in np.flatnonzero(pres):
        s, e = off[i], off[i + 1]
        if e > s:
            bh[inv[i]] += np.bincount(data[s:e], minlength=BYTE_BINS)

    return ukeys, n_files, nulls, total, bh, lh, fpx


#: union-schema output of the fused single-scan kernel: kind='h' rows
#: carry histogram-partial columns (PARTIAL_SCHEMA), kind='r' rows the
#: narrow per-row check partials (constraints.row_check_partials) —
#: everything row-level validation needs, from ONE content read.
FUSED_SCHEMA = T.StructType(
    [T.StructField("kind", T.StringType(), False)]
    + [T.StructField(f.name, f.dataType, True) for f in PARTIAL_SCHEMA.fields]
    + [
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("null_detail", T.StringType(), True),
    ]
)

_ROW_COLS = ("repo", "path", "commit", "content_sha256", "null_detail")


def fused_scan_partials(corpus: DataFrame, config: ValidationConfig) -> DataFrame:
    """Single-scan fusion of the two per-row passes a full validate
    needs (round-5 optimization): histogram partials AND row-check
    partials from ONE read of the content column.

    validate()'s classic shape scans content twice — once for
    violations (sha256/null/key projections) and once for histograms.
    At 100 TB the content scan IS the cost (memory-bandwidth-bound,
    docs/SCALE.md), so halving scans nearly halves the engine's
    steady-state wall time. Mechanics:

    - every expensive per-row expression (sha256, null detail, bucket,
      fingerprint, UTF-8 encode) stays JVM-side codegen;
    - the Arrow kernel tags each incoming batch's narrow row columns
      through as kind='r' (zero content bytes — those stay in the
      dropped _bytes buffer) and folds the content buffer into
      histogram partials emitted as kind='h';
    - downstream, filter(kind) splits the (tiny: ~100 B/row + tasks x
      keys hist rows) fused table; one persist of it replaces a full
      second corpus scan.

    Same monoid contract as partial_histograms/row_check_partials —
    bit-identical outputs to the two-pass path (parity-tested)."""
    from sparkval.constraints import NATURAL_KEY, row_check_exprs

    n_langs = len(LANG_VOCAB)
    sha, null_detail = row_check_exprs()
    src = prepared_scan(
        corpus,
        config.n_repo_buckets,
        extra=[
            *[F.col(k) for k in NATURAL_KEY],
            sha.alias("content_sha256"),
            null_detail.alias("null_detail"),
        ],
    ).select("_key", "_fp", "_len", "_bytes", *_ROW_COLS)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # kind='r' rows stream out per batch; kind='h' partials fold
        # into one per-task accumulator (guide §2.3 — same monoid as
        # the merge stage, bit-identical downstream; see
        # partial_histograms) and emit once at task end.
        acc = _HistAccumulator(n_langs)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            # -- kind='r': pass the narrow row columns through
            # (content bytes stay behind in the dropped _bytes buffer)
            row_cols = {"kind": pa.array(["r"] * n, pa.string())}
            for f in PARTIAL_SCHEMA.fields:
                row_cols[f.name] = pa.nulls(n, _PA_TYPES[f.name])
            for i, c in enumerate(_ROW_COLS):
                row_cols[c] = batch.column(4 + i)
            yield pa.record_batch(row_cols, schema=_FUSED_PA_SCHEMA)

            acc.add(*_hist_partial_arrays(batch, n_langs))

        if acc:
            hb = acc.to_batch()
            G = hb.num_rows
            hist_cols = {"kind": pa.array(["h"] * G, pa.string())}
            for f in PARTIAL_SCHEMA.fields:
                hist_cols[f.name] = hb.column(f.name)
            for c in _ROW_COLS:
                hist_cols[c] = pa.nulls(G, pa.string())
            yield pa.record_batch(hist_cols, schema=_FUSED_PA_SCHEMA)

    return src.mapInArrow(gen, FUSED_SCHEMA)


_PA_TYPES = {
    "repo_bucket": pa.int32(),
    "lang": pa.string(),
    "n_files": pa.int64(),
    "n_null_content": pa.int64(),
    "total_bytes": pa.int64(),
    "byte_hist": pa.list_(pa.int64()),
    "len_hist": pa.list_(pa.int64()),
    "fingerprint": pa.int64(),
}

_FUSED_PA_SCHEMA = pa.schema(
    [("kind", pa.string())]
    + [(k, v) for k, v in _PA_TYPES.items()]
    + [(c, pa.string()) for c in _ROW_COLS]
)


def split_fused(fused: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(hist_partials, row_partials) views of a fused table — filters
    over the (persisted, tiny) fused output, NOT rescans of content."""
    hist = fused.filter(F.col("kind") == "h").select(
        *[f.name for f in PARTIAL_SCHEMA.fields]
    )
    rows = fused.filter(F.col("kind") == "r").select(*_ROW_COLS)
    return hist, rows


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """numpy merge of partial rows sharing one (repo_bucket, lang):
    scalar sums, xor of fingerprints, elementwise vector sums."""
    fp = 0
    for f in pdf["fingerprint"]:
        fp ^= int(f)
    return pd.DataFrame(
        [
            {
                "repo_bucket": int(pdf["repo_bucket"].iloc[0]),
                "lang": pdf["lang"].iloc[0],
                "n_files": int(pdf["n_files"].sum()),
                "n_null_content": int(pdf["n_null_content"].sum()),
                "total_bytes": int(pdf["total_bytes"].sum()),
                "byte_hist": np.sum(np.stack(pdf["byte_hist"].to_numpy()), axis=0),
                "len_hist": np.sum(np.stack(pdf["len_hist"].to_numpy()), axis=0),
                "fingerprint": fp,
            }
        ]
    )


MERGED_LANG_SCHEMA = T.StructType(
    list(PARTIAL_SCHEMA.fields)
    + [T.StructField("lang_hist", T.ArrayType(T.DoubleType()), False)]
)


def merge_histograms_with_lang(partials: DataFrame, salt_levels: int = 0) -> DataFrame:
    """Fused merge + lang-mix stage: ONE shuffle on repo_bucket does
    both the per-(bucket, lang) histogram merge and the bucket-wide
    lang-mix vector, instead of merge(groupBy bucket,lang) followed by
    add_lang_hist(groupBy bucket) — the operator-fusion rewrite the
    reference applied by hand everywhere (SURVEY §4), applied to
    shuffle stages: every stage saved is ~0.5-1 s of latency that would
    otherwise be a fixed serial cost at any cluster size.
    """
    merged = partials
    if salt_levels > 0:
        salted = partials.withColumn(
            "_salt", F.pmod(F.spark_partition_id(), F.lit(salt_levels))
        )
        merged = salted.groupBy("repo_bucket", "lang", "_salt").applyInPandas(
            lambda pdf: _merge_group(pdf.drop(columns=["_salt"])), PARTIAL_SCHEMA
        )

    def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pd.concat([_merge_group(g) for _, g in pdf.groupby("lang", sort=False)])
        counts = dict(zip(rows["lang"], rows["n_files"]))
        raw = np.array([float(counts.get(l, 0)) for l in LANG_VOCAB])
        vec = raw / max(raw.sum(), 1.0)
        rows["lang_hist"] = [vec] * len(rows)
        return rows

    return merged.groupBy("repo_bucket").applyInPandas(merge_bucket, MERGED_LANG_SCHEMA)


def merge_histograms(partials: DataFrame, salt_levels: int = 0) -> DataFrame:
    """Final per-(repo_bucket, lang) histogram table.

    One applyInPandas grouped merge (vector sums are a numpy stack-sum;
    xor/sum are associative, so any grouping order gives identical
    results). Versus a posexplode + per-bin hash-agg formulation this
    is ~5x fewer stages — partials are tiny (tasks x keys rows), so
    stage-scheduling overhead, not data volume, dominates the merge.

    ``salt_levels`` > 0 inserts a pre-merge on (key, task-salt) to
    bound per-group row counts when the map side produced millions of
    partials (the 100 TB case: 100k tasks x 144 keys -> cap each final
    group at salt_levels pre-merged rows).
    """
    keys = ["repo_bucket", "lang"]
    merged = partials
    if salt_levels > 0:
        salted = partials.withColumn(
            "_salt", F.pmod(F.spark_partition_id(), F.lit(salt_levels))
        )
        merged = (
            salted.groupBy(*keys, "_salt")
            .applyInPandas(
                lambda pdf: _merge_group(pdf.drop(columns=["_salt"])), PARTIAL_SCHEMA
            )
        )
    return merged.groupBy(*keys).applyInPandas(_merge_group, PARTIAL_SCHEMA)


def corpus_histograms(corpus: DataFrame, config: ValidationConfig) -> DataFrame:
    """scan -> map-side partials -> built-in merge. The one-stop API."""
    return merge_histograms(partial_histograms(corpus, config))


def add_lang_hist(hists: DataFrame) -> DataFrame:
    """Per-bucket lang-mix vector (LANG_VOCAB order) attached to every
    row of the bucket.

    One grouped-map over the (tiny) merged hist table — deliberately
    NOT a self-join of per-bucket totals back onto the rows: that
    diamond would make Spark evaluate the expensive upstream
    scan+partials lineage twice (once for the broadcast side, once for
    the probe side).
    """
    schema = T.StructType(
        list(hists.schema.fields)
        + [T.StructField("lang_hist", T.ArrayType(T.DoubleType()), False)]
    )

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = dict(zip(pdf["lang"], pdf["n_files"]))
        raw = np.array([float(counts.get(l, 0)) for l in LANG_VOCAB])
        vec = raw / max(raw.sum(), 1.0)
        out = pdf.copy()
        out["lang_hist"] = [vec] * len(pdf)
        return out

    return hists.groupBy("repo_bucket").applyInPandas(gen, schema)
