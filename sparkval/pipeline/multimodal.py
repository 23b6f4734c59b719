"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
mapInPandas stages over Arrow batches. The decode step itself is
STUBBED in this container (no image/audio libs): ``decode_stub``
raises NotImplementedError unless ``deterministic_fake=True``, which
produces a seeded fake feature vector so the Spark-side plumbing —
schema, batching, partitioning, UDF signatures — is real and testable.

Scale notes: binary payloads dominate row size, so feature extraction
must select ONLY (id, payload) into the UDF stage (column pruning
keeps the scan narrow), and the output drops the payload immediately.
spark.sql.execution.arrow.maxRecordsPerBatch bounds per-batch memory;
for multi-MB payloads deployments lower it (e.g. 64) so a batch stays
well under task memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),   # image | audio | video
        T.StructField("format", T.StringType(), True),  # png | jpg | wav | ...
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("n_channels", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_DIM = 32

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_stub(payload: bytes, kind: str, deterministic_fake: bool) -> np.ndarray:
    """Decode boundary. Real decoders (PIL/librosa/ffmpeg) are not in
    this container; the fake path is a seeded hash-derived vector so
    downstream plumbing has stable, testable inputs."""
    if not deterministic_fake:
        raise NotImplementedError(
            f"no {kind} decoder available in this environment; "
            "install the media libs or pass deterministic_fake=True"
        )
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((_FEATURE_DIM * 4) // len(digest) + 1))[: _FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """Payload -> feature vector, one vectorized pass.

    Input must contain (media_id, kind, payload); everything else is
    pruned before the Arrow transfer on purpose.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                out.append(
                    {
                        "media_id": mid,
                        "payload_sha256": hashlib.sha256(p).hexdigest(),
                        "payload_bytes": len(p),
                        "features": decode_stub(p, kind, deterministic_fake),
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(gen, _FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts).
    Pure built-ins — sequence() explodes the sampling timeline from
    metadata without touching payloads (the decode happens later,
    payload-joined, in extract_features)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded payloads).

    Payloads are ASCII (repeated sha256 hexdigests) on purpose: an
    external SQL oracle can then reproduce payload bytes, sha256 and
    the fake feature vector exactly (DuckDB's sha256 is VARCHAR-only,
    so raw binary payloads would be unverifiable there)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (hashlib.sha256(f"media-{i}".encode()).hexdigest() * (i % 5 + 1)).encode()
        rows.append(
            (
                i,
                kind,
                {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                bytearray(payload),
                (64 + i, 48 + i, 1000 * (i % 7 + 1), 3)
                if kind != "audio"
                else (None, None, 1000 * (i % 7 + 1), 2),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
