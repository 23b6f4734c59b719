"""Pure-numpy/arrow parity tests for the batch shingle kernels: the
mapInArrow stream must be bit-identical to the scalar _shingles oracle
for every edge shape (empty, null, shorter-than-k, exactly-k, long).
"""

import numpy as np
import pyarrow as pa

from sparkval.pipeline import dedup


TEXTS = [
    "hello world this is a test document with enough text",
    "",
    None,
    "ab",
    "xxxx",
    "exact",
    "longer doc with more text " * 3,
    "ünïcødé — 多字节 content ✓",
]


def _batch(texts):
    return pa.record_batch(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_arrow_shingle_stream_matches_scalar():
    flat, counts = dedup._arrow_shingle_stream(_batch(TEXTS), 1, 5)
    off = np.concatenate(([0], np.cumsum(counts)))
    for i, t in enumerate(TEXTS):
        want = dedup._shingles(t or "", 5, unique=False)
        got = flat[off[i] : off[i + 1]]
        assert np.array_equal(got, want), (i, t)


def test_segmented_unique_matches_np_unique():
    flat, counts = dedup._arrow_shingle_stream(_batch(TEXTS), 1, 5)
    uflat, ucounts = dedup._segmented_unique(flat, counts)
    uoff = np.concatenate(([0], np.cumsum(ucounts)))
    for i, t in enumerate(TEXTS):
        want = dedup._shingles(t or "", 5, unique=True)
        assert np.array_equal(uflat[uoff[i] : uoff[i + 1]], want), (i, t)


def test_arrow_shingle_stream_other_k():
    flat, counts = dedup._arrow_shingle_stream(_batch(TEXTS), 1, 9)
    off = np.concatenate(([0], np.cumsum(counts)))
    for i, t in enumerate(TEXTS):
        want = dedup._shingles(t or "", 9, unique=False)
        assert np.array_equal(flat[off[i] : off[i + 1]], want), (i, t)
