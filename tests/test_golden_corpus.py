"""Golden-corpus parity suite — the reference_parity.rs analog at
breadth (the reference pins 908 C++-captured cases at <=0.1% relative,
tests/common/reference_data.rs:39 + reference_parity.rs:33-35; we pin
the FULL 12 generator x 12 distortion x 3 size cross product — 432
cases, plus legacy sweep extras — of OUR deterministic kernel).

Each case pins six values: score, pnorm_3, and the driftmap's
min/max/mean/std (the reference's per-case diffmap-stats regression
rows, reference_data.rs:15-23). A gating regression in any single band
has to move at least one of 435 points spread across every generator,
distortion and corpus size combination.

Regenerate ONLY via `python tools/golden_corpus.py` in an explicit
recalibration commit naming the kernel change (CLAUDE.md:154-182
discipline: no escape hatches, no silent re-pins).
"""

import json
import os

import pytest

from sparkval import fixtures as fx
from sparkval import kernels as K

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "golden_corpus.json")
with open(_TABLE_PATH) as f:
    GOLDEN_TABLE = json.load(f)

_FIELDS = ("score", "pnorm_3", "dm_min", "dm_max", "dm_mean", "dm_std")


def _compute(case: str):
    import numpy as np

    name, _, rows = case.partition("@")
    b, s, _ = fx.make_case(name, n_rows=int(rows))
    score, pn3, dm = K.drift_score(fx.corpus_hists(b), fx.corpus_hists(s))
    return (
        float(score), float(pn3),
        float(np.min(dm)), float(np.max(dm)),
        float(np.mean(dm)), float(np.std(dm)),
    )


def test_corpus_size():
    # the table must stay at golden breadth — a shrunken regeneration
    # (e.g. a generator silently dropped) fails loudly
    assert len(GOLDEN_TABLE) >= 430


@pytest.mark.parametrize("case", sorted(GOLDEN_TABLE))
def test_golden_case(case):
    got = _compute(case)
    want = GOLDEN_TABLE[case]
    for field, g, w in zip(_FIELDS, got, want):
        assert g == pytest.approx(w, rel=1e-3, abs=1e-9), (case, field, g, w)
