"""Golden-corpus capture harness — the engine's analog of the
reference's capture_cpp_scores.rs (tests/capture_cpp_scores.rs:1-40),
which shelled out to C++ butteraugli_main and wrote the 908-row
reference_data.rs table.

Our oracle is the engine's own deterministic numpy kernel path (the
survey's sanctioned stance: we fix OUR numbers, as the C++ binary fixed
theirs — SURVEY.md §5/§7.3b). This script regenerates
tests/golden_corpus.json: one row per named case with

    [score, pnorm_3, dm_min, dm_max, dm_mean, dm_std]

— score/pnorm pinned like reference_parity.rs:33-35, the driftmap
stats pinned like reference_data.rs:15-23 (the per-case diffmap
min/max/mean/std regression rows).

Case-name grammar: ``<generator>__<distortion>@<n_rows>`` — fully
self-describing, regenerable from the name alone (the
parse_dimensions discipline, generators.rs:24-30).

RECALIBRATION POLICY (CLAUDE.md:154-182 discipline): rerun this script
ONLY in a commit whose message states which kernel change moved which
cases and why; never to paper over an unexplained diff.

Usage: python tools/golden_corpus.py [--check]
    default: rewrite tests/golden_corpus.json
    --check: recompute and diff against the committed table (exit 1
             on any case outside tolerance) — what the pytest does,
             minus pytest.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkval import fixtures as fx  # noqa: E402
from sparkval import kernels as K  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden_corpus.json")

GENERATORS = [
    "uniform_python", "uniform_rust", "uniform_c", "uniform_go",
    "uniform_js", "uniform_md", "uniform_toml", "uniform_txt",
    "gradient_len", "bimodal_len", "random_mid", "sine_bytes",
]
DISTORTIONS = [
    "identity",
    "shift_1", "shift_3", "shift_10",
    "noise_7_0.1", "noise_7_0.5",
    "truncate_10", "truncate_50",
    "quantize_3", "quantize_8",
    "langswap_10",
    "nullify_10",
]
BULK_ROWS = 800

# FULL size cross product (round-4 verdict #4): every (generator,
# distortion) at every size — 12 x 12 x 3 = 432 cases. Sizes straddle
# the reflect-pad / half-res gates, so small-corpus and multi-res
# paths are pinned for every combination, not a sampled sweep.
ALL_ROWS = [200, BULK_ROWS, 3000]

# legacy sweep extras kept so their already-pinned points never vanish
# (truncate_20 is not in DISTORTIONS)
SIZE_SWEEP = [("sine_bytes", "truncate_20")]
SIZE_ROWS = [200, BULK_ROWS, 3000]

REL_TOL = 1e-3
ABS_TOL = 1e-9


def all_cases() -> list[str]:
    cases = [
        f"{g}__{d}@{n}" for g in GENERATORS for d in DISTORTIONS for n in ALL_ROWS
    ]
    cases += [f"{g}__{d}@{n}" for g, d in SIZE_SWEEP for n in SIZE_ROWS]
    return sorted(set(cases))


def compute_case(case: str) -> list[float]:
    name, _, rows = case.partition("@")
    b, s, _ = fx.make_case(name, n_rows=int(rows))
    score, pn3, dm = K.drift_score(fx.corpus_hists(b), fx.corpus_hists(s))
    return [
        float(score), float(pn3),
        float(np.min(dm)), float(np.max(dm)),
        float(np.mean(dm)), float(np.std(dm)),
    ]


def close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=REL_TOL, abs_tol=ABS_TOL)


def main() -> int:
    check = "--check" in sys.argv
    table = {c: compute_case(c) for c in all_cases()}
    if not check:
        with open(OUT, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
        print(f"wrote {len(table)} cases to {os.path.normpath(OUT)}")
        return 0
    with open(OUT) as f:
        want = json.load(f)
    bad = 0
    for c, got in table.items():
        w = want.get(c)
        if w is None or not all(close(g, x) for g, x in zip(got, w)):
            bad += 1
            print(f"DRIFT {c}: got={got} want={w}")
    print(f"{len(table) - bad}/{len(table)} cases within tolerance")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
