"""Salted per-repo stats + driftmap violation explosion tests."""

import numpy as np

from sparkval import fixtures as fx
from sparkval.config import ValidationConfig
from sparkval.drift import driftmap_violations
from sparkval.engine import ValidationEngine
from sparkval.stats import per_repo_stats


def test_per_repo_stats_exact_despite_salting(spark):
    pdf = fx.make_corpus("random_mid", 900)  # r0 is Zipf-hot (~30%)
    got = per_repo_stats(spark.createDataFrame(pdf), salt_buckets=8).toPandas()
    got = got.set_index("repo").sort_index()
    want = pdf.assign(_len=pdf["content"].str.len()).groupby("repo")
    assert (pdf["repo"] == "r0").mean() > 0.25  # skew actually present
    for repo, grp in want:
        assert got.loc[repo, "n_files"] == len(grp)
        assert got.loc[repo, "len_min"] == grp["_len"].min()
        assert got.loc[repo, "len_max"] == grp["_len"].max()
        assert abs(got.loc[repo, "len_mean"] - grp["_len"].mean()) < 1e-9


def test_driftmap_violations_addressable(spark):
    pdf = fx.make_corpus("uniform_python", 800)
    snap = fx.distort(pdf, "quantize_3")
    cfg = ValidationConfig(compute_driftmap=True, short_circuit_identical=False)
    eng = ValidationEngine(cfg)
    base = eng.build_baseline(spark.createDataFrame(pdf))
    verdicts = eng.validate(spark.createDataFrame(snap), base)["verdicts"]
    out = driftmap_violations(verdicts, threshold=cfg.bad_score).toPandas()
    assert len(out) > 0
    assert set(out["channel"]) <= {"byte", "len", "lang"}
    assert (out["drift"] >= cfg.bad_score).all()
    # channel_bin addresses are within each channel's range
    for ch, hi in (("byte", 256), ("len", 64), ("lang", 9)):
        sub = out[out["channel"] == ch]
        if len(sub):
            assert sub["channel_bin"].between(0, hi - 1).all()
