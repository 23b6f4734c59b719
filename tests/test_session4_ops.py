"""Round-5 session-4 operators: header/detail reconciliation, OLS
trend fit, blocked-levenshtein fuzzy dedup, weighted priority
sampling, candidate-key profiling. Each is value-oracled against
DuckDB in __spark_entry__; these tests pin the unit-level semantics
and the plan discipline.
"""

import hashlib
import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from tests.conftest import load


# ------------------------------------------------------- reconcile_totals

def _hd(spark):
    header = spark.createDataFrame(
        pd.DataFrame(
            {
                # hk=5: NULL stored total (has detail) -> unverifiable
                # hk=6: detail exists but every amount NULL -> unverifiable
                "hk": [1, 2, 3, 4, 5, 6],
                "total": [10.0, 99.0, 7.5, 4.0, None, 2.0],
                "grp": ["a", "a", "b", "b", "c", "c"],
            }
        )
    )
    detail = spark.createDataFrame(
        pd.DataFrame(
            {
                "dk": [1, 1, 2, 3, 5, 6],
                "amt": [4.0, 6.0, 50.0, 7.5, 1.0, None],
            }
        )
    )
    return header, detail


def test_reconcile_totals_counts_and_errors(spark):
    from sparkval.constraints import reconcile_totals

    header, detail = _hd(spark)
    out = {
        r["group_key"]: r
        for r in reconcile_totals(
            header, detail, "hk", "dk", "total", F.col("amt"),
            group_col="grp", rel_tol=0.01,
        ).collect()
    }
    # group a: hk=1 exact (10 == 4+6), hk=2 mismatch (99 vs 50)
    a = out["a"]
    assert a["n_headers"] == 2 and a["n_no_detail"] == 0
    assert a["n_within_tol"] == 1 and a["n_mismatch"] == 1
    assert a["max_rel_err"] == pytest.approx((99 - 50) / 99, abs=1e-6)
    # group b: hk=3 exact, hk=4 has no detail lines at all
    b = out["b"]
    assert b["n_headers"] == 2 and b["n_no_detail"] == 1
    assert b["n_within_tol"] == 1 and b["n_mismatch"] == 0
    # error stats ignore the no-detail header (NULL rel_err)
    assert b["mean_rel_err"] == 0.0 and b["max_rel_err"] == 0.0
    # group c: NULL stored total + all-NULL amounts are SURFACED as
    # unverifiable (not dropped), and the buckets still close
    c = out["c"]
    assert c["n_unverifiable"] == 2 and c["n_no_detail"] == 0
    assert c["n_within_tol"] == 0 and c["n_mismatch"] == 0  # 0, not NULL
    assert c["mean_rel_err"] is None
    for r in out.values():
        assert (
            r["n_no_detail"] + r["n_unverifiable"]
            + r["n_within_tol"] + r["n_mismatch"]
        ) == r["n_headers"]


def test_reconcile_totals_single_group_default(spark):
    from sparkval.constraints import reconcile_totals

    header, detail = _hd(spark)
    rows = reconcile_totals(
        header, detail, "hk", "dk", "total", F.col("amt")
    ).collect()
    assert len(rows) == 1 and rows[0]["group_key"] == "_all"
    assert rows[0]["n_headers"] == 6


# -------------------------------------------------------------- trend_fit

def test_trend_fit_recovers_perfect_line(spark):
    from sparkval.pipeline.events import trend_fit

    # y = 2 * days + 5 exactly, sampled every 6 hours for 10 days
    origin_us = 1704067200000000
    rows = []
    for i in range(40):
        us = origin_us + i * 6 * 3600 * 1000000
        days = i * 0.25
        rows.append(("m", pd.Timestamp(us, unit="us"), 2.0 * days + 5.0))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))
    out = trend_fit(df, key_col="k", ts_col="ts", value_col="v").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_points"] == 40
    assert r["slope_per_day"] == pytest.approx(2.0, abs=1e-6)
    assert r["intercept"] == pytest.approx(5.0, abs=1e-6)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)


def test_trend_fit_flat_series_zero_slope(spark):
    from sparkval.pipeline.events import trend_fit

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["m"] * 5,
                "ts": pd.date_range("2024-01-01", periods=5, freq="h"),
                "v": [3.0] * 5,
            }
        )
    )
    r = trend_fit(df, key_col="k", ts_col="ts", value_col="v").collect()[0]
    assert r["slope_per_day"] == 0.0 and r["mean_value"] == 3.0


# ------------------------------------------- near_duplicates_levenshtein

def test_levenshtein_pairs_distances_exact(spark):
    from sparkval.pipeline.dedup import near_duplicates_levenshtein

    base = "shared twelve-char prefix with a longer tail of words"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    base,
                    base[:-1] + "z",            # 1 substitution
                    base + " xyz",              # 4 appended chars
                    "completely different head",  # other block
                ],
            }
        )
    )
    got = {
        (r["a"], r["b"]): r["dist"]
        for r in near_duplicates_levenshtein(df, max_dist=4).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 4
    # t2 -> t3 is "insert 's xy' before the trailing z": exactly 4
    assert got[(2, 3)] == 4
    assert all(4 not in pair for pair in got)  # different block never pairs


def test_levenshtein_hot_block_cap_excludes(spark):
    from sparkval.pipeline.dedup import near_duplicates_levenshtein

    # 6 rows share a prefix block; with max_block=5 the block is
    # excluded entirely (boilerplate-prefix protection)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(6)),
                "text": [f"identical prefix tail {i}" for i in range(6)],
            }
        )
    )
    assert near_duplicates_levenshtein(df, max_dist=2, max_block=5).count() == 0
    assert near_duplicates_levenshtein(df, max_dist=2, max_block=6).count() > 0


def test_levenshtein_length_prune_is_sound(spark):
    from sparkval.pipeline.dedup import near_duplicates_levenshtein

    # |len diff| > max_dist implies dist > max_dist: pruning loses
    # nothing. Verify the surviving pair set equals brute force.
    texts = ["same prefix " + "x" * i for i in range(0, 12, 3)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        (r["a"], r["b"])
        for r in near_duplicates_levenshtein(df, max_dist=3).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    want = {
        (i, j)
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if lev(texts[i], texts[j]) <= 3
    }
    assert got == want and want  # non-empty by construction


# ---------------------------------------------------------- priority_sample

def _expected_priorities(ids, weights):
    out = []
    for i, w in zip(ids, weights):
        h = int(hashlib.sha256(str(i).encode()).hexdigest()[:12], 16)
        u = (h + 1) / 2**48
        out.append((-math.log(u) / w, i))
    return sorted(out)


def test_priority_sample_matches_python_replay(spark):
    from sparkval.pipeline.sampling import priority_sample

    ids = list(range(1, 201))
    weights = [(i % 7) * 50 + 10 for i in ids]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ids, "n_chars": weights})
    )
    got = priority_sample(df, k=20).collect()
    want = _expected_priorities(ids, weights)[:20]
    assert [r["doc_id"] for r in got] == [i for _, i in want]
    assert [r["rank"] for r in got] == list(range(1, 21))
    for r, (p, _) in zip(got, want):
        assert r["priority"] == pytest.approx(p, abs=1e-8)


def test_priority_sample_stable_under_repartition_and_skips_nonpositive(spark):
    from sparkval.pipeline.sampling import priority_sample

    pdf = pd.DataFrame({"doc_id": range(50), "n_chars": [10] * 48 + [0, -5]})
    df = spark.createDataFrame(pdf)
    a = [r["doc_id"] for r in priority_sample(df, k=48).collect()]
    b = [r["doc_id"] for r in priority_sample(df.repartition(7), k=48).collect()]
    assert a == b and len(a) == 48  # zero/negative weights never sampled
    assert 48 not in a and 49 not in a


def test_priority_sample_favors_heavy_rows(spark):
    from sparkval.pipeline.sampling import priority_sample

    # half the rows are 100x heavier: they should dominate the sample
    pdf = pd.DataFrame(
        {"doc_id": range(400), "n_chars": [1000] * 200 + [10] * 200}
    )
    got = priority_sample(spark.createDataFrame(pdf), k=50).collect()
    heavy = sum(1 for r in got if r["doc_id"] < 200)
    assert heavy >= 45


# ------------------------------------------------------------ key_candidates

def test_key_candidates_flags_real_keys(spark):
    from sparkval.stats import key_candidates

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": [1, 1, 2, 2],
                "b": [1, 2, 1, 2],
                "c": [1, 1, 1, 2],
            }
        )
    )
    out = {r["candidate"]: r for r in key_candidates(
        df, [("a",), ("a", "b"), ("a", "c")]
    ).collect()}
    assert not out["a"]["is_key"] and out["a"]["dup_rows"] == 2
    assert out["a+b"]["is_key"] and out["a+b"]["n_distinct"] == 4
    assert not out["a+c"]["is_key"] and out["a+c"]["dup_rows"] == 1


def test_key_candidates_rejects_unsafe_names(spark):
    from sparkval.stats import key_candidates

    df = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    with pytest.raises(ValueError):
        key_candidates(df, [("a; drop table x",)])


# ------------------------------------------------------------ plan sweep

def test_round5_session4_ops_plan_discipline(spark, sf_dir):
    """No per-row Python, no cartesian on data, for all five new ops.
    (reconcile and the fuzzy self-join shuffle on their keys by
    design, so SortMergeJoin is legitimate there.)"""
    from sparkval.constraints import reconcile_totals
    from sparkval.pipeline.dedup import near_duplicates_levenshtein
    from sparkval.pipeline.events import trend_fit
    from sparkval.pipeline.sampling import priority_sample
    from sparkval.stats import key_candidates

    docs = load(spark, sf_dir, "documents")
    ev = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    plans = {
        "reconcile": reconcile_totals(
            orders, li, "o_orderkey", "l_orderkey", "o_totalprice",
            F.col("l_extendedprice"), group_col="o_orderpriority",
        ),
        "trend": trend_fit(ev),
        "fuzzy": near_duplicates_levenshtein(docs),
        "priority": priority_sample(docs, k=10),
        "keys": key_candidates(li, [("l_orderkey",), ("l_orderkey", "l_linenumber")]),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # the sample must be a per-partition top-k, not a global sort
    pplan = plans["priority"]._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in pplan, pplan
    # candidate profiling is ONE scan
    kplan = plans["keys"]._jdf.queryExecution().executedPlan().toString()
    assert kplan.count("FileScan parquet") == 1, kplan


# --------------------------------------------------------- wasserstein_drift

def test_wasserstein_unit_shift_is_one(spark):
    from sparkval.stats import wasserstein_drift

    cur = spark.createDataFrame(pd.DataFrame({"g": ["x", "x"], "v": [0.0, 1.0]}))
    ref = spark.createDataFrame(pd.DataFrame({"g": ["x", "x"], "v": [1.0, 2.0]}))
    r = wasserstein_drift(cur, ref, "v", group_col="g").collect()[0]
    assert r["w1"] == pytest.approx(1.0, abs=1e-9)
    assert r["w1_norm"] == pytest.approx(0.5, abs=1e-9)  # range = 2
    assert r["n_current"] == 2 and r["n_reference"] == 2


def test_wasserstein_identical_zero_and_one_sided_null(spark):
    from sparkval.stats import wasserstein_drift

    a = spark.createDataFrame(pd.DataFrame({"g": ["x"] * 3, "v": [1, 5, 9]}))
    same = wasserstein_drift(a, a, "v", group_col="g").collect()[0]
    assert same["w1"] == 0.0
    only = spark.createDataFrame(pd.DataFrame({"g": ["y"] * 2, "v": [1, 2]}))
    rows = {
        r["g"]: r for r in wasserstein_drift(a, only, "v", group_col="g").collect()
    }
    assert rows["x"]["w1"] is None and rows["y"]["w1"] is None
    # degenerate single-point support, both sides present: W1 = 0 (not
    # NULL), and w1_norm stays NULL (zero range)
    pt = spark.createDataFrame(pd.DataFrame({"g": ["z"] * 2, "v": [5.0, 5.0]}))
    deg = wasserstein_drift(pt, pt.limit(1), "v", group_col="g").collect()[0]
    assert deg["w1"] == 0.0 and deg["w1_norm"] is None


def test_wasserstein_vs_scipy_style_oracle(spark):
    from sparkval.stats import wasserstein_drift
    import numpy as np

    rng = np.random.default_rng(11)
    cur = rng.integers(0, 40, 200).astype(float)
    ref = rng.integers(5, 60, 300).astype(float)
    # closed form: integral of |F1 - F2| over the merged support
    vals = np.unique(np.concatenate([cur, ref]))
    f1 = np.searchsorted(np.sort(cur), vals, side="right") / len(cur)
    f2 = np.searchsorted(np.sort(ref), vals, side="right") / len(ref)
    want = float(np.sum(np.abs(f1 - f2)[:-1] * np.diff(vals)))

    df = lambda v: spark.createDataFrame(  # noqa: E731
        pd.DataFrame({"g": ["x"] * len(v), "v": v})
    )
    r = wasserstein_drift(df(cur), df(ref), "v", group_col="g").collect()[0]
    assert r["w1"] == pytest.approx(want, abs=1e-6)


# --------------------------------------------------------- event_transitions

def test_event_transitions_counts_and_probs(spark):
    from sparkval.pipeline.events import event_transitions

    rows = [
        # user 1: a b a b    user 2: a a
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "a"),
        (4, 1, "2024-01-01 00:03:00", "b"),
        (5, 2, "2024-01-01 00:00:00", "a"),
        (6, 2, "2024-01-01 00:00:00", "a"),  # tie ts: event_id orders
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["prob"])
        for r in event_transitions(df).collect()
    }
    assert got[("a", "b")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert got[("a", "a")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert got[("b", "a")] == (1, 1.0)
    # no cross-user pair: user2's first event never follows user1's last
    assert ("b", "b") not in got and len(got) == 3
    # NULL-ts events have no timeline position: excluded entirely
    with_null = df.union(
        spark.createDataFrame(
            pd.DataFrame([(99, 1, None, "c")],
                         columns=["event_id", "user_id", "ts", "event_type"])
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )
    got2 = {
        (r["prev_type"], r["next_type"])
        for r in event_transitions(with_null).collect()
    }
    assert all("c" not in p for p in got2)


# ------------------------------------------------------- change_attribution

def test_change_attribution_shares(spark):
    from sparkval.pipeline.events import change_attribution

    rows = [
        ("s1", "2024-01-01 00:00:00", 10.0),
        ("s1", "2024-02-01 00:00:00", 30.0),   # s1: +20
        ("s2", "2024-01-01 00:00:00", 50.0),
        ("s2", "2024-02-01 00:00:00", 30.0),   # s2: -20
        ("s3", "2024-02-01 00:00:00", 5.0),    # s3: +5, nothing before
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["seg", "ts", "value"])
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {
        r["seg"]: r
        for r in change_attribution(
            df, "2024-01-15 00:00:00", segment_col="seg"
        ).collect()
    }
    assert out["s1"]["delta"] == 20.0
    assert out["s1"]["pct_change"] == pytest.approx(2.0, abs=1e-6)
    assert out["s1"]["share_of_total_delta"] == pytest.approx(4.0, abs=1e-6)
    assert out["s2"]["share_of_total_delta"] == pytest.approx(-4.0, abs=1e-6)
    # total delta = +5: shares sum to 1
    assert out["s3"]["pct_change"] is None  # empty before-period
    assert out["s3"]["share_of_total_delta"] == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------------------------ gap_fill

def test_gap_fill_carries_forward_and_flags(spark):
    from sparkval.pipeline.events import gap_fill

    rows = [
        ("m", "2024-01-01 00:10:00", 4.0),
        ("m", "2024-01-01 00:40:00", 8.0),   # hour 0 mean = 6
        # hours 1, 2 silent
        ("m", "2024-01-01 03:15:00", 10.0),  # hour 3
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = gap_fill(df).collect()
    assert len(out) == 4  # hours 0..3, nothing invented before/after
    vals = [(r["value"], r["is_filled"]) for r in out]
    assert vals == [(6.0, False), (6.0, True), (6.0, True), (10.0, False)]
    assert out[0]["bucket_ts"].minute == 0  # bucket-aligned timestamps


def test_gap_fill_span_guard_raises(spark):
    from sparkval.pipeline.events import gap_fill

    rows = [
        ("m", "2024-01-01 00:00:00", 1.0),
        ("m", "2025-01-01 00:00:00", 2.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    with pytest.raises(Exception, match="span exceeds"):
        gap_fill(df, max_units_per_group=100).collect()


def test_round5_session4b_ops_plan_discipline(spark, sf_dir):
    """Second sweep: the drift/repair/behavior ops stay vectorized —
    no per-row Python, no cartesian on data."""
    from sparkval.pipeline.events import (
        change_attribution,
        event_transitions,
        gap_fill,
    )
    from sparkval.constraints import interval_violations
    from sparkval.stats import proportion_drift, wasserstein_drift

    docs = load(spark, sf_dir, "documents")
    ev = load(spark, sf_dir, "events")
    plans = {
        "wasserstein": wasserstein_drift(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
            "n_chars",
            group_col="lang",
        ),
        "transitions": event_transitions(ev),
        "attribution": change_attribution(ev, "2024-01-16 00:00:00"),
        "gapfill": gap_fill(ev),
        "proportion": proportion_drift(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
            F.col("n_chars") > 300,
            group_col="lang",
        ),
        "intervals": interval_violations(
            ev.select(
                "event_id", "user_id",
                F.col("ts").alias("s"),
                (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
            ),
            "user_id", "s", "e", id_col="event_id",
        ),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


# --------------------------------------------------------- proportion_drift

def test_proportion_drift_zero_diff_and_flag(spark):
    from sparkval.stats import proportion_drift

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * 100, "hit": [True] * 30 + [False] * 70})
    )
    r = proportion_drift(df, df, F.col("hit"), group_col="g").collect()[0]
    assert r["z"] == 0.0 and not r["is_drift"]
    assert r["rate_current"] == r["rate_reference"] == 0.3
    assert r["n_current"] == r["n_reference"] == 100
    assert r["k_current"] == r["k_reference"] == 30


def test_proportion_drift_matches_closed_form(spark):
    from sparkval.stats import proportion_drift

    cur = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * 200, "hit": [True] * 80 + [False] * 120})
    )
    ref = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * 300, "hit": [True] * 60 + [False] * 240})
    )
    r = proportion_drift(cur, ref, F.col("hit"), group_col="g").collect()[0]
    p1, p2 = 80 / 200, 60 / 300
    pp = (80 + 60) / 500
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / 200 + 1 / 300))
    assert r["z"] == pytest.approx(z, abs=1e-6)
    assert r["is_drift"]  # |z| ~ 5: well past 3


def test_proportion_drift_degenerate_and_one_sided(spark):
    from sparkval.stats import proportion_drift

    allhit = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * 10, "hit": [True] * 10})
    )
    r = proportion_drift(allhit, allhit, F.col("hit"), group_col="g").collect()[0]
    assert r["z"] is None and not r["is_drift"]  # pooled rate 1: no variance
    only = spark.createDataFrame(
        pd.DataFrame({"g": ["y"] * 5, "hit": [True] * 5})
    )
    rows = {
        r["g"]: r
        for r in proportion_drift(allhit, only, F.col("hit"), group_col="g").collect()
    }
    assert rows["y"]["z"] is None and rows["y"]["n_current"] == 0
    # NULL flags count as misses, not hits
    withnull = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * 4, "hit": [True, False, None, None]})
    )
    r2 = proportion_drift(withnull, withnull, F.col("hit"), group_col="g").collect()[0]
    assert r2["k_current"] == 1 and r2["n_current"] == 4


# ------------------------------------------------------- interval_violations

def _iv(spark, rows):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "k", "s", "e"])
    )
    return (
        df.withColumn("s", F.col("s").cast("timestamp_ntz"))
        .withColumn("e", F.col("e").cast("timestamp_ntz"))
    )


def test_interval_violations_overlap_containment_inverted(spark):
    from sparkval.constraints import interval_violations

    rows = [
        (1, "u", "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
        (2, "u", "2024-01-01 01:00:00", "2024-01-01 01:30:00"),  # contained
        (3, "u", "2024-01-01 02:00:00", "2024-01-01 03:00:00"),  # touching: OK
        (4, "u", "2024-01-01 02:30:00", "2024-01-01 02:40:00"),  # overlaps 3
        (5, "u", "2024-01-01 05:00:00", "2024-01-01 04:00:00"),  # inverted
        (6, "v", "2024-01-01 00:30:00", "2024-01-01 01:00:00"),  # other key: OK
    ]
    out = {
        r["event_id"]: r
        for r in interval_violations(
            _iv(spark, rows), "k", "s", "e", id_col="event_id"
        ).collect()
    }
    assert set(out) == {2, 4, 5}
    assert out[2]["violation"] == "overlap"
    assert out[4]["violation"] == "overlap"
    assert out[5]["violation"] == "inverted"
    assert out[5]["conflicts_until"] is None
    # running max catches containment: event 2 conflicts with 1's end,
    # event 4 with 3's end
    assert str(out[2]["conflicts_until"]).startswith("2024-01-01 02:00:00")
    assert str(out[4]["conflicts_until"]).startswith("2024-01-01 03:00:00")


def test_interval_violations_null_bounds_are_surfaced(spark):
    from sparkval.constraints import interval_violations

    rows = [
        (1, "u", "2024-01-01 00:00:00", None),                    # open end
        (2, "u", None, "2024-01-01 01:00:00"),                    # null start
        (3, "u", "2024-01-02 00:00:00", "2024-01-02 01:00:00"),   # clean
    ]
    out = {
        r["event_id"]: r
        for r in interval_violations(
            _iv(spark, rows), "k", "s", "e", id_col="event_id"
        ).collect()
    }
    # NULL bounds are reported, not silently dropped, and they don't
    # poison the running max for clean rows
    assert set(out) == {1, 2}
    assert out[1]["violation"] == out[2]["violation"] == "null_bound"
    assert out[1]["conflicts_until"] is None


def test_interval_violations_single_scan(spark, sf_dir):
    from sparkval.constraints import interval_violations

    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "event_id", "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    plan = (
        interval_violations(iv, "user_id", "s", "e", id_col="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1, plan


def test_proportion_drift_null_group_is_one_group(spark):
    from sparkval.stats import proportion_drift

    cur = spark.createDataFrame(
        pd.DataFrame({"g": [None, None, "x"], "hit": [True, False, True]})
    )
    ref = spark.createDataFrame(
        pd.DataFrame({"g": [None, "x"], "hit": [False, True]})
    )
    rows = proportion_drift(cur, ref, F.col("hit"), group_col="g").collect()
    null_rows = [r for r in rows if r["g"] is None]
    # ONE row for the NULL group, with both sides populated
    assert len(null_rows) == 1
    assert null_rows[0]["n_current"] == 2 and null_rows[0]["n_reference"] == 1


def test_interval_violations_inverted_rows_do_not_cascade(spark):
    from sparkval.constraints import interval_violations

    # the inverted row's bogus end (year 2030) must NOT poison the
    # running max for later rows
    rows = [
        (1, "u", "2024-01-01 00:00:00", "2030-01-01 00:00:00"),
        (2, "u", "2024-01-02 00:00:00", "2024-01-02 01:00:00"),
    ]
    bad_first = [
        (1, "u", "2030-01-01 00:00:00", "2024-01-01 00:00:00"),  # inverted
        (2, "u", "2024-01-02 00:00:00", "2024-01-02 01:00:00"),
    ]
    out1 = {r["event_id"]: r["violation"] for r in interval_violations(
        _iv(spark, rows), "k", "s", "e", id_col="event_id").collect()}
    assert out1 == {2: "overlap"}  # legit long interval does overlap
    out2 = {r["event_id"]: r["violation"] for r in interval_violations(
        _iv(spark, bad_first), "k", "s", "e", id_col="event_id").collect()}
    assert out2 == {1: "inverted"}  # row 2 unaffected by the malformed row


# --------------------------------------------------------- embedding_drift

def test_embedding_drift_known_shift(spark):
    from sparkval.pipeline.similarity import embedding_drift
    import numpy as np

    rng = np.random.default_rng(3)
    ref = rng.normal(0, 1, (50, 8))
    cur = ref + np.array([0, 0, 0, 2.0, 0, 0, 0, 0])  # dim 3 shifted by 2

    def df(m):
        return spark.createDataFrame(
            pd.DataFrame({"embedding": [list(map(float, r)) for r in m]})
        )

    r = embedding_drift(df(cur), df(ref)).collect()[0]
    ma, mb = cur.mean(axis=0), ref.mean(axis=0)
    want_cos = float(ma @ mb / (np.linalg.norm(ma) * np.linalg.norm(mb)))
    assert r["n_current"] == r["n_reference"] == 50
    assert r["mean_cosine"] == pytest.approx(want_cos, abs=1e-6)
    assert r["l2_shift"] == pytest.approx(2.0, abs=1e-9)
    assert r["max_dim_shift"] == pytest.approx(2.0, abs=1e-9)
    assert r["worst_dim"] == 3


def test_embedding_drift_identical_and_degenerate(spark):
    from sparkval.pipeline.similarity import embedding_drift

    same = spark.createDataFrame(
        pd.DataFrame({"embedding": [[1.0, 2.0], [3.0, 4.0]]})
    )
    r = embedding_drift(same, same).collect()[0]
    assert r["mean_cosine"] == 1.0 and r["l2_shift"] == 0.0
    # zero-norm mean on one side: cosine is undefined -> NULL
    zero = spark.createDataFrame(
        pd.DataFrame({"embedding": [[1.0, 0.0], [-1.0, 0.0]]})
    )
    r2 = embedding_drift(zero, same).collect()[0]
    assert r2["mean_cosine"] is None
    assert r2["l2_shift"] is not None  # distance still defined


def test_embedding_drift_ragged_dims_zero_pad(spark):
    from sparkval.pipeline.similarity import embedding_drift
    import numpy as np

    # encoder width change: current is 4-dim, reference is 2-dim; the
    # two new dims must contribute their full mean as displacement
    cur = spark.createDataFrame(
        pd.DataFrame({"embedding": [[1.0, 1.0, 3.0, 0.0], [1.0, 1.0, 3.0, 0.0]]})
    )
    ref = spark.createDataFrame(
        pd.DataFrame({"embedding": [[1.0, 1.0], [1.0, 1.0]]})
    )
    r = embedding_drift(cur, ref).collect()[0]
    assert r["l2_shift"] == pytest.approx(3.0, abs=1e-9)
    assert r["max_dim_shift"] == pytest.approx(3.0, abs=1e-9)
    assert r["worst_dim"] == 2
    # empty snapshot: counts are 0, not NULL
    empty = cur.filter(F.lit(False))
    r2 = embedding_drift(empty, ref).collect()[0]
    assert r2["n_current"] == 0 and r2["n_reference"] == 2


# -------------------------------------------------------- numeric_histogram

def test_numeric_histogram_bins_and_zero_fill(spark):
    from sparkval.stats import numeric_histogram

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * 5, "v": [0.0, 1.0, 1.5, 9.9, 10.0]})
    )
    out = numeric_histogram(df, "v", n_bins=5, group_col="g").collect()
    assert len(out) == 5  # fixed shape: every bin emitted
    by_bin = {r["bin"]: r for r in out}
    # width 2: [0,2) holds 0,1,1.5; [8,10] holds 9.9 and the max
    assert by_bin[0]["n"] == 3
    assert by_bin[4]["n"] == 2  # max value pinned INTO the last bin
    assert by_bin[1]["n"] == by_bin[2]["n"] == by_bin[3]["n"] == 0
    assert by_bin[0]["bin_lo"] == 0.0 and by_bin[0]["bin_hi"] == 2.0
    assert by_bin[4]["bin_hi"] == 10.0
    assert sum(r["n"] for r in out) == 5  # counts partition the rows


def test_numeric_histogram_single_point_support(spark):
    from sparkval.stats import numeric_histogram

    df = spark.createDataFrame(pd.DataFrame({"g": ["x"] * 3, "v": [7.0] * 3}))
    out = numeric_histogram(df, "v", n_bins=4, group_col="g").collect()
    by_bin = {r["bin"]: r["n"] for r in out}
    assert by_bin[0] == 3 and sum(by_bin.values()) == 3


def test_numeric_histogram_plan_no_sort_no_python(spark, sf_dir):
    from sparkval.stats import numeric_histogram

    ev = load(spark, sf_dir, "events")
    plan = (
        numeric_histogram(ev, "value", group_col="event_type")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # bounds broadcast back


def test_numeric_histogram_null_group_and_nan(spark):
    from sparkval.stats import numeric_histogram
    import math as _m

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "g": [None, None, "x", "x"],
                "v": [1.0, 3.0, 5.0, _m.nan],
            }
        )
    )
    out = numeric_histogram(df, "v", n_bins=2, group_col="g").collect()
    null_rows = [r for r in out if r["g"] is None]
    x_rows = [r for r in out if r["g"] == "x"]
    # NULL group keeps its counts (null-safe joins), NaN excluded
    assert sum(r["n"] for r in null_rows) == 2
    assert sum(r["n"] for r in x_rows) == 1
    with pytest.raises(ValueError, match="collides"):
        numeric_histogram(df.withColumnRenamed("g", "bin"), "v", group_col="bin")


# -------------------------------------------------------- table_fingerprint

def test_table_fingerprint_order_independent_and_sensitive(spark):
    from sparkval.constraints import table_fingerprint

    pdf = pd.DataFrame({"a": range(100), "b": [f"s{i % 7}" for i in range(100)]})
    df = spark.createDataFrame(pdf)
    f1 = table_fingerprint(df, ["a", "b"]).collect()[0]
    f2 = table_fingerprint(df.repartition(13).orderBy(F.rand(7)), ["a", "b"]).collect()[0]
    assert f1 == f2  # pure function of content, not layout
    changed = spark.createDataFrame(pdf.assign(b=pdf.b.mask(pdf.index == 50, "XX")))
    f3 = table_fingerprint(changed, ["a", "b"]).collect()[0]
    assert f3["xor_hash"] != f1["xor_hash"] and f3["n_rows"] == f1["n_rows"]


def test_table_fingerprint_null_distinct_from_null_string(spark):
    from sparkval.constraints import table_fingerprint

    with_null = spark.createDataFrame(pd.DataFrame({"a": [1], "b": [None]}))
    with_str = spark.createDataFrame(pd.DataFrame({"a": [1], "b": ["NULL"]}))
    h1 = table_fingerprint(with_null, ["a", "b"]).collect()[0]["xor_hash"]
    h2 = table_fingerprint(with_str, ["a", "b"]).collect()[0]["xor_hash"]
    assert h1 != h2


# ------------------------------------------------------ cross_split_leakage

def test_cross_split_leakage_detects_planted_and_clean_is_empty(spark):
    from sparkval.pipeline.sampling import cross_split_leakage, hash_split

    base = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(200), "text": [f"t{i}" for i in range(200)]})
    )
    assert cross_split_leakage(base).count() == 0  # unique contents: clean
    copies = base.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    leaky = base.unionByName(copies)
    out = cross_split_leakage(leaky).collect()
    total_pairs = sum(r["n_leaked_pairs"] for r in out)
    # every (orig, copy) pair whose ids hashed to different splits leaks
    s = {r["doc_id"]: r["split"] for r in hash_split(
        leaky.select("doc_id")).collect()}
    want = sum(1 for i in range(200) if s[i] != s[i + 1000])
    assert total_pairs == want and want > 0
    for r in out:
        assert r["split_a"] < r["split_b"]


# ----------------------------------------------------------- profile_table

def test_profile_table_values_and_single_scan(spark, sf_dir):
    from sparkval.stats import profile_table

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, None), (None, "y")], "a int, b string"
    )
    out = {r["column_name"]: r for r in profile_table(df).collect()}
    assert out["a"]["n_rows"] == 4 and out["a"]["n_nulls"] == 1
    assert out["a"]["n_distinct"] == 2  # NULL not a distinct value
    assert out["a"]["min_value"] == "1" and out["a"]["max_value"] == "2"
    assert out["b"]["n_nulls"] == 2 and out["b"]["null_frac"] == 0.5
    assert out["b"]["min_value"] == "x" and out["b"]["max_value"] == "y"
    with pytest.raises(ValueError):
        profile_table(df, ["a; drop"])
    # single FileScan for a 4-column profile over parquet
    li = load(spark, sf_dir, "lineitem")
    plan = (
        profile_table(li, ["l_orderkey", "l_partkey", "l_returnflag"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1, plan


# ---------------------------------------------------------- freshness_report

def test_freshness_report_lag_and_stale(spark):
    from sparkval.pipeline.events import freshness_report

    rows = [
        ("fresh", "2024-01-02 00:00:00"),
        ("fresh", "2024-01-02 11:00:00"),   # table max: the reference
        ("stale", "2024-01-01 00:00:00"),   # 35h behind
        ("silent", None),                    # only NULL ts
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts"])
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["event_type"]: r for r in freshness_report(df).collect()}
    assert out["fresh"]["lag_minutes"] == 0.0 and not out["fresh"]["is_stale"]
    assert out["stale"]["lag_minutes"] == 35 * 60.0 and out["stale"]["is_stale"]
    assert out["silent"]["last_ts"] is None and out["silent"]["is_stale"]
    # explicit as_of instant
    out2 = freshness_report(
        df.filter(F.col("event_type") == "fresh"),
        as_of_us=1704240000000000,  # 2024-01-03T00:00Z
    ).collect()[0]
    assert out2["lag_minutes"] == 13 * 60.0


# -------------------------------------------- stratified_priority_sample

def test_stratified_priority_sample_exact_quotas_and_replay(spark):
    from sparkval.pipeline.sampling import stratified_priority_sample

    pdf = pd.DataFrame(
        {
            "doc_id": range(100),
            "lang": ["en"] * 60 + ["fr"] * 37 + ["xx"] * 3,
            "n_chars": [(i % 9) * 30 + 10 for i in range(100)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = stratified_priority_sample(df, k_per_group=5)
    got = out.collect()
    per = {}
    for r in got:
        per.setdefault(r["lang"], []).append(r)
    assert len(per["en"]) == 5 and len(per["fr"]) == 5
    assert len(per["xx"]) == 3  # smaller group returns whole
    # matches the python replay of the E-S priorities per group
    for lang, rows in per.items():
        ids = [i for i in range(100) if pdf.lang[i] == lang]
        want = _expected_priorities(ids, [pdf.n_chars[i] for i in ids])
        assert [r["doc_id"] for r in rows] == [i for _, i in want[: len(rows)]]
    # stable under repartitioning
    again = stratified_priority_sample(df.repartition(7), k_per_group=5)
    assert [r["doc_id"] for r in again.collect()] == [r["doc_id"] for r in got]


def test_round5_session4c_ops_plan_discipline(spark, sf_dir):
    """Plan sweep for the profiling/audit batch: no per-row Python, no
    cartesian on data. (freshness_report's 1-row reference instant
    broadcast legitimately appears as BroadcastNestedLoopJoin — a
    bounded scalar crossJoin, same as the BM25 stats row.)"""
    from sparkval.constraints import table_fingerprint
    from sparkval.pipeline.events import freshness_report
    from sparkval.pipeline.sampling import (
        cross_split_leakage,
        stratified_priority_sample,
    )
    from sparkval.stats import profile_table

    docs = load(spark, sf_dir, "documents")
    ev = load(spark, sf_dir, "events")
    li = load(spark, sf_dir, "lineitem")
    plans = {
        "fingerprint": table_fingerprint(li, ["l_orderkey", "l_returnflag"]),
        "leakage": cross_split_leakage(docs),
        "profile": profile_table(li, ["l_orderkey", "l_returnflag"]),
        "freshness": freshness_report(ev),
        "strat_sample": stratified_priority_sample(docs, k_per_group=5),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        if name != "freshness":
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_table_fingerprint_framing_is_unambiguous(spark):
    from sparkval.constraints import table_fingerprint

    # separator inside a value must NOT realign with a column boundary
    a = spark.createDataFrame([("x\x1fy", "z")], "c1 string, c2 string")
    b = spark.createDataFrame([("x", "y\x1fz")], "c1 string, c2 string")
    ha = table_fingerprint(a, ["c1", "c2"]).collect()[0]["xor_hash"]
    hb = table_fingerprint(b, ["c1", "c2"]).collect()[0]["xor_hash"]
    assert ha != hb
    with pytest.raises(ValueError):
        table_fingerprint(a, [])


def test_stratified_priority_sample_collision_guard_and_id_col(spark):
    from sparkval.pipeline.sampling import (
        cross_split_leakage,
        stratified_priority_sample,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"rank": [1], "doc_id": [1], "n_chars": [5]})
    )
    with pytest.raises(ValueError, match="collides"):
        stratified_priority_sample(df, 1, group_col="rank")
    # cross_split_leakage honors a non-default id column
    d2 = spark.createDataFrame(
        pd.DataFrame({"item_id": range(40), "body": ["t"] * 40})
    )
    out = cross_split_leakage(d2, text_col="body", id_col="item_id")
    assert out.count() > 0  # identical contents spread across splits


def test_partition_fingerprints_fold_equals_whole_table(spark):
    from functools import reduce

    from sparkval.constraints import partition_fingerprints, table_fingerprint

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "p": ["a", "b", None, "a", "b"],
                "x": [1, 2, 3, 4, 5],
                "y": ["u", None, "w", "u", "v"],
            }
        )
    )
    parts = partition_fingerprints(df, "p", ["x", "y"]).collect()
    whole = table_fingerprint(df, ["x", "y"]).collect()[0]
    assert sum(r["n_rows"] for r in parts) == whole["n_rows"]
    assert reduce(lambda a, b: a ^ b, [r["xor_hash"] for r in parts]) == whole["xor_hash"]
    assert min(r["min_hash"] for r in parts) == whole["min_hash"]
    assert max(r["max_hash"] for r in parts) == whole["max_hash"]
    # NULL partition keys form their own partition (else the fold
    # would not cover all rows)
    assert any(r["p"] is None for r in parts)


def test_dedupe_fuzzy_fused_keeps_chain_minimum(spark):
    from sparkval.pipeline.dedup import dedupe_near_duplicates

    base = "chain prefix shared by all variants tail"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12, 13, 99],
                "text": [
                    base,              # 10
                    base + "x",        # 11: 1 edit from 10
                    base + "xy",       # 12: 1 edit from 11, 2 from 10
                    base + "xyzk",     # 13: 2 edits from 12 (chain!)
                    "unrelated other head entirely",  # 99: singleton
                ],
            }
        )
    )
    kept = sorted(
        r["doc_id"]
        for r in dedupe_near_duplicates(
            df, method="levenshtein", max_edit=2
        ).collect()
    )
    # 10-11-12-13 form ONE component via transitivity (13 is 4 edits
    # from 10 — farther than max_edit — but chained through 11/12)
    assert kept == [10, 99]
    with pytest.raises(ValueError, match="unknown method"):
        dedupe_near_duplicates(df, method="nope")
