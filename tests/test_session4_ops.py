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
                "hk": [1, 2, 3, 4],
                "total": [10.0, 99.0, 7.5, 4.0],
                "grp": ["a", "a", "b", "b"],
            }
        )
    )
    detail = spark.createDataFrame(
        pd.DataFrame(
            {
                "dk": [1, 1, 2, 3],
                "amt": [4.0, 6.0, 50.0, 7.5],
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


def test_reconcile_totals_single_group_default(spark):
    from sparkval.constraints import reconcile_totals

    header, detail = _hd(spark)
    rows = reconcile_totals(
        header, detail, "hk", "dk", "total", F.col("amt")
    ).collect()
    assert len(rows) == 1 and rows[0]["group_key"] == "_all"
    assert rows[0]["n_headers"] == 4


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
