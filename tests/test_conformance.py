"""Distribution-conformance gates: KS drift, Benford digits,
chi-square independence (stats.ks_drift / benford_report /
chi2_independence) — the classical-statistics siblings of the PSI
gate, value-oracled in __spark_entry__ and property-tested here.
"""

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sparkval.stats import BENFORD_P, benford_report, chi2_independence, ks_drift


# ---------------------------------------------------------------- ks_drift

def _df(spark, values, group="g"):
    return spark.createDataFrame(
        pd.DataFrame({"grp": [group] * len(values), "v": values})
    )


def test_ks_identical_inputs_is_zero(spark):
    a = _df(spark, [1, 2, 2, 3, 5, 8, 13])
    out = ks_drift(a, a, "v", group_col="grp").collect()
    assert len(out) == 1
    assert out[0]["ks_d"] == 0.0
    assert out[0]["n_current"] == out[0]["n_reference"] == 7


def test_ks_matches_numpy_oracle(spark):
    rng = np.random.default_rng(7)
    cur = rng.integers(0, 50, 400)
    ref = rng.integers(10, 60, 300)
    vals = np.unique(np.concatenate([cur, ref]))
    f_cur = np.searchsorted(np.sort(cur), vals, side="right") / len(cur)
    f_ref = np.searchsorted(np.sort(ref), vals, side="right") / len(ref)
    expected = round(float(np.max(np.abs(f_cur - f_ref))), 6)

    out = ks_drift(
        _df(spark, cur.tolist()), _df(spark, ref.tolist()), "v", group_col="grp"
    ).collect()[0]
    assert out["ks_d"] == pytest.approx(expected, abs=1e-9)
    assert out["n_current"] == 400 and out["n_reference"] == 300


def test_ks_shift_monotone(spark):
    """A bigger location shift must not yield a smaller D."""
    base = list(range(100))
    d = []
    for shift in (0, 5, 200):  # 200 => disjoint supports => D == 1
        cur = _df(spark, [v + shift for v in base])
        d.append(
            ks_drift(cur, _df(spark, base), "v", group_col="grp").collect()[0]["ks_d"]
        )
    assert d[0] == 0.0 and d[0] <= d[1] <= d[2] and d[2] == 1.0


def test_ks_one_sided_group_reports_null(spark):
    cur = spark.createDataFrame(pd.DataFrame({"grp": ["a", "b"], "v": [1, 2]}))
    ref = spark.createDataFrame(pd.DataFrame({"grp": ["a"], "v": [1]}))
    rows = {r["grp"]: r for r in ks_drift(cur, ref, "v", group_col="grp").collect()}
    assert rows["b"]["ks_d"] is None
    assert rows["b"]["n_current"] == 1 and rows["b"]["n_reference"] == 0


# ----------------------------------------------------------- benford_report

def test_benford_masses_sum_to_one():
    assert math.fsum(BENFORD_P) == pytest.approx(1.0, abs=1e-12)
    assert BENFORD_P[0] == pytest.approx(math.log10(2), abs=1e-15)


def _benford_sample(n=4500):
    # exact Benford by construction: value 10^(u) for u uniform grid
    # in [0,1) has first digit d with P = log10(1+1/d)
    u = (np.arange(n) + 0.5) / n
    return np.floor(10 ** (u + 2)).astype(np.int64)  # 3-digit ints


def test_benford_conforming_vs_uniform_digits(spark):
    conforming = _benford_sample()
    uniform = np.repeat(np.arange(1, 10), 500) * 100  # flat digit distribution
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "grp": ["ben"] * len(conforming) + ["uni"] * len(uniform),
                "v": np.concatenate([conforming, uniform]).astype(float),
            }
        )
    )
    out = benford_report(df, "v", group_col="grp").toPandas()
    chi_ben = out[out.grp == "ben"].chi2.iloc[0]
    chi_uni = out[out.grp == "uni"].chi2.iloc[0]
    # conforming sample passes the 5% gate (crit value 15.51, df=8);
    # flat digits fail it by orders of magnitude
    assert chi_ben < 15.51 < chi_uni
    # per-digit shares: conforming tracks the masses
    ben = out[out.grp == "ben"].sort_values("digit")
    assert np.allclose(ben.p_obs.to_numpy(), BENFORD_P, atol=0.01)
    assert np.allclose(ben.p_benford.to_numpy(), np.round(BENFORD_P, 6))


def test_benford_missing_digit_identity(spark):
    """chi2 with absent digits equals the densified formula: an
    unobserved digit contributes exactly its expected count."""
    vals = [1.0] * 30 + [2.5] * 20  # only digits 1 and 2 observed
    df = spark.createDataFrame(pd.DataFrame({"grp": ["g"] * 50, "v": vals}))
    out = benford_report(df, "v", group_col="grp").toPandas()
    n = 50
    obs = {1: 30, 2: 20}
    expected_chi2 = sum(
        (obs.get(d, 0) - n * p) ** 2 / (n * p)
        for d, p in zip(range(1, 10), BENFORD_P)
    )
    assert out.chi2.iloc[0] == pytest.approx(expected_chi2, abs=1e-5)
    assert set(out.digit) == {1, 2}  # only observed digits get rows


def test_benford_excludes_sub_one_values(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"grp": ["g"] * 4, "v": [0.5, 0.0, -3.0, 12.0]})
    )
    out = benford_report(df, "v", group_col="grp").toPandas()
    assert out.n_obs.sum() == 1 and out.digit.iloc[0] == 1


# ------------------------------------------------------ chi2_independence

def test_chi2_independent_product_table(spark):
    """An exact product contingency table has chi2 == 0, V == 0."""
    rows = []
    for r, nr in [("a", 2), ("b", 3)]:
        for c, nc in [("x", 4), ("y", 1)]:
            rows += [{"r": r, "c": c}] * (nr * nc * 10)
    out = chi2_independence(
        spark.createDataFrame(pd.DataFrame(rows)), "r", "c"
    ).collect()[0]
    assert out["chi2"] == 0.0 and out["cramers_v"] == 0.0
    assert out["dof"] == 1
    assert out["n_rows"] == 250  # (2+3)*(4+1)*10 cells
    assert out["n_row_levels"] == 2 and out["n_col_levels"] == 2


def test_chi2_perfect_association(spark):
    """Diagonal table: V == 1 and chi2 == n * (k-1)."""
    rows = [{"r": k, "c": k.upper()} for k in ["a", "b", "c"] for _ in range(40)]
    out = chi2_independence(
        spark.createDataFrame(pd.DataFrame(rows)), "r", "c"
    ).collect()[0]
    assert out["cramers_v"] == 1.0
    assert out["chi2"] == pytest.approx(120 * 2, abs=1e-6)
    assert out["dof"] == 4


def test_chi2_matches_closed_form(spark):
    """2x2 table vs the textbook formula chi2 = n(ad-bc)^2 / marginals."""
    a, b, c, d = 12, 5, 7, 20
    rows = (
        [{"r": "r1", "c": "c1"}] * a
        + [{"r": "r1", "c": "c2"}] * b
        + [{"r": "r2", "c": "c1"}] * c
        + [{"r": "r2", "c": "c2"}] * d
    )
    n = a + b + c + d
    expected = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    out = chi2_independence(
        spark.createDataFrame(pd.DataFrame(rows)), "r", "c"
    ).collect()[0]
    assert out["chi2"] == pytest.approx(expected, abs=1e-6)
    assert out["cramers_v"] == pytest.approx(math.sqrt(expected / n), abs=1e-6)


def test_chi2_ignores_null_categories(spark):
    rows = [{"r": "a", "c": "x"}] * 10 + [{"r": None, "c": "x"}] * 5
    out = chi2_independence(
        spark.createDataFrame(
            pd.DataFrame(rows).astype({"r": "object"}), schema="r string, c string"
        ),
        "r",
        "c",
    ).collect()[0]
    assert out["n_rows"] == 10 and out["n_row_levels"] == 1
