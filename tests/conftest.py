import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkval.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparkval-tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@pytest.fixture(scope="session")
def corpus_pair(spark):
    """A small deterministic (baseline, snapshot, commits) corpus trio
    with known violations: 6 dups + 4 dangling commits."""
    from sparkval import fixtures as fx

    base_pd, _, commits_pd = fx.make_case("random_mid__identity", n_rows=600)
    snap_pd = fx.distort(fx.distort(base_pd, "dangle_4"), "dup_6")
    base = spark.createDataFrame(base_pd)
    snap = spark.createDataFrame(snap_pd)
    commits = spark.createDataFrame(commits_pd)
    return base, snap, commits
