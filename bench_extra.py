"""Extra benchmarks for the optimization round (bench.py is frozen).

Per-query noop-sink isolation (guide §1.4) + optional plan capture.

Usage:
    python bench_extra.py q1 q2 ...         # time the named headline queries
    python bench_extra.py --engine          # engine cold/warm/skew legs
    python bench_extra.py --explain q1 ...  # also dump explain("formatted")
    python bench_extra.py --reps N          # attempts per leg (default 2)

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from sparkval.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _steal_ticks() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    do_explain = "--explain" in args
    args = [a for a in args if not a.startswith("--")]

    spark = get_spark("sparkval-bench-extra", parallelism=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    queries = E.queries()

    # warmup identical in spirit to bench.py
    import bench
    bench.warmup(spark)

    out: dict[str, list[float]] = {}
    steal: dict[str, list[int]] = {}
    for name in args:
        fn = queries[name]
        if do_explain:
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_explain.txt", "w") as f:
                f.write(fn(spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                    fn(spark, SF_DIR)._jdf.queryExecution(), "formatted"))
        runs, st = [], []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            s0 = _steal_ticks()
            t0 = time.perf_counter()
            force(fn(spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
            st.append(_steal_ticks() - s0)
        out[name] = runs
        steal[name] = st
        spark.catalog.clearCache()
        print(json.dumps({"query": name, "runs": runs, "steal": st}), flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS,
                      "best": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
