"""Memory evidence for the scaling case (round-2 verdict #3):

1. STREAM-like memory-bandwidth microbenchmark: K concurrent processes
   each running a numpy triad over arrays far larger than LLC; the
   aggregate GB/s vs K curve shows where this box's shared memory bus
   saturates — the number behind the "two scans share one bus"
   explanation of the cold-leg scaling gap.
2. Per-parallelism peak-RSS of the warm validate leg via
   /usr/bin/time -v (the reference's strip_vs_full_mem_*.tsv analog),
   plus strip-mode vs full-mode RSS at local[32].

Usage:
  python tools/membench.py bandwidth          # part 1 (no Spark)
  python tools/membench.py rss                # part 2 (runs Spark legs)
Results are recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# part 1: aggregate bandwidth vs process count
# ---------------------------------------------------------------------------

_TRIAD = r"""
import numpy as np, time, sys
n = 32 * 1024 * 1024          # 256 MB per array, 3 arrays
a = np.ones(n); b = np.full(n, 2.0); c = np.zeros(n)
# warm
c[:] = a + 2.0 * b
reps = 6
t0 = time.perf_counter()
for _ in range(reps):
    c[:] = a + 2.0 * b        # triad: 3 arrays touched per rep
dt = time.perf_counter() - t0
print((3 * 8 * n * reps / dt) / 1e9)
"""


def bandwidth() -> dict:
    out = {}
    for k in (1, 2, 4, 8, 16, 32):
        procs = [
            subprocess.Popen([sys.executable, "-c", _TRIAD],
                             stdout=subprocess.PIPE, text=True)
            for _ in range(k)
        ]
        per = [float(p.communicate()[0].strip()) for p in procs]
        out[k] = {"aggregate_gbs": round(sum(per), 1),
                  "per_proc_gbs": round(sum(per) / k, 1)}
    return out


# ---------------------------------------------------------------------------
# part 2: peak RSS per leg
# ---------------------------------------------------------------------------

_PREP = r"""
import sys, bench
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparkval.session import get_spark
from sparkval import ValidationConfig, ValidationEngine
spark = get_spark("mem-prep", parallelism=8)
spark.sparkContext.setLogLevel("ERROR")
v = bench.corpus_from_lineitem(spark, bench.SF_DIR).repartition(256)
v.write.mode("overwrite").parquet({tmp!r} + "/corpus.parquet")
v.withColumn("content", F.translate("content", "0123", "89AB")).write.mode(
    "overwrite").parquet({tmp!r} + "/snapshot.parquet")
eng = ValidationEngine(ValidationConfig(short_circuit_identical=False))
eng.build_baseline(spark.read.parquet({tmp!r} + "/corpus.parquet")).write.mode(
    "overwrite").parquet({tmp!r} + "/baseline.parquet")
spark.stop()
"""

_LEG = r"""
import sys, time
sys.path.insert(0, {repo!r})
from sparkval.session import get_spark
from sparkval import ValidationConfig, ValidationEngine
spark = get_spark("mem-leg", parallelism={cpus}, shuffle_partitions=max({cpus}, 8))
spark.sparkContext.setLogLevel("ERROR")
eng = ValidationEngine(ValidationConfig(short_circuit_identical=False))
base = spark.read.parquet({tmp!r} + "/baseline.parquet")
t0 = time.perf_counter()
if {strips}:
    out = eng.validate_strips({tmp!r} + "/snapshot.parquet", base,
                              {tmp!r} + "/ck_{cpus}_{strips}", n_strips=16)
    out["verdicts"].write.format("noop").mode("overwrite").save()
else:
    snap = spark.read.parquet({tmp!r} + "/snapshot.parquet")
    out = eng.validate(snap, base)
    out["verdicts"].write.format("noop").mode("overwrite").save()
    out["violations"].write.format("noop").mode("overwrite").save()
print("LEG_SEC", time.perf_counter() - t0)
spark.stop()
"""


def _tree_rss_kib(root_pid: int) -> int:
    """Sum of VmRSS over root_pid and all its descendants (KiB)."""
    ppid_of, rss_of = {}, {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/status") as f:
                ppid = rss = 0
                for line in f:
                    if line.startswith("PPid:"):
                        ppid = int(line.split()[1])
                    elif line.startswith("VmRSS:"):
                        rss = int(line.split()[1])
        except OSError:
            continue
        ppid_of[int(d)] = ppid
        rss_of[int(d)] = rss
    total, frontier = 0, {root_pid}
    while frontier:
        nxt = set()
        for pid, pp in ppid_of.items():
            if pp in frontier:
                nxt.add(pid)
        for pid in frontier:
            total += rss_of.get(pid, 0)
        frontier = nxt
    return total


def _run_timed(script: str) -> tuple[int, float]:
    """Run a python script, polling the whole process tree's resident
    set every 0.3 s (no /usr/bin/time in this container); return
    (peak_tree_rss_kib, leg_sec). Peak is the max over samples of the
    SUM of VmRSS across the tree — the honest 'memory in use' figure
    (a per-process VmHWM would hide the JVM + N python workers adding
    up)."""
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(script)
        path = f.name
    try:
        p = subprocess.Popen([sys.executable, path], cwd=REPO,
                             stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                             text=True)
        peak = 0
        while p.poll() is None:
            peak = max(peak, _tree_rss_kib(p.pid))
            time.sleep(0.3)
        sec = -1.0
        for line in (p.communicate()[0] or "").splitlines():
            if line.startswith("LEG_SEC"):
                sec = float(line.split()[-1])
        return peak, sec
    finally:
        os.unlink(path)


def rss() -> dict:
    tmp = tempfile.mkdtemp(prefix="sparkval_mem_")
    subprocess.run([sys.executable, "-c", _PREP.format(repo=REPO, tmp=tmp)],
                   cwd=REPO, check=True, capture_output=True, timeout=900)
    out = {}
    for cpus in (2, 8, 32):
        r, s = _run_timed(_LEG.format(repo=REPO, tmp=tmp, cpus=cpus, strips=0))
        out[f"validate_local{cpus}"] = {"max_rss_gib": round(r / 2**20, 2),
                                        "leg_sec": round(s, 2)}
    r, s = _run_timed(_LEG.format(repo=REPO, tmp=tmp, cpus=32, strips=1))
    out["validate_strips_local32"] = {"max_rss_gib": round(r / 2**20, 2),
                                      "leg_sec": round(s, 2)}
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "bandwidth"
    t0 = time.time()
    res = bandwidth() if mode == "bandwidth" else rss()
    print(json.dumps({"mode": mode, "elapsed_sec": round(time.time() - t0, 1),
                      "results": res}))


if __name__ == "__main__":
    raise SystemExit(main())
