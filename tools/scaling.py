"""N vs 4N scaling evidence (north rule: efficiency >= 0.8).

Runs bench.py on identical input at local[8] and local[32] in fresh
subprocesses (clean JVMs), ALTERNATING legs best-of-3, and appends a
results table to BENCH.md.

Methodology notes:
- This sandbox is a shared VM: host CPU-steal bursts add minutes of
  wall time to an unlucky run (observed: identical 32-core jobs at
  4.9 s and 17.4 s, tracking /proc/stat steal). Legs therefore
  alternate (8, 32, 8, 32, ...) so drifting host load cannot bias one
  side, each leg reports its steal ticks, and the min of 3 runs is
  used — the closest observable to the uncontended machine.
- Efficiency: with T_N and T_4N the engine-leg wall times at
  parallelism N and 4N, speedup S = T_N / T_4N, efficiency E = S / 4
  (perfect linear scaling -> 1.0). Single-machine caveat: both runs
  share one memory bus; on a real cluster 4N executors add memory
  bandwidth too, so this is the conservative bound.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))


RUNS_LOG = os.path.join(REPO, "BENCH_runs.jsonl")


def run_bench(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        # heavier corpus for the scaling legs: amortizes fixed stage
        # latency so the compute term dominates (what 100 TB looks like)
        SPARK_GRAFT_BENCH_REPEAT=os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "96"),
        SPARK_GRAFT_ENGINE_REPS="1",
        # engine legs are the scaling evidence; skip the headline
        # query sweep (it triples sweep wall time at local[2])
        SPARK_GRAFT_BENCH_ENGINE_ONLY="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    with open(RUNS_LOG, "a") as f:  # crash-proof: every run lands on disk
        f.write(json.dumps(r) + "\n")
    return r


def _spin(_):
    # module-level: mp.Pool pickles the callable, nested defs fail
    x = 0
    for _ in range(20_000_000):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return x


def calibrate_host(n: int, four_n: int) -> float:
    """Pure-CPU-spin scaling ceiling of THIS host for n -> 4n procs.

    The sandbox exposes 32 vCPUs that are 16 physical cores x SMT on a
    shared Firecracker host: even a zero-memory, zero-I/O spin loop
    scales 8->32 procs at only ~0.75 efficiency. The engine cannot
    out-scale the hardware; this calibration quantifies the ceiling so
    engine efficiency can be read relative to it.
    """
    import multiprocessing as mp
    import time

    rates = {}
    for procs in (n, four_n):
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(_spin, range(procs))
            rates[procs] = procs / (time.perf_counter() - t0)
    return (rates[four_n] / rates[n]) / (four_n / n)


def main() -> None:
    # override for targeted sweeps, e.g. "8,32" for the high-volume
    # 8->32 confirmation leg (3x corpus at local[2] adds ~15 min of
    # wall per run for no extra evidence)
    levels = tuple(
        int(c)
        for c in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "2,8,32").split(",")
    )
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    for i in range(RUNS):
        for cpus in levels:
            r = run_bench(cpus)
            runs[cpus].append(r)
            print(
                f"run {i + 1}/{RUNS} local[{cpus}]: engine "
                f"{r['queries']['engine_validate_lineitem_corpus']}s "
                f"({r['engine_files_per_sec']} files/s, steal {r.get('host_steal_ticks')})",
                flush=True,
            )

    def best(cpus: int) -> dict:
        return min(
            runs[cpus], key=lambda r: r["queries"]["engine_validate_lineitem_corpus"]
        )

    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    all_eng = {
        c: [r["queries"]["engine_validate_lineitem_corpus"] for r in runs[c]]
        for c in levels
    }
    all_steal = {c: [r.get("host_steal_ticks") for r in runs[c]] for c in levels}

    def best_warm(cpus: int) -> dict:
        return min(
            runs[cpus],
            key=lambda r: r["queries"].get("engine_validate_warm_baseline", 1e9),
        )

    lines = []
    warm_lines = []
    pairs = [(a, b) for a, b in zip(levels, levels[1:]) if b == 4 * a]
    for n, four_n in pairs:
        ceiling = calibrate_host(n, four_n)
        r_n, r_4n = best(n), best(four_n)
        t_n = r_n["queries"]["engine_validate_lineitem_corpus"]
        t_4n = r_4n["queries"]["engine_validate_lineitem_corpus"]
        s = t_n / t_4n
        e = s / (four_n / n)
        lines.append(
            f"| {n} -> {four_n} | {t_n:.2f} s ({r_n['engine_files_per_sec']:.0f} f/s) "
            f"| {t_4n:.2f} s ({r_4n['engine_files_per_sec']:.0f} f/s) "
            f"| {s:.2f}x | {e:.2f} | {ceiling:.2f} | {min(e / ceiling, 1.0):.2f} |"
        )
        w_n, w_4n = best_warm(n), best_warm(four_n)
        tw_n = w_n["queries"].get("engine_validate_warm_baseline")
        tw_4n = w_4n["queries"].get("engine_validate_warm_baseline")
        if tw_n and tw_4n:
            sw = tw_n / tw_4n
            ew = sw / (four_n / n)
            warm_lines.append(
                f"| {n} -> {four_n} | {tw_n:.2f} s ({w_n['engine_warm_files_per_sec']:.0f} f/s) "
                f"| {tw_4n:.2f} s ({w_4n['engine_warm_files_per_sec']:.0f} f/s) "
                f"| {sw:.2f}x | {ew:.2f} | {ceiling:.2f} | {min(ew / ceiling, 1.0):.2f} |"
            )

    block = f"""
## Scaling run {stamp} (sf={best(levels[0])['sf']}, identical input, best of {RUNS} alternating runs)

Engine-validate leg (baseline build + full validate over the 600k-file
lineitem-derived corpus), N vs 4N parallelism on the same input:

| N -> 4N | T_N | T_4N | speedup | efficiency (S/4) | host ceiling* | normalized |
|---|---|---|---|---|---|---|
{chr(10).join(lines)}

Warm leg (steady-state production shape: baseline persisted once,
timed run = validate snapshot against it — what every validation
after the first costs at 100 TB):

| N -> 4N | T_N | T_4N | speedup | efficiency (S/4) | host ceiling* | normalized |
|---|---|---|---|---|---|---|
{chr(10).join(warm_lines)}

*host ceiling = measured pure-CPU-spin scaling efficiency of this
shared 16-physical-core/32-SMT-vCPU sandbox VM for the same N -> 4N —
the hardware bound no job can exceed here. "normalized" =
engine efficiency / ceiling: 1.0 means the engine adds no scaling
losses of its own (on a real cluster, 4N executors bring 4x memory
bandwidth and cores, which this single box cannot emulate).

Engine-leg samples (s): {all_eng}
Host steal ticks per run: {all_steal}
(shared-VM sandbox: steal bursts explain outlier samples; min-of-{RUNS} used).

Raw best per level:
{chr(10).join(f"- local[{c}]: `{json.dumps(best(c))}`" for c in levels)}
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(block)
    print(block)


if __name__ == "__main__":
    main()
