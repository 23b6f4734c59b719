"""N vs 4N scaling evidence (north rule: efficiency >= 0.8).

Runs bench.py twice on identical input — local[8] then local[32] —
in fresh subprocesses (clean JVMs), computes throughput scaling
efficiency, and appends a results table to BENCH.md.

Efficiency definition: with T_N and T_4N the engine-leg wall times at
parallelism N and 4N, speedup S = T_N / T_4N and efficiency
E = S / 4 (perfect linear scaling -> 1.0). We also report it for
total headline-query time. Single-machine caveat: both runs share one
memory bus; on a real cluster 4N executors add memory bandwidth too,
so this is the conservative bound.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n, four_n = 8, 32
    r_n = run_bench(n)
    r_4n = run_bench(four_n)

    def eff(t_n: float, t_4n: float) -> tuple[float, float]:
        s = t_n / t_4n
        return s, s / (four_n / n)

    eng_n = r_n["queries"]["engine_validate_lineitem_corpus"]
    eng_4n = r_4n["queries"]["engine_validate_lineitem_corpus"]
    s_eng, e_eng = eff(eng_n, eng_4n)
    s_tot, e_tot = eff(r_n["value"], r_4n["value"])

    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    block = f"""
## Scaling run {stamp} (sf={r_n['sf']}, identical input)

| leg | local[{n}] | local[{four_n}] | speedup | efficiency (S/4) |
|---|---|---|---|---|
| engine validate (wall s) | {eng_n:.2f} | {eng_4n:.2f} | {s_eng:.2f}x | {e_eng:.2f} |
| engine files/sec | {r_n['engine_files_per_sec']:.0f} | {r_4n['engine_files_per_sec']:.0f} | — | — |
| all headline queries (s) | {r_n['value']:.2f} | {r_4n['value']:.2f} | {s_tot:.2f}x | {e_tot:.2f} |

Raw local[{n}]: `{json.dumps(r_n)}`

Raw local[{four_n}]: `{json.dumps(r_4n)}`
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(block)
    print(block)


if __name__ == "__main__":
    main()
