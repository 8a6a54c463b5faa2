#!/usr/bin/env python
"""Two-parallelism scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; in this sandbox N=local[8]
vs 4N=local[32] on identical input — see BASELINE.md).

Runs scaling_child.py in fresh subprocesses (one JVM each), computes
  efficiency = (thr_4N / thr_N) / 4
and rewrites the measured section of BENCH/BASELINE.md.

usage: scaling_run.py [replication] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_child_median(cpus: int, replication: int, sf_dir: str, trials: int) -> dict:
    """Median-of-N wall time (this VM's I/O + neighbor variance is
    ±30% between identical runs — single samples are meaningless)."""
    runs = [run_child(cpus, replication, sf_dir) for _ in range(trials)]
    runs.sort(key=lambda r: r["wall_sec"])
    med = runs[len(runs) // 2]
    med["all_walls"] = [r["wall_sec"] for r in runs]
    return med


def run_child(cpus: int, replication: int, sf_dir: str) -> dict:
    # pin the process to exactly `cpus` logical CPUs: without this
    # the low-parallelism run borrows the whole machine for JVM GC/JIT
    # helper threads and python workers, overstating its throughput
    # (an N-core executor on a real cluster has N cores, full stop)
    cmd = ["taskset", "-c", f"0-{cpus - 1}",
           sys.executable, os.path.join(HERE, "scaling_child.py"),
           str(cpus), str(replication), sf_dir]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=REPO)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    n_lo = int(os.environ.get("KG_SCALE_N", "2"))
    trials = int(os.environ.get("KG_SCALE_TRIALS", "3"))
    n_hi = 4 * n_lo
    lo = run_child_median(n_lo, replication, sf_dir, trials)
    hi = run_child_median(n_hi, replication, sf_dir, trials)
    eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / 4.0
    result = {
        "sf_dir": sf_dir,
        "replication": replication,
        "rows_in": lo["rows_in"],
        "n": lo,
        "four_n": hi,
        "scaling_efficiency": round(eff, 3),
        "meets_target": eff >= 0.8,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w", encoding="utf-8") as f:
        f.write(_render(result))


def _render(r: dict) -> str:
    lo, hi = r["n"], r["four_n"]
    return f"""# BENCH/BASELINE — measured numbers for the rebuild

Scaling evidence for the north_rule criterion (N → 4N executors,
throughput scaling efficiency >= 0.8). No real cluster exists in this
sandbox, so per BASELINE.md the same job runs at two parallelism
levels — `local[{r["n"]["cpus"]}]` (N) and `local[{r["four_n"]["cpus"]}]` (4N) — on byte-identical
input (same staged parquet, same 64-way split plan, fresh JVM per
run via scripts/scaling_run.py).

**Workload**: full KG pipeline (chunk → extract → parse → link →
canonicalize → edges/adjacency, snapshot commits included) over the
sf0.1 documents corpus replicated ×{r['replication']}
({r['rows_in']:,} input docs) so compute dominates fixed JVM/driver
overhead.

| parallelism | wall (s) | triples emitted | triples/sec |
|---|---|---|---|
| local[{lo["cpus"]}]  (N)  | {lo['wall_sec']} | {lo['triples']:,} | {lo['triples_per_sec']:,} |
| local[{hi["cpus"]}] (4N) | {hi['wall_sec']} | {hi['triples']:,} | {hi['triples_per_sec']:,} |

**Scaling efficiency (thr_4N / thr_N) / 4 = {r['scaling_efficiency']}**
(target >= 0.8: {"MET" if r['meets_target'] else "NOT MET"}).

Measured {r['measured_at']} on the sandbox host (single JVM,
local mode; cores are the parallelism lever). Reproduce with:

    python scripts/scaling_run.py {r['replication']}

Per-round operator timings land in BENCH_r{{N}}.json via bench.py.
"""


if __name__ == "__main__":
    main()
