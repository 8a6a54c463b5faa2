#!/usr/bin/env python
"""Interleaved same-window A/B of the chunk/extract engine pairs
(JVM expression twins vs Arrow-batched pandas UDFs) at two pinned
parallelism levels. Writes one JSON line per datapoint and a summary.

usage: engine_ab.py [replication] [trials]

Order within a trial alternates engine first/second so first-order
window drift cancels; cores run low-then-high inside each engine so
the engine comparison at a given core count is as close in time as
the runs allow (~2-4 min apart).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_child(cpus: int, engine: str, replication: int) -> dict:
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}", sys.executable,
        os.path.join(HERE, "engine_ab_child.py"),
        str(cpus), engine, str(replication),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=REPO)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    got = json.loads(line)
    print(json.dumps(got), flush=True)
    return got


def main() -> None:
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    results: list[dict] = []
    for t in range(trials):
        engines = ("expr", "pandas") if t % 2 == 0 else ("pandas", "expr")
        for engine in engines:
            for cpus in (2, 8):
                results.append(run_child(cpus, engine, replication))

    def med(engine: str, cpus: int, key: str) -> float:
        xs = sorted(
            r[key] for r in results if r["engine"] == engine and r["cpus"] == cpus
        )
        return xs[len(xs) // 2]

    summary = {}
    for stage, key in (("chunks", "chunks_wall"), ("responses", "responses_wall")):
        row = {}
        for engine in ("expr", "pandas"):
            lo, hi = med(engine, 2, key), med(engine, 8, key)
            row[engine] = {
                "n_wall": lo,
                "four_n_wall": hi,
                "stage_scaling": round(lo / hi / 4, 3),
            }
        row["pandas_speedup_at_n"] = round(
            row["expr"]["n_wall"] / row["pandas"]["n_wall"], 2
        )
        row["pandas_speedup_at_4n"] = round(
            row["expr"]["four_n_wall"] / row["pandas"]["four_n_wall"], 2
        )
        summary[stage] = row
    print(json.dumps({"replication": replication, "summary": summary}, indent=2))


if __name__ == "__main__":
    main()
