#!/usr/bin/env python
"""Substrate calibration probes: what scaling efficiency CAN this box
show between two pinned CPU counts, independent of the engine?

Three probes, each a minimal Spark job dominated by one resource:
  codegen — pure whole-stage-codegen arithmetic over spark.range
            (no shuffle, no Python): upper bound for CPU-bound stages.
  shuffle — range → repartition(hash) → groupBy sum: bound for
            shuffle-heavy stages.
  python  — a trivial pandas UDF over the same range: bound for
            Arrow/worker stages.

Run as child per (probe, cpus) with a fresh pinned JVM, paired N/4N
ordering like scaling_run.py. Interpreting results: if the engine's
measured pipeline efficiency ≈ the codegen/shuffle probe ceilings,
the gap to 1.0 is the substrate (shared memory bandwidth, turbo-clock
skew between 2 and 8 active cores), not the plan shape.

usage: substrate_probe.py            # run all probes, print JSON
       substrate_probe.py child <probe> <cpus>   # internal
"""

import json
import os
import subprocess
import sys
import time

import pandas as pd  # noqa: F401 — resolvable type hints for the probe UDF

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

ROWS = {"codegen": 10_000_000_000, "shuffle": 400_000_000, "python": 80_000_000}


def child(probe: str, cpus: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"probe-{probe}")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n = ROWS[probe]
    df = spark.range(0, n, 1, cpus * 4)
    t0 = time.time()
    if probe == "codegen":
        df.select(
            (F.col("id") * 3 + 1).alias("a"),
            F.pow(F.col("id") % 97, 0.5).alias("b"),
        ).agg(F.sum(F.col("a") % 1000 + F.col("b"))).collect()
    elif probe == "shuffle":
        df.groupBy((F.col("id") % 1_000_000).alias("k")).agg(
            F.sum("id").alias("s")
        ).agg(F.sum("s")).collect()
    elif probe == "python":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def f(x: pd.Series) -> pd.Series:
            return x * 1.5 + 1.0

        df.select(F.sum(f(F.col("id")))).collect()
    wall = time.time() - t0
    print(json.dumps({"probe": probe, "cpus": cpus, "wall": round(wall, 2)}))
    spark.stop()


def run(probe: str, cpus: int) -> float:
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}", sys.executable,
        os.path.abspath(__file__), "child", probe, str(cpus),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["wall"]


def main() -> None:
    n_lo = int(os.environ.get("KG_SCALE_N", "2"))
    n_hi = 4 * n_lo
    pairs = int(os.environ.get("KG_SCALE_TRIALS", "2"))
    out = {}
    for probe in ("codegen", "shuffle", "python"):
        effs = []
        walls = []
        for i in range(pairs):
            order = (n_lo, n_hi) if i % 2 == 0 else (n_hi, n_lo)
            w = {c: run(probe, c) for c in order}
            effs.append((w[n_lo] / w[n_hi]) / (n_hi / n_lo))
            walls.append(w)
        effs.sort()
        out[probe] = {
            "pair_efficiencies": [round(e, 3) for e in effs],
            "median": round(effs[len(effs) // 2], 3),
            "walls": walls,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2], int(sys.argv[3]))
    else:
        main()
