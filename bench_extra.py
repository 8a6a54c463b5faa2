#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is frozen for measurement).

Times individual gate queries with the noop sink under the same session
config bench.py uses, and optionally dumps .explain("formatted") to
plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py q1 q2 ...            # time listed queries
  python bench_extra.py --all                # every bench.py query
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...
Options:
  --trials N     timed repeats per query (default 3, median reported)
  --explain TAG  dump plans to plans/r06/<query>_<TAG>.txt (no timing)
  --json PATH    append one JSON line with the results
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG")
    ap.add_argument("--json", default=None)
    ap.add_argument("--build-index", action="store_true",
                    help="time warm_incremental_indexes as its own entry")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from knowledge_graph_creation_from_text_with_llms_spark import gate, get_spark

    scratch = tempfile.mkdtemp(
        prefix="kgbenchx-scratch-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    cpus_used = min(int(cpus), 16)
    spark = get_spark(
        "kg-bench-extra",
        master=f"local[{cpus_used}]",
        extra_conf={
            "spark.sql.parquet.compression.codec": "zstd",
            "spark.io.compression.codec": "zstd",
            "spark.local.dir": scratch,
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = list(args.queries)
    if args.all:
        names = [n for n in gate.QUERIES]

    def _median(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

    if args.explain:
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = gate.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{args.explain}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}")
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)
        return

    # warm the JVM/codegen once (same as bench.py)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict = {}
    spreads: dict = {}
    if args.build_index:
        secs = []
        for _ in range(args.trials):
            gate.clear_incremental_index_cache()
            t0 = time.time()
            gate.warm_incremental_indexes(spark, sf_dir)
            secs.append(time.time() - t0)
        timings["dedup_incremental_index_build"] = round(_median(secs), 3)
        spreads["dedup_incremental_index_build"] = [round(s, 3) for s in secs]
        print(f"dedup_incremental_index_build: {timings['dedup_incremental_index_build']}  {spreads['dedup_incremental_index_build']}", flush=True)

    for name in names:
        fn = gate.QUERIES[name]
        spark.sparkContext.setJobDescription(f"benchx:{name}")
        secs = []
        for _ in range(args.trials):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            secs.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(_median(secs), 3)
        spreads[name] = [round(s, 3) for s in secs]
        print(f"{name}: {timings[name]}  {spreads[name]}", flush=True)

    out = {"sf_dir": sf_dir, "trials": args.trials, "queries": timings,
           "spread": spreads, "total": round(sum(timings.values()), 3)}
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(out) + "\n")
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
