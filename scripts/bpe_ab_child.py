#!/usr/bin/env python
"""One (cpus, engine) datapoint for the BPE learn-engine A/B: run the
text_bpe_tokens gate once to warm codegen, then report the median of
`trials` timed runs. Parent pins cores with taskset.

usage: bpe_ab_child.py <cpus> <engine> [trials] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    engine = sys.argv[2]
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ["KG_BPE_ENGINE"] = engine

    from knowledge_graph_creation_from_text_with_llms_spark import get_spark
    from knowledge_graph_creation_from_text_with_llms_spark.gate import QUERIES

    spark = get_spark(f"bpe-ab-{engine}-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    q = QUERIES["text_bpe_tokens"]
    rows = q(spark, sf_dir).count()  # warm: codegen + parquet footers
    walls = []
    for _ in range(trials):
        t0 = time.time()
        q(spark, sf_dir).count()
        walls.append(time.time() - t0)
    print(json.dumps({
        "cpus": cpus, "engine": engine, "rows": rows,
        "walls": [round(w, 3) for w in walls],
        "median": round(statistics.median(walls), 3),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
