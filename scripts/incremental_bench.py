#!/usr/bin/env python
"""Measure the incremental-index advantage: full batch near-dup run vs
a small delta probing the prebuilt snapshot index, at sf0.1.

This is the number that matters for a growing 100 TB corpus: the batch
cost is paid once to build the index; every subsequent delta pays only
the probe. Prints one JSON line; paste the numbers into
BENCH/BASELINE.md's incremental section.

usage: [SPARK_GRAFT_SF_DIR=...] python scripts/incremental_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from knowledge_graph_creation_from_text_with_llms_spark import get_spark  # noqa: E402
from knowledge_graph_creation_from_text_with_llms_spark.operators import dedup  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("incremental-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm

    # 2% of the corpus arrives as the delta
    prior = docs.where(F.col("doc_id") % 50 != 0)
    delta = docs.where(F.col("doc_id") % 50 == 0)
    n_prior, n_delta = prior.count(), delta.count()

    t0 = time.time()
    full_pairs = dedup.ngram_jaccard_pairs(
        docs, block_col="source", threshold=0.3
    ).count()
    t_full = time.time() - t0

    t0 = time.time()
    posting, shingles, dfreq = (
        df.localCheckpoint(eager=True)
        for df in dedup.ngram_index(prior, "source")
    )
    t_index = time.time() - t0

    t0 = time.time()
    inc_pairs, _, _, _ = dedup.ngram_jaccard_pairs_incremental(
        delta, posting, shingles, dfreq, "source", threshold=0.3
    )
    inc_n = inc_pairs.count()
    t_probe = time.time() - t0

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_prior": n_prior,
                "n_delta": n_delta,
                "batch_full_sec": round(t_full, 2),
                "index_build_sec": round(t_index, 2),
                "delta_probe_sec": round(t_probe, 2),
                "probe_speedup_vs_full": round(t_full / max(t_probe, 1e-9), 1),
                "full_pairs": full_pairs,
                "delta_touching_pairs": inc_n,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
