#!/usr/bin/env python
"""Stage-by-stage wall breakdown of dedup_ngram_jaccard at sf0.1 —
round-5 verdict item: localize whether shingling (map) or the
prefix-posting join dominates the ~10 s gate before touching the
operator. Each stage is timed CUMULATIVELY (count() up to that point
in the plan) so stage cost = delta between consecutive rows; Spark
re-runs the prefix from scratch each time, which is exactly what makes
the deltas attributable.

usage: ngram_breakdown.py [sf_dir] [cpus]
Prints one JSON line with the cumulative walls and the deltas.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "16"
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from knowledge_graph_creation_from_text_with_llms_spark import get_spark
    from knowledge_graph_creation_from_text_with_llms_spark.functions.text import (
        word_shingles_expr,
    )
    from knowledge_graph_creation_from_text_with_llms_spark.gate import QUERIES, _docs

    spark = get_spark("ngram-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    docs = _docs(spark, sf_dir)
    # mirror the gate's inputs: block on language, same threshold
    block_col, id_col, text_col, shingle_n, threshold = (
        "source", "doc_id", "text", 3, 0.3)

    sh = docs.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col),
        F.array_distinct(word_shingles_expr(text_col, shingle_n)).alias("_sh"),
    ).where(F.size("_sh") > 0)
    inv = sh.select(
        "_blk", F.col(id_col), F.size("_sh").alias("_n"),
        F.explode("_sh").alias("_g"),
    )
    dfreq = inv.groupBy("_blk", "_g").agg(F.count(F.lit(1)).alias("_df"))
    w_rank = Window.partitionBy("_blk", id_col).orderBy("_df", "_g")
    ranked = inv.join(dfreq, ["_blk", "_g"]).select(
        "_blk", F.col(id_col), "_g",
        F.row_number().over(w_rank).alias("_r"), "_n",
    )
    prefix_len = F.col("_n") - F.ceil(
        F.lit(threshold) * F.col("_n") - F.lit(1e-9)) + F.lit(1)
    prefix = ranked.where(F.col("_r") <= prefix_len)
    a = prefix.select("_blk", F.col(id_col).alias("id_a"), "_g")
    b = prefix.select("_blk", F.col(id_col).alias("id_b"), "_g")
    cand = (
        a.join(b, ["_blk", "_g"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    out: dict = {"sf_dir": sf_dir, "cpus": cpus, "cum": {}, "counts": {}}

    def step(name: str, df) -> None:
        t0 = time.time()
        out["counts"][name] = df.count()
        out["cum"][name] = round(time.time() - t0, 3)

    # warm the JVM/parquet footer cache once so deltas are stage cost
    docs.count()
    step("1_shingle", sh)
    step("2_dfreq", dfreq)
    step("3_ranked_prefix", prefix)
    step("4_candidates", cand)
    t0 = time.time()
    full = QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
    out["counts"]["5_full_gate"] = full.count()
    out["cum"]["5_full_gate"] = round(time.time() - t0, 3)
    cum = out["cum"]
    out["delta"] = {
        "shingle": cum["1_shingle"],
        "dfreq_agg": round(cum["2_dfreq"] - cum["1_shingle"], 3),
        "rank_join_window": round(cum["3_ranked_prefix"] - cum["2_dfreq"], 3),
        "cand_selfjoin_distinct": round(
            cum["4_candidates"] - cum["3_ranked_prefix"], 3),
        "verify_vs_cand": round(cum["5_full_gate"] - cum["4_candidates"], 3),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
