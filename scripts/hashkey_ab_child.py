#!/usr/bin/env python
"""One (cpus, hash_doc_keys) datapoint for the two_scan doc-key A/B.

Two modes:
  stage  — build triples_linked at `replication`× the sf0.1 corpus via
           the real text path (16 cores) and write it to /dev/shm so
           every timing child reads IDENTICAL input bytes:
             hashkey_ab_child.py stage <replication> <out_dir>
  time   — read the staged table, run the nodes stage (two_scan) with
           hash_doc_keys on/off, report the median of `trials`:
             hashkey_ab_child.py time <cpus> <hash|plain> <trials> <dir>
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONF = {
    "spark.sql.shuffle.partitions": "64",
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.io.compression.codec": "zstd",
}


def _spark(name: str, cpus: int, scratch: str):
    from knowledge_graph_creation_from_text_with_llms_spark import get_spark

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = get_spark(
        name, master=f"local[{cpus}]",
        extra_conf={**CONF, "spark.local.dir": scratch},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def stage(replication: int, out_dir: str) -> None:
    import tempfile

    from knowledge_graph_creation_from_text_with_llms_spark.plans.pipeline import (
        KGPipeline, PipelineConfig,
    )
    from knowledge_graph_creation_from_text_with_llms_spark.sources.corpus import (
        documents_as_source, synthetic_scaled_source,
    )

    scratch = tempfile.mkdtemp(prefix="kgab-stage-", dir="/dev/shm")
    spark = _spark("kgab-stage", 16, scratch)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    base = documents_as_source(docs)
    source = (
        synthetic_scaled_source(spark, base, replication)
        if replication > 1 else base
    ).repartition(64)
    pipe = KGPipeline(spark, None, PipelineConfig())
    chunks = pipe.stage_chunks(source)
    raw = pipe.stage_responses(chunks)
    triples = pipe.stage_triples_raw(raw)
    linked = pipe.stage_triples_linked(triples)
    linked.write.mode("overwrite").parquet(out_dir)
    n = spark.read.parquet(out_dir).count()
    print(json.dumps({"staged": out_dir, "rows": n}), flush=True)
    spark.stop()


def time_one(cpus: int, variant: str, trials: int, in_dir: str) -> None:
    import tempfile

    from pyspark.sql import functions as F

    from knowledge_graph_creation_from_text_with_llms_spark.operators import (
        canonicalizer,
    )

    scratch = tempfile.mkdtemp(prefix=f"kgab-{variant}-{cpus}-", dir="/dev/shm")
    spark = _spark(f"kgab-{variant}-{cpus}", cpus, scratch)
    linked = spark.read.parquet(in_dir)
    mentions = linked.select(
        F.col("subj").alias("label"), "doc_id"
    ).unionAll(
        linked.where(~F.col("is_literal")).select(
            F.col("obj").alias("label"), "doc_id"
        )
    )
    hash_keys = variant == "hash"
    # warm: parquet footers + codegen for this exact plan
    canonicalizer.salted_mention_counts(
        mentions, hash_doc_keys=hash_keys
    ).count()
    walls = []
    for _ in range(trials):
        t0 = time.time()
        rows = canonicalizer.salted_mention_counts(
            mentions, hash_doc_keys=hash_keys
        ).count()
        walls.append(time.time() - t0)
    print(json.dumps({
        "cpus": cpus, "variant": variant, "rows": rows,
        "walls": [round(w, 2) for w in walls],
        "median": round(statistics.median(walls), 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "stage":
        stage(int(sys.argv[2]), sys.argv[3])
    else:
        time_one(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), sys.argv[5])
