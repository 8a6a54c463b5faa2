#!/usr/bin/env python
"""One engine-A/B datapoint: the chunk and extract stages at a given
core count with a given engine pair, fresh JVM, snapshots on tmpfs.

usage: engine_ab_child.py <cpus> <engine expr|pandas> <replication> [sf_dir]
prints one JSON line {cpus, engine, chunks_wall, responses_wall, rows}

Exists to settle the round-4 question the eighth scaling campaign
raised: the JVM expression twins (chunk_array_expr / response_expr)
scale like codegen but showed 2-5x the per-byte cost of the
Arrow-batched pandas UDFs at campaign scale — a cross-window reading
that needs an interleaved same-window A/B before flipping defaults.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    engine = sys.argv[2]
    replication = int(sys.argv[3])
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    assert engine in ("expr", "pandas")
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ["KG_CHUNK_ENGINE"] = engine
    os.environ["KG_EXTRACT_ENGINE"] = engine

    from knowledge_graph_creation_from_text_with_llms_spark import get_spark
    from knowledge_graph_creation_from_text_with_llms_spark.operators import chunker
    from knowledge_graph_creation_from_text_with_llms_spark.operators.extractor import (
        RuleBasedBackend,
        extract_responses,
        extract_responses_expr,
    )
    from knowledge_graph_creation_from_text_with_llms_spark.sources.corpus import (
        documents_as_source,
        synthetic_scaled_source,
    )

    scratch = tempfile.mkdtemp(prefix="kgab-local-", dir="/dev/shm")
    spark = get_spark(
        f"kg-engine-ab-{engine}-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.local.dir": scratch,
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.parquet.compression.codec": "zstd",
            "spark.io.compression.codec": "zstd",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = documents_as_source(docs)
    source = (
        synthetic_scaled_source(spark, base, replication)
        if replication > 1
        else base
    ).repartition(64)
    staged = tempfile.mkdtemp(prefix=f"kgab-src-{cpus}-", dir="/dev/shm")
    out_c = tempfile.mkdtemp(prefix=f"kgab-chunks-{cpus}-", dir="/dev/shm")
    out_r = tempfile.mkdtemp(prefix=f"kgab-resp-{cpus}-", dir="/dev/shm")
    try:
        source.write.mode("overwrite").parquet(staged)
        src = spark.read.parquet(staged)
        rows = src.count()

        chunks = chunker.chunk_documents(src, 120, "word", engine=engine)
        t0 = time.time()
        chunks.write.mode("overwrite").parquet(out_c)
        chunks_wall = time.time() - t0

        chunks_in = spark.read.parquet(out_c)
        resp = (
            extract_responses_expr(chunks_in)
            if engine == "expr"
            else extract_responses(chunks_in, RuleBasedBackend)
        )
        t0 = time.time()
        resp.write.mode("overwrite").parquet(out_r)
        responses_wall = time.time() - t0
        n_resp = spark.read.parquet(out_r).count()
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(out_c, ignore_errors=True)
        shutil.rmtree(out_r, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "engine": engine,
                "rows": rows,
                "responses": n_resp,
                "chunks_wall": round(chunks_wall, 2),
                "responses_wall": round(responses_wall, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
