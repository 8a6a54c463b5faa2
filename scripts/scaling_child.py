#!/usr/bin/env python
"""One scaling-run datapoint: the full KG pipeline at a given core
count. Invoked as a subprocess by scaling_run.py (a fresh JVM per
datapoint keeps the two measurements independent).

usage: scaling_child.py <cpus> <replication> [sf_dir]
prints one JSON line {cpus, wall_sec, triples, triples_per_sec, rows_in}
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
    replication = int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    from knowledge_graph_creation_from_text_with_llms_spark import get_spark
    from knowledge_graph_creation_from_text_with_llms_spark.plans.pipeline import (
        KGPipeline,
        PipelineConfig,
    )
    from knowledge_graph_creation_from_text_with_llms_spark.sources.catalog import (
        ParquetCatalog,
    )
    from knowledge_graph_creation_from_text_with_llms_spark.sources.corpus import (
        documents_as_source,
        synthetic_scaled_source,
    )

    # partition count sized for the larger parallelism level so both
    # runs execute the identical plan on identical input splits.
    # Snapshots + shuffle spill go to tmpfs: the sandbox's virtual disk
    # has high-variance bandwidth that would otherwise dominate both
    # measurements (a real cluster has per-executor local disks and an
    # object store — per-node bandwidth scales WITH the node count,
    # unlike this single shared /dev/vda).
    scratch = tempfile.mkdtemp(prefix="kgscale-local-", dir="/dev/shm")
    spark = get_spark(
        f"kg-scaling-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.local.dir": scratch,
            # the staged corpus is a few hundred MB — the default 128MB
            # split size would give the map stages fewer input
            # partitions than cores, serializing the UDF stages
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            # zstd trades CPU (which scales with cores) for bytes
            # (whose bandwidth is fixed on this shared box): parquet
            # snapshots and shuffle blocks both shrink ~2x
            "spark.sql.parquet.compression.codec": os.environ.get(
                "KG_SCALE_CODEC", "zstd"
            ),
            "spark.io.compression.codec": os.environ.get(
                "KG_SCALE_IO_CODEC", "zstd"
            ),
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
    rows_in = source.count()
    # materialize the input once so generation cost is excluded
    staged = tempfile.mkdtemp(prefix=f"kgscale-src-{cpus}-", dir="/dev/shm")
    workdir = tempfile.mkdtemp(prefix=f"kgscale-{cpus}-", dir="/dev/shm")
    try:
        source.write.mode("overwrite").parquet(staged)
        src = spark.read.parquet(staged)
        cat = ParquetCatalog(workdir, spark)
        pipe = KGPipeline(spark, cat, PipelineConfig(chunk_size=120, chunk_unit="word"))
        t0 = time.time()
        counts = pipe.run(src, resume=False)
        wall = time.time() - t0
        triples = counts["triples_raw"]
        stage_walls = {
            m["stage"]: m["wall_sec"] for m in cat.manifest()
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_sec": round(wall, 2),
                "triples": triples,
                "rows_in": rows_in,
                "triples_per_sec": round(triples / wall, 1),
                "stage_walls": stage_walls,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
