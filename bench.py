#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...}

The KG end-to-end pipeline (chunk → extract → parse → link → edges →
adjacency, with snapshot commits) is the flagship; per-operator gate
queries are timed individually with a no-op sink so the full plan
executes without driver-side collection.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from knowledge_graph_creation_from_text_with_llms_spark import gate, get_spark
    from knowledge_graph_creation_from_text_with_llms_spark.plans.pipeline import (
        KGPipeline,
        PipelineConfig,
    )
    from knowledge_graph_creation_from_text_with_llms_spark.sources.catalog import (
        ParquetCatalog,
    )
    from knowledge_graph_creation_from_text_with_llms_spark.sources.corpus import (
        documents_as_source,
    )

    scratch = tempfile.mkdtemp(
        prefix="kgbench-scratch-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    # executor sizing: this host's JVM throughput degrades past 16
    # task threads for shuffle/allocation-heavy stages (measured:
    # total 56 s at local[16] vs 104 s at local[32] on identical
    # queries — GC + memory-bandwidth contention). Same decision as
    # capping spark.executor.cores on a real cluster; reported in the
    # output as cpus_used vs cpus requested.
    cpus_used = min(int(cpus), 16)
    spark = get_spark(
        "kg-bench",
        master=f"local[{cpus_used}]",
        extra_conf={
            # production-shaped perf settings (see BENCH/BASELINE.md):
            # zstd trades bytes for CPU; tmpfs scratch avoids the VM's
            # high-variance virtual disk; 8m splits keep small staged
            # tables as wide as the core count
            "spark.sql.parquet.compression.codec": "zstd",
            "spark.io.compression.codec": "zstd",
            "spark.local.dir": scratch,
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def _force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM/codegen once so per-query numbers measure the plans
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # Median of TRIALS timed repeats per query: this box is a shared
    # VM with ±2× run-to-run wall-clock noise (measured: the identical
    # e2e pipeline ranged 12.3–29.4 s across whole-process runs).
    # Round 1's BENCH_r01.json was single-run; methodology change is
    # documented in BENCH/BASELINE.md with both numbers.
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))

    def _median(xs: list[float]) -> float:
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

    # -- flagship: end-to-end KG pipeline with snapshot commits ----------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    source = documents_as_source(docs).repartition(cpus_used * 2)
    e2e_secs: list[float] = []
    for _ in range(trials):
        workdir = tempfile.mkdtemp(prefix="kgbench-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
        try:
            cat = ParquetCatalog(workdir, spark)
            pipe = KGPipeline(
                spark, cat, PipelineConfig(chunk_size=120, chunk_unit="word")
            )
            t0 = time.time()
            counts = pipe.run(source, resume=False)
            e2e_secs.append(time.time() - t0)
            triples = counts["triples_raw"]
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    pipeline_sec = _median(e2e_secs)
    timings["kg_pipeline_e2e"] = round(pipeline_sec, 3)
    triples_per_sec = round(triples / pipeline_sec, 1) if pipeline_sec else 0.0

    # -- per-operator gate queries ---------------------------------------
    bench_queries = [
        "kg_chunks",
        "kg_triples_raw",
        "kg_link_entities",
        "kg_canonicalize",
        "kg_edges",
        "kg_adjacency",
        "kg_parse_triples",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_embedding_neardup",
        "ann_topk_bruteforce",
        "ann_topk_ivf",
        "text_language_id",
        "text_quality",
        "text_token_counts",
        "text_fingerprints",
        "kg_topk_properties",
        "events_sessionize",
        "events_type_stats",
        # round-2 additions (appended so the r01 set stays comparable)
        "code_strip_comments",
        "code_identifiers",
        "code_license",
        "code_line_stats",
        "text_repetition",
        "pii_scrub",
        "kg_clean_html",
        "dedup_embedding_neardup_lsh",
        "corpus_filter",
        "kg_metrics_bertscore",
        "dedup_components",
        "kg_khop",
        "kg_metrics_rougel_nostem",
        "kg_triangles",
        "corpus_split",
        "text_contamination",
        "ann_topk_ivf_kmeans",
        "text_bpe_tokens",
        "kg_pagerank",
        "kg_pagerank_dangling",
        "text_length_percentiles",
        "events_funnel",
        "corpus_weighted_sample",
        "corpus_mix",
        "corpus_pack_sequences",
        "code_strip_boilerplate",
        "media_features",
        "dedup_ngram_jaccard_incremental",
        "dedup_minhash_lsh_incremental",
        "dedup_embedding_neardup_incremental",
        "events_asof_join",
        "events_retention",
        "corpus_stratified_split",
        "text_top_ngrams",
        "text_gopher_rules",
        # round-4 additions
        "events_funnel_deep",
        "events_asof_join_inner",
        "kg_viz_edges",
        # round-5 additions: the remaining registry gates, so BENCH
        # covers every queries() entry (all cheap; appended to keep
        # earlier rounds' sets prefix-comparable)
        "kg_mentions",
        "kg_graph_stats",
        "kg_metrics_strict",
        "kg_metrics_relaxed",
        "kg_metrics_rouge1",
        "kg_metrics_rougel",
        "corpus_sample",
        "events_json_props",
        "events_user_gaps",
        # round-5 additions: the span-level dedup family
        "dedup_duplicate_spans",
        "dedup_span_removal",
        "dedup_duplicate_spans_incremental",
    ]
    spreads: dict[str, list[float]] = {"kg_pipeline_e2e": [round(s, 3) for s in e2e_secs]}

    # Build/probe split for the incremental dedup gates (round-4
    # VERDICT item): the prior index is built once per corpus in
    # production and appended to per delta, so the operating cost is
    # the probe. Time the index builds as their own entry
    # (cache cleared per trial); the incremental gate timings below
    # then hit the warm cache and measure probe-only — previously the
    # fused number overstated the operating cost ~6×.
    build_secs = []
    for _ in range(trials):
        gate.clear_incremental_index_cache()
        t0 = time.time()
        gate.warm_incremental_indexes(spark, sf_dir)
        build_secs.append(time.time() - t0)
    timings["dedup_incremental_index_build"] = round(_median(build_secs), 3)
    spreads["dedup_incremental_index_build"] = [round(s, 3) for s in build_secs]

    for name in bench_queries:
        fn = gate.QUERIES[name]
        secs = []
        for _ in range(trials):
            t0 = time.time()
            _force(fn(spark, sf_dir))
            secs.append(time.time() - t0)
        timings[name] = round(_median(secs), 3)
        spreads[name] = [round(s, 3) for s in secs]

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    summary = {
        "metric": "kg_construct_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "triples_per_sec": triples_per_sec,
        "triples_raw": triples,
        "cpus": int(cpus),
        "cpus_used": cpus_used,
        "trials": trials,
    }
    # Truncation-proofing (round 2's driver tail-capture cut the one
    # long stdout line → BENCH_r02.json "parsed": null): the FULL
    # summary incl. per-trial spreads goes to a file; stdout gets the
    # compact one-liner the driver parses, kept short by excluding
    # spreads.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_summary.json"),
            "w",
        ) as f:
            json.dump({**summary, "spread": spreads}, f, indent=1)
    except OSError:
        pass
    print(json.dumps(summary), flush=True)
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
