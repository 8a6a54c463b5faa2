"""Incremental processing: only new source rows flow through the
per-row stages; global tables converge to the same result as a
from-scratch run over the full input."""

from pyspark.sql import functions as F

from knowledge_graph_creation_from_text_with_llms_spark.plans.pipeline import (
    KGPipeline,
    PipelineConfig,
)
from knowledge_graph_creation_from_text_with_llms_spark.sources.catalog import (
    ParquetCatalog,
)
from knowledge_graph_creation_from_text_with_llms_spark.sources.corpus import (
    with_ingest_columns,
)


def _src(spark, ids):
    rows = [
        ("r1", f"f{i}.txt", "c" * 40, "text",
         f"alpha beta gamma doc{i}. delta epsilon zeta doc{i}.")
        for i in ids
    ]
    return with_ingest_columns(
        spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, content string"
        )
    )


def _edges(cat):
    return {
        (r.src_id, r.pred_id, r.dst_id, r.weight)
        for r in cat.read("edges").collect()
    }


def test_incremental_matches_full_rebuild(spark, tmp_path):
    cfg = PipelineConfig(chunk_size=60)

    inc_cat = ParquetCatalog(str(tmp_path / "inc"), spark)
    pipe = KGPipeline(spark, inc_cat, cfg)
    c1 = pipe.run_incremental(_src(spark, range(0, 6)))
    assert c1["source_delta"] == 6

    # second batch overlaps: 3 old docs (skipped) + 4 new
    c2 = pipe.run_incremental(_src(spark, range(3, 10)))
    assert c2["source_delta"] == 4  # only docs 6..9 processed
    # per-row stages saw only the delta
    assert c2["chunks"] < c1["chunks"] * 2

    # third batch re-sends rows only present in batch 1 — the seen-set
    # must span ALL source snapshots, not just the latest delta
    c3 = pipe.run_incremental(_src(spark, range(0, 3)))
    assert c3["source_delta"] == 0

    full_cat = ParquetCatalog(str(tmp_path / "full"), spark)
    KGPipeline(spark, full_cat, cfg).run(_src(spark, range(0, 10)))
    assert _edges(inc_cat) == _edges(full_cat)


def test_incremental_noop_on_no_new_rows(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "c"), spark)
    pipe = KGPipeline(spark, cat, PipelineConfig(chunk_size=60))
    pipe.run_incremental(_src(spark, range(0, 4)))
    edges_before = _edges(cat)
    c = pipe.run_incremental(_src(spark, range(0, 4)))
    assert c["source_delta"] == 0 and "edges" not in c
    assert _edges(cat) == edges_before


def test_incremental_reprocesses_changed_content(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "c"), spark)
    pipe = KGPipeline(spark, cat, PipelineConfig(chunk_size=60))
    pipe.run_incremental(_src(spark, [0]))
    # same (repo, path, commit) → same doc_id, but content changed
    changed = with_ingest_columns(
        spark.createDataFrame(
            [("r1", "f0.txt", "c" * 40, "text", "totally new words here.")],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    c = pipe.run_incremental(changed)
    assert c["source_delta"] == 1  # new content hash → reprocessed
