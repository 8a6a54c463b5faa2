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

    # the second batch had no changed docs, so edges took the MERGE
    # path: the manifest must show it read prior edges + the delta's
    # linked triples — not the accumulated triples of both batches
    edge_rows = [
        r for r in inc_cat.manifest()
        if r["stage"] == "edges" and r["status"] == "committed"
    ]
    prior_edges_rows = edge_rows[0]["rows_out"]
    assert c2["retracted_docs"] == 0
    assert edge_rows[1]["rows_in"] == prior_edges_rows + c2["triples_linked"]


def test_incremental_noop_on_no_new_rows(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "c"), spark)
    pipe = KGPipeline(spark, cat, PipelineConfig(chunk_size=60))
    pipe.run_incremental(_src(spark, range(0, 4)))
    edges_before = _edges(cat)
    snap_before = cat.latest_snapshot("source")
    c = pipe.run_incremental(_src(spark, range(0, 4)))
    assert c["source_delta"] == 0 and "edges" not in c
    assert _edges(cat) == edges_before
    # the empty delta snapshot was rolled back: latest(source) still
    # holds real data and the invariant check passes on a benign rerun
    assert cat.latest_snapshot("source") == snap_before
    assert cat.read("source").count() == 4
    assert pipe.verify_invariant()
    assert any(r["status"] == "rolled_back" for r in cat.manifest())


def test_incremental_reprocesses_changed_content(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "c"), spark)
    pipe = KGPipeline(spark, cat, PipelineConfig(chunk_size=60))
    pipe.run_incremental(_src(spark, [0, 1]))
    # same (repo, path, commit) → same doc_id, but content changed
    changed = with_ingest_columns(
        spark.createDataFrame(
            [("r1", "f0.txt", "c" * 40, "text",
              "totally new words here. more fresh words arrive today.")],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    c = pipe.run_incremental(changed)
    assert c["source_delta"] == 1  # new content hash → reprocessed
    assert c["retracted_docs"] == 1

    # the old version of doc f0 is RETRACTED from the global tables:
    # they equal a from-scratch run over the live corpus (new f0 + f1)
    live = with_ingest_columns(
        spark.createDataFrame(
            [("r1", "f0.txt", "c" * 40, "text",
              "totally new words here. more fresh words arrive today."),
             ("r1", "f1.txt", "c" * 40, "text",
              "alpha beta gamma doc1. delta epsilon zeta doc1.")],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    full_cat = ParquetCatalog(str(tmp_path / "full"), spark)
    KGPipeline(spark, full_cat, PipelineConfig(chunk_size=60)).run(live)
    assert _edges(cat) == _edges(full_cat)
    nodes_inc = {
        (r.canonical_key, r.n_mentions, r.n_docs)
        for r in cat.read("nodes").collect()
    }
    nodes_full = {
        (r.canonical_key, r.n_mentions, r.n_docs)
        for r in full_cat.read("nodes").collect()
    }
    assert nodes_inc == nodes_full
    assert pipe.verify_invariant()
