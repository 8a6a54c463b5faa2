"""Checkpoint/resume idempotence (north_rule: a killed job resumes from
the last committed snapshot and produces identical final tables)."""

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


def _source(spark):
    rows = [
        ("r1", f"f{i}.txt", "c" * 40, "text",
         f"alpha beta gamma delta epsilon zeta eta theta doc{i}. "
         f"iota kappa lambda mu nu xi omicron pi rho doc{i}.")
        for i in range(10)
    ]
    return with_ingest_columns(
        spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, content string"
        )
    )


def _edge_set(cat):
    return {
        (r.src_id, r.pred_id, r.dst_id, r.weight)
        for r in cat.read("edges").collect()
    }


def test_kill_and_resume_is_idempotent(spark, tmp_path):
    src = _source(spark)
    cfg = PipelineConfig(chunk_size=60)

    # fresh full run
    cat_full = ParquetCatalog(str(tmp_path / "full"), spark)
    KGPipeline(spark, cat_full, cfg).run(src)

    # killed run: only the first three stages committed
    cat_killed = ParquetCatalog(str(tmp_path / "killed"), spark)
    pipe = KGPipeline(spark, cat_killed, cfg)
    cat_killed.write(src, "source", stage="source")
    cat_killed.write(pipe.stage_chunks(cat_killed.read("source")), "chunks", stage="chunks")
    assert cat_killed.committed_stages() == {"source", "chunks"}

    # resume completes the rest without re-running committed stages
    counts = pipe.run(src, resume=True)
    assert counts["chunks"] == -1  # skipped
    assert _edge_set(cat_killed) == _edge_set(cat_full)
    assert pipe.verify_invariant()


def test_rerun_after_success_is_noop(spark, tmp_path):
    src = _source(spark)
    cat = ParquetCatalog(str(tmp_path / "c"), spark)
    pipe = KGPipeline(spark, cat, PipelineConfig(chunk_size=60))
    pipe.run(src)
    snaps_before = {t: cat.latest_snapshot(t) for t in ("chunks", "edges")}
    counts = pipe.run(src, resume=True)
    assert all(v == -1 for k, v in counts.items() if k != "source")
    assert {t: cat.latest_snapshot(t) for t in ("chunks", "edges")} == snaps_before


def test_manifest_records_counters(spark, tmp_path):
    src = _source(spark)
    cat = ParquetCatalog(str(tmp_path / "m"), spark)
    KGPipeline(spark, cat, PipelineConfig(chunk_size=60)).run(src)
    manifest = cat.manifest()
    stages = [m["stage"] for m in manifest]
    for s in ("source", "chunks", "raw_responses", "triples_raw", "edges"):
        assert s in stages
    assert all(m["rows_out"] >= 0 and m["status"] == "committed" for m in manifest)
    assert all(m["wall_sec"] >= 0 for m in manifest)


def test_atomic_commit_no_partial_reads(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path / "a"), spark)
    df = spark.range(100).select(F.col("id"))
    cat.write(df, "t", stage="t")
    cat.write(df.where("id < 50"), "t", stage="t")
    assert cat.snapshots("t") == [1, 2]
    assert cat.read("t").count() == 50          # latest snapshot
    assert cat.read("t", snapshot=1).count() == 100  # time travel


def test_catalog_compaction_preserves_union_view(spark, tmp_path):
    """compact() folds N snapshots into one with a row-identical union
    read-view, a single surviving snapshot, and audited manifest rows."""
    from knowledge_graph_creation_from_text_with_llms_spark.plans.pipeline import (
        KGPipeline,
    )
    from knowledge_graph_creation_from_text_with_llms_spark.sources.catalog import (
        ParquetCatalog,
    )

    cat = ParquetCatalog(str(tmp_path / "cat"), spark)
    for lo, hi in ((0, 5), (5, 8), (8, 13)):
        cat.write(spark.range(lo, hi).toDF("id"), "t", stage="t")
    before = sorted(r.id for r in KGPipeline._read_all(cat, "t").collect())
    info = cat.compact("t")
    assert cat.snapshots("t") == [info.snapshot_id]
    after = sorted(r.id for r in KGPipeline._read_all(cat, "t").collect())
    assert after == before == list(range(13))
    statuses = [m["status"] for m in cat.manifest() if m["stage"] == "t"]
    assert statuses[-2:] == ["compacting", "compacted"]
    folded = [m for m in cat.manifest() if m["status"] == "compacting"][0]["folded"]
    assert folded == [1, 2, 3]
    # incremental append after compaction keeps working
    cat.write(spark.range(13, 15).toDF("id"), "t", stage="t")
    again = sorted(r.id for r in KGPipeline._read_all(cat, "t").collect())
    assert again == list(range(15))


def _compaction_state(spark, tmp_path, name):
    cat = ParquetCatalog(str(tmp_path / name), spark)
    for lo, hi in ((0, 5), (5, 8), (8, 13)):
        cat.write(spark.range(lo, hi).toDF("id"), "t", stage="t")
    return cat


def test_compaction_crash_before_rename_is_aborted(spark, tmp_path):
    """Crash window 1: the 'compacting' intent row is on disk but the
    union snapshot was never renamed in. recover() must remove the
    orphan staging dir, audit an abort, and leave the union read-view
    untouched (inputs were never dropped)."""
    import os

    cat = _compaction_state(spark, tmp_path, "c1")
    snaps = cat.snapshots("t")
    snap = snaps[-1] + 1
    staging = os.path.join(cat._table_dir("t"), f".staging-{snap}")
    KGPipeline._read_all(cat, "t").write.parquet(staging)
    cat._append_manifest(
        {
            "run_id": "crashed",
            "stage": "t",
            "status": "compacting",
            "rows_in": len(snaps),
            "rows_out": 13,
            "snapshot_id": snap,
            "folded": snaps,
            "wall_sec": 0.0,
            "updated_at": "2026-01-01T00:00:00Z",
        }
    )
    assert cat.recover("t") == "aborted"
    assert not os.path.exists(staging)
    assert cat.snapshots("t") == snaps  # inputs intact
    assert sorted(r.id for r in KGPipeline._read_all(cat, "t").collect()) == list(
        range(13)
    )
    assert cat.recover("t") is None  # idempotent


def test_compaction_crash_after_rename_completes_drops(spark, tmp_path):
    """Crash window 2: the union snapshot committed but the folded
    inputs were not dropped — a naive union view would return every
    row TWICE. recover() (called by _read_all) completes the drops, so
    the read-view stays row-identical."""
    import os

    cat = _compaction_state(spark, tmp_path, "c2")
    snaps = cat.snapshots("t")
    snap = snaps[-1] + 1
    final = os.path.join(cat._table_dir("t"), f"snapshot={snap}")
    KGPipeline._read_all(cat, "t").write.parquet(final)
    cat._append_manifest(
        {
            "run_id": "crashed",
            "stage": "t",
            "status": "compacting",
            "rows_in": len(snaps),
            "rows_out": 13,
            "snapshot_id": snap,
            "folded": snaps,
            "wall_sec": 0.0,
            "updated_at": "2026-01-01T00:00:00Z",
        }
    )
    # raw union without recovery WOULD double-count
    assert cat.snapshots("t") == snaps + [snap]
    # _read_all recovers first: folded inputs dropped, rows exact
    got = sorted(r.id for r in KGPipeline._read_all(cat, "t").collect())
    assert got == list(range(13))
    assert cat.snapshots("t") == [snap]
    statuses = [m["status"] for m in cat.manifest() if m["stage"] == "t"]
    assert statuses[-1] == "compacted"
    assert [m for m in cat.manifest() if m.get("recovered")]
