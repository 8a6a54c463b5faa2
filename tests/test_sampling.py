"""Deterministic splitting / sampling and decontamination semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_graph_creation_from_text_with_llms_spark.operators import (
    contamination,
    sampling,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text of document number "), F.col("id")).alias("text"),
    )


def test_assign_splits_partition_and_proportions(spark):
    docs = _docs(spark, 2000)
    out = sampling.assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # hash buckets are uniform: proportions within a loose tolerance
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert 0.05 < counts["val"] / 2000 < 0.16


def test_assign_splits_growth_stable(spark):
    """Adding documents must never move an existing one between splits."""
    small = sampling.assign_splits(_docs(spark, 100)).collect()
    big = {r.doc_id: r.split for r in sampling.assign_splits(_docs(spark, 1000)).collect()}
    for r in small:
        assert big[r.doc_id] == r.split


def test_hash_sample_monotone_membership(spark):
    small = {r.doc_id for r in sampling.hash_sample(_docs(spark, 100), 0.3).collect()}
    big = {r.doc_id for r in sampling.hash_sample(_docs(spark, 1000), 0.3).collect()}
    assert small == {d for d in big if d < 100}
    # deterministic across runs
    again = {r.doc_id for r in sampling.hash_sample(_docs(spark, 100), 0.3).collect()}
    assert small == again


def test_hash_sample_fraction_bounds(spark):
    import pytest

    with pytest.raises(ValueError):
        sampling.hash_sample(_docs(spark), 1.5)
    assert sampling.hash_sample(_docs(spark, 50), 0.0).count() == 0
    assert sampling.hash_sample(_docs(spark, 50), 1.0).count() == 50


def test_contamination_flags_and_decontaminate(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog"),
            (2, "completely unrelated words here entirely"),
            (3, "prefix quick brown fox suffix tokens"),  # shares 3-gram with probe
            (4, "qu ick brown"),                           # too short / no shared 3-gram
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, "the quick brown fox leaps")], "pid long, text string"
    )
    flags = {
        r.doc_id: (r.n_contaminated_grams, r.contaminated)
        for r in contamination.contamination_flags(
            docs, probes, n=3, probe_text_col="text"
        ).collect()
    }
    # doc 1 shares "the quick brown" and "quick brown fox"
    assert flags[1] == (2, True)
    assert flags[2] == (0, False)
    assert flags[3] == (1, True)
    assert flags[4] == (0, False)
    clean = contamination.decontaminate(docs, probes, n=3).collect()
    assert sorted(r.doc_id for r in clean) == [2, 4]
    assert len(clean[0].asDict()) == 2  # schema preserved (doc_id, text)
