"""Composed corpus-preparation plan (plans/corpus_prep.py)."""

from knowledge_graph_creation_from_text_with_llms_spark.plans.corpus_prep import (
    CorpusPrepConfig,
    prepare_corpus,
)


def test_prepare_corpus_drops_and_survives(spark):
    good = (
        "the cat sat on the mat and the dog is in the house of friends "
        "with many other words to pass the quality gate easily today "
    )
    docs = spark.createDataFrame(
        [
            (1, good + "one"),
            (2, good + "one"),        # exact dup of 1 → dropped
            (3, good + "one more"),   # near-dup of 1 → same LSH cluster
            (4, "tiny"),              # too short → quality filter
            (
                5,
                "spark executes the plan in stages and every shuffle is a "
                "boundary between them while the optimizer is free to reorder "
                "joins and push filters down to the scan of the table today ",
            ),
        ],
        "doc_id long, text string",
    )
    cfg = CorpusPrepConfig(jaccard_threshold=0.5)
    out = prepare_corpus(docs, cfg)
    ids = {r.doc_id for r in out.collect()}
    assert 1 in ids          # canonical survivor (min id of its cluster)
    assert 2 not in ids      # exact dup
    assert 3 not in ids      # near-dup cluster member
    assert 4 not in ids      # quality-dropped
    assert 5 in ids
    assert cfg.audit["input"] == 5
    assert cfg.audit["after_quality_filter"] == 4
    assert cfg.audit["after_exact_dedup"] == 3
    assert cfg.audit["after_neardup_collapse"] == len(ids)
