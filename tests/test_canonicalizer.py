"""Salted two-phase canonicalization reduce."""

from pyspark.sql import functions as F

from knowledge_graph_creation_from_text_with_llms_spark.operators import canonicalizer


def _mentions(spark):
    rows = []
    # hub entity with many surface forms across docs (the skew case)
    for d in range(40):
        rows.append((f"doc{d}", "LeBron James"))
        rows.append((f"doc{d}", "lebron james!"))
    rows.append(("doc0", "  LeBron   James  "))
    rows.append(("doc1", "Akron"))
    return spark.createDataFrame(rows, "doc_id string, label string")


def test_salted_counts_match_plain_groupby(spark):
    m = _mentions(spark)
    salted = {
        r.canonical_key: (r.n_mentions, r.n_docs)
        for r in canonicalizer.salted_mention_counts(m, num_salts=8).collect()
    }
    plain = {
        r.k: (r.nm, r.nd)
        for r in m.select(
            canonicalizer.canonical_key_expr("label").alias("k"), "doc_id"
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nm"), F.countDistinct("doc_id").alias("nd"))
        .collect()
    }
    assert salted == plain
    assert salted["lebron james"] == (81, 40)
    assert salted["akron"] == (1, 1)


def test_coreferent_forms_merge(spark):
    out = canonicalizer.salted_mention_counts(_mentions(spark)).collect()
    lebron = [r for r in out if r.canonical_key == "lebron james"][0]
    assert sorted(lebron.aliases) == [
        "  LeBron   James  ",
        "LeBron James",
        "lebron james!",
    ]


def test_materialize_modes_equivalent(spark):
    """two_scan / checkpoint / persist are plan shapes, not semantics:
    all three must produce identical rows (incl. sorted alias arrays)."""
    m = _mentions(spark)
    outs = {
        mode: {
            r.canonical_key: (r.node_id, r.n_mentions, r.n_docs, tuple(r.aliases))
            for r in canonicalizer.salted_mention_counts(
                m, num_salts=8, materialize=mode
            ).collect()
        }
        for mode in ("fold", "two_scan", "checkpoint", "persist")
    }
    assert (
        outs["fold"]
        == outs["two_scan"]
        == outs["checkpoint"]
        == outs["persist"]
    )


def test_materialize_mode_validated(spark):
    import pytest

    with pytest.raises(ValueError, match="materialize"):
        canonicalizer.salted_mention_counts(
            _mentions(spark), materialize="bogus"
        ).collect()


def test_surrogate_ids_stable(spark):
    a = canonicalizer.salted_mention_counts(_mentions(spark), num_salts=4).collect()
    b = canonicalizer.salted_mention_counts(_mentions(spark), num_salts=32).collect()
    assert {r.canonical_key: r.node_id for r in a} == {
        r.canonical_key: r.node_id for r in b
    }
