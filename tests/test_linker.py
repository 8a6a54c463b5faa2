"""Linker preference order and strategies (Matcher.py:44-256)."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_creation_from_text_with_llms_spark.operators import linker


@pytest.fixture()
def entity_dict(spark):
    return spark.createDataFrame(
        [
            ("Q2", "king james", "LeBron James", 1),   # alias
            ("Q1", "LeBron James", "LeBron James", 0),  # exact label
            ("Q9", "Akron", "Akron", 0),
            ("Q9", "Akron", "akron ohio", 1),
        ],
        "entity_id string, label string, alias string, rank int",
    )


def test_exact_label_beats_alias(spark, entity_dict):
    facts = spark.createDataFrame([("lebron james",)], "name string")
    out = linker.link_labels(facts, entity_dict, "name", "eid").collect()
    assert out[0].eid == "Q1"  # rank 0 wins over the Q2 alias row


def test_case_insensitive_trimmed_match(spark, entity_dict):
    facts = spark.createDataFrame([("  AKRON OHIO ",)], "name string")
    out = linker.link_labels(facts, entity_dict, "name", "eid").collect()
    assert out[0].eid == "Q9"


def test_unmatched_stays_null(spark, entity_dict):
    facts = spark.createDataFrame([("nonexistent",)], "name string")
    out = linker.link_labels(facts, entity_dict, "name", "eid").collect()
    assert out[0].eid is None


def test_tie_breaks_on_smallest_id(spark):
    d = spark.createDataFrame(
        [("Q7", "x", "x", 0), ("Q3", "x", "x", 0)],
        "entity_id string, label string, alias string, rank int",
    )
    facts = spark.createDataFrame([("x",)], "name string")
    assert linker.link_labels(facts, d, "name", "eid").collect()[0].eid == "Q3"


@pytest.fixture()
def property_dict(spark):
    return spark.createDataFrame(
        [
            ("P54", "member of sports team", "member of sports team", 0, [1.0, 0.0, 0.0]),
            ("P54", "member of sports team", "played for", 1, [0.9, 0.1, 0.0]),
            ("P19", "place of birth", "place of birth", 0, [0.0, 1.0, 0.0]),
            ("P19", "place of birth", "born in", 1, [0.0, 0.9, 0.1]),
        ],
        "prop_id string, label string, alias string, rank int, embedding array<float>",
    )


def test_topk_cosine_alias_wins_when_strictly_better(spark, property_dict):
    preds = spark.createDataFrame(
        [("played for", [0.9, 0.1, 0.0])], "pred string, pred_embedding array<float>"
    )
    out = linker.topk_properties(preds, property_dict, k=2).collect()
    best = [r for r in out if r.rank_pos == 1][0]
    assert best.prop_id == "P54"
    assert best.best_match_text == "played for"  # alias beat the label
    assert best.label == "member of sports team"


def test_link_predicates_mixed_falls_back_to_cosine(spark, property_dict):
    facts = spark.createDataFrame(
        [("born in",), ("place of birth",)], "pred string"
    )
    embs = spark.createDataFrame(
        [("born in", [0.0, 0.9, 0.1]), ("place of birth", [0.0, 1.0, 0.0])],
        "pred string, pred_embedding array<float>",
    )
    out = {
        r.pred: r.pred_id
        for r in linker.link_predicates(
            facts, property_dict, method="mixed", pred_embeddings=embs
        ).collect()
    }
    assert out["place of birth"] == "P19"  # exact path
    assert out["born in"] == "P19"  # cosine fallback (alias embedding)


def test_link_triples_literal_flag(spark, entity_dict, property_dict):
    triples = spark.createDataFrame(
        [
            ("d", 1, "LeBron James", "place of birth", "Akron", "h"),
            ("d", 1, "LeBron James", "place of birth", "a sentence", "h"),
        ],
        "doc_id string, chunk_id int, subj string, pred string, obj string,"
        " content_sha256 string",
    )
    out = {
        r.obj: (r.obj_id, r.is_literal)
        for r in linker.link_triples(triples, entity_dict, property_dict).collect()
    }
    assert out["Akron"] == ("Q9", False)
    assert out["a sentence"] == (None, True)


def test_invalid_method_raises(spark, entity_dict, property_dict):
    facts = spark.createDataFrame([("x",)], "pred string")
    with pytest.raises(ValueError, match="Invalid method"):
        linker.link_predicates(facts, property_dict, method="bogus")
