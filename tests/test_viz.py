"""Visualization sink (SURVEY §2.1 S12): bounded deterministic draw
selection, literal-edge exclusion (reference parity with
GraphManager.prepare_visualization), DOT/HTML/manifest artifacts."""

from __future__ import annotations

import json
import os

from knowledge_graph_creation_from_text_with_llms_spark.operators import viz


def _edges(spark):
    rows = [
        # a dense hub around Q1 plus a literal edge that must not draw
        ("Q1", "P1", "Q2", False, 3),
        ("Q1", "P2", "Q3", False, 1),
        ("Q2", "P1", "Q3", False, 2),
        ("Q4", "P3", "Q1", False, 1),
        ("Q5", "P9", "Q6", False, 1),          # isolated pair, lowest degree
        ("Q1", "P4", "some literal", True, 5),  # literal: never drawn
    ]
    return spark.createDataFrame(
        rows, "src_id string, pred_id string, dst_id string, is_literal boolean, weight long"
    )


def test_viz_edges_excludes_literals_and_ranks_by_density(spark):
    sel = viz.viz_edges(_edges(spark), max_edges=10).collect()
    drawn = {(r.src_id, r.pred_id, r.dst_id) for r in sel}
    assert ("Q1", "P4", "some literal") not in drawn
    assert len(sel) == 5
    # densest edge first (Q1/Q2 neighborhood), isolated Q5-Q6 last
    assert (sel[0].src_id, sel[0].dst_id) in {("Q1", "Q2"), ("Q1", "Q3"), ("Q2", "Q3")}
    assert (sel[-1].src_id, sel[-1].dst_id) == ("Q5", "Q6")


def test_viz_cap_is_audited_not_silent(spark, tmp_path):
    stats = viz.write_visualization(_edges(spark), str(tmp_path / "v"), max_edges=2)
    assert stats["edges_total"] == 5
    assert stats["edges_drawn"] == 2
    assert stats["edges_dropped"] == 3
    man = json.load(open(tmp_path / "v" / "viz_manifest.json"))
    assert man["edges_dropped"] == 3 and man["max_edges"] == 2


def test_viz_artifacts_deterministic_and_well_formed(spark, tmp_path):
    for d in ("a", "b"):
        viz.write_visualization(_edges(spark), str(tmp_path / d), max_edges=10)
    dot_a = open(tmp_path / "a" / "graph.dot").read()
    dot_b = open(tmp_path / "b" / "graph.dot").read()
    assert dot_a == dot_b  # byte-identical across runs
    assert dot_a.startswith("digraph kg {") and dot_a.rstrip().endswith("}")
    assert '"Q1" -> "Q2" [label="P1", weight=3];' in dot_a
    assert "some literal" not in dot_a
    html = open(tmp_path / "a" / "graph.html").read()
    assert html == open(tmp_path / "b" / "graph.html").read()
    assert "<canvas" in html and '"s": "Q1"' in html
    assert os.path.getsize(tmp_path / "a" / "viz_manifest.json") > 0


def test_viz_dot_quoting(spark, tmp_path):
    df = spark.createDataFrame(
        [('he said "hi"', "P1", "a\\b", False, 1)],
        "src_id string, pred_id string, dst_id string, is_literal boolean, weight long",
    )
    dot, stats = viz.to_dot(df, max_edges=5)
    assert '"he said \\"hi\\"" -> "a\\\\b"' in dot
    assert stats["edges_drawn"] == 1
