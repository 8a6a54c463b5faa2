"""P/R/F1 metric joins (metrics.py / metrics_generator.py parity)."""

from knowledge_graph_creation_from_text_with_llms_spark.operators import metrics


def _df(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_strict_metrics(spark):
    gen = _df(spark, [("A", "is", "B"), ("C", "is", "D"), ("E", "is", "F")])
    gt = _df(spark, [("a", "is", "b"), ("C!", "is", "D"), ("X", "is", "Y")])
    m = metrics.strict_metrics(gen, gt).collect()[0]
    # normalization lowercases and strips punctuation → A/a match, C!/C match
    assert (m.tp, m.fp, m.fn) == (2, 1, 1)
    assert abs(m.precision - 2 / 3) < 1e-12
    assert abs(m.recall - 2 / 3) < 1e-12


def test_strict_metrics_dedups(spark):
    gen = _df(spark, [("A", "is", "B")] * 5)
    gt = _df(spark, [("A", "is", "B")])
    m = metrics.strict_metrics(gen, gt).collect()[0]
    assert (m.tp, m.fp, m.fn) == (1, 0, 0)
    assert m.f1 == 1.0


def test_component_metrics(spark):
    gen = _df(spark, [("A", "is", "B")])
    gt = _df(spark, [("A", "was", "B")])
    rows = {r.component: r for r in metrics.component_metrics(gen, gt).collect()}
    assert rows["subj"].f1 == 1.0
    assert rows["obj"].f1 == 1.0
    assert rows["pred"].tp == 0


def test_relaxed_containment(spark):
    gen = _df(spark, [("Artificial intelligence (AI)", "is a field of", "computer science")])
    gt = _df(spark, [("intelligence", "field of", "computer science")])
    m = metrics.relaxed_metrics(gen, gt).collect()[0]
    assert m.tp == 1 and m.fn == 0  # every gt component ⊆ gen components


def test_empty_sides(spark):
    empty = _df(spark, []).limit(0)
    gt = _df(spark, [("A", "b", "C")])
    m = metrics.strict_metrics(empty, gt).collect()[0]
    assert (m.tp, m.precision, m.recall) == (0, 0.0, 0.0)
