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


def test_relaxed_membership(spark):
    # reference semantics: `gt_comp in gen` is TUPLE MEMBERSHIP —
    # position-independent exact match of each non-empty component
    gen = _df(spark, [("Akron", "born in", "LeBron James")])
    gt = _df(
        spark,
        [
            ("LeBron James", "born in", "Akron"),   # members, swapped → TP
            ("LeBron", "born in", "Akron"),          # substring only → no
        ],
    )
    m = metrics.relaxed_metrics(gen, gt).collect()[0]
    assert (m.tp, m.fn) == (1, 1)


def test_relaxed_empty_components_skipped(spark):
    gen = _df(spark, [("a", "b", "c")])
    gt = _df(spark, [("", "b", "")])  # only 'b' must be a member
    m = metrics.relaxed_metrics(gen, gt).collect()[0]
    assert m.tp == 1


def test_rouge1_best_match(spark):
    gen = _df(spark, [("the cat", "sat on", "the mat"), ("zz", "qq", "ww")])
    gt = _df(spark, [("the cat", "sat on", "a mat")])
    rows = {(r.subj, r.pred, r.obj): r.best_rouge1_f
            for r in metrics.rouge_n_best(gen, gt, n=1).collect()}
    # gen1 tokens: the cat sat on the mat (6); gt: the cat sat on a mat
    # (6); clipped overlap = the,cat,sat,on,mat = 5 → p=r=5/6, f=5/6
    assert abs(rows[("the cat", "sat on", "the mat")] - 5 / 6) < 1e-12
    assert rows[("zz", "qq", "ww")] == 0.0


def test_empty_sides(spark):
    empty = _df(spark, []).limit(0)
    gt = _df(spark, [("A", "b", "C")])
    m = metrics.strict_metrics(empty, gt).collect()[0]
    assert (m.tp, m.precision, m.recall) == (0, 0.0, 0.0)
