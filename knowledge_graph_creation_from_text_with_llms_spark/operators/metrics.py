"""Evaluation metrics: P/R/F1 of generated triples vs ground truth.

Reproduces the reference's two evaluators as DataFrame joins:
- strict set match (tests/test_modules/metrics_generator.py:104-126 and
  metrics.py:33-76): TP = inner join on the normalized 3-tuple key,
  FP = left_anti(generated, gt), FN = left_anti(gt, generated).
- relaxed containment (metrics_generator.py:128-157): a GT triple
  counts as found if all three of its normalized components are
  substrings of some generated triple's components — a theta
  (non-equi) join; broadcast the small GT side.
- per-component metrics (metrics.py:78-115): same joins on each of
  subj/pred/obj independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text_expr

_COLS = ("subj", "pred", "obj")


def _normalized(df: DataFrame) -> DataFrame:
    return df.select(
        *[normalize_text_expr(c).alias(c) for c in _COLS]
    ).where(
        (F.col("subj") != "") | (F.col("pred") != "") | (F.col("obj") != "")
    ).distinct()


def strict_metrics(generated: DataFrame, ground_truth: DataFrame) -> DataFrame:
    """One row: tp, fp, fn, precision, recall, f1 (triple level)."""
    g = _normalized(generated)
    t = _normalized(ground_truth)
    tp = g.join(t, list(_COLS), "inner").count()
    fp = g.join(t, list(_COLS), "left_anti").count()
    fn = t.join(g, list(_COLS), "left_anti").count()
    return _prf(generated.sparkSession, tp, fp, fn)


def component_metrics(generated: DataFrame, ground_truth: DataFrame) -> DataFrame:
    """Per-component (subject/predicate/object) P/R/F1 rows, mirroring
    metrics.py:78-115 which compares component *sets*."""
    rows = []
    for comp in _COLS:
        g = generated.select(normalize_text_expr(comp).alias("v")).where(
            F.col("v") != ""
        ).distinct()
        t = ground_truth.select(normalize_text_expr(comp).alias("v")).where(
            F.col("v") != ""
        ).distinct()
        tp = g.join(t, "v", "inner").count()
        fp = g.join(t, "v", "left_anti").count()
        fn = t.join(g, "v", "left_anti").count()
        p, r, f1 = _scalar_prf(tp, fp, fn)
        rows.append((comp, tp, fp, fn, p, r, f1))
    return generated.sparkSession.createDataFrame(
        rows, "component string, tp long, fp long, fn long, precision double, recall double, f1 double"
    )


def relaxed_metrics(generated: DataFrame, ground_truth: DataFrame) -> DataFrame:
    """Containment match (metrics_generator.py:139-143): GT found iff
    ∃ generated row with gt.subj ⊆ gen.subj ∧ gt.pred ⊆ gen.pred ∧
    gt.obj ⊆ gen.obj (normalized substring containment)."""
    g = _normalized(generated).select(
        F.col("subj").alias("gs"), F.col("pred").alias("gp"), F.col("obj").alias("go")
    )
    t = _normalized(ground_truth)
    matched = t.join(
        g,
        F.col("gs").contains(F.col("subj"))
        & F.col("gp").contains(F.col("pred"))
        & F.col("go").contains(F.col("obj")),
        "left_semi",
    )
    found = matched.count()
    total_gt = t.count()
    total_gen = _normalized(generated).count()
    tp = found
    fn = total_gt - found
    fp = max(total_gen - found, 0)
    return _prf(generated.sparkSession, tp, fp, fn)


def _scalar_prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


def _prf(spark, tp: int, fp: int, fn: int) -> DataFrame:
    p, r, f1 = _scalar_prf(tp, fp, fn)
    return spark.createDataFrame(
        [(tp, fp, fn, p, r, f1)],
        "tp long, fp long, fn long, precision double, recall double, f1 double",
    )
