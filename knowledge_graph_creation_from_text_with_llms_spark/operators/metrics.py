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
    """Relaxed match, verbatim reference semantics
    (metrics_generator.py:128-157): a GT triple counts as found iff
    some generated triple's component TUPLE contains every non-empty
    normalized GT component as an exact member (`gt_comp in gen` on a
    3-tuple is membership, NOT substring — position-independent).
    Counts are over the raw (duplicate-preserving) lists, and
    fp = len(generated) - tp without clamping, exactly as shipped."""
    g = generated.select(
        *[normalize_text_expr(c).alias(f"g{c}") for c in _COLS]
    )
    t = ground_truth.select(
        *[normalize_text_expr(c).alias(c) for c in _COLS]
    )
    member = lambda comp: (F.col(comp) == "") | (
        (F.col(comp) == F.col("gsubj"))
        | (F.col(comp) == F.col("gpred"))
        | (F.col(comp) == F.col("gobj"))
    )
    matched = t.join(
        g, member("subj") & member("pred") & member("obj"), "left_semi"
    )
    tp = matched.count()
    total_gt = t.count()
    total_gen = g.count()
    fn = total_gt - tp
    fp = total_gen - tp
    return _prf(generated.sparkSession, tp, fp, fn)


def rouge_n_best(
    generated: DataFrame, ground_truth: DataFrame, n: int = 1
) -> DataFrame:
    """Per distinct generated triple: the best ROUGE-N f-measure over
    all ground-truth triples (metrics_generator.py:159-183 semantics:
    score the space-joined triple texts, keep the max; we omit the
    Porter stemmer — documented divergence of this test-only metric).

    ROUGE-N here is the standard clipped n-gram overlap:
      p = overlap/|gen ngrams|, r = overlap/|gt ngrams|,
      f = 2pr/(p+r); overlap = Σ_g min(count_gen(g), count_gt(g)).
    Computed with native explode/join/groupBy — exact, no UDF.
    """
    from ..functions.text import tokens_expr, word_shingles_expr

    def grams(df: DataFrame, prefix: str) -> DataFrame:
        text = F.concat_ws(" ", *[F.col(c) for c in _COLS])
        arr = tokens_expr(text) if n == 1 else word_shingles_expr(text, n)
        return df.select(
            *[F.col(c).alias(f"{prefix}{c}") for c in _COLS],
            arr.alias("_g"),
        ).where(F.size("_g") > 0)

    g = grams(generated.distinct(), "").withColumn(
        "_gid", F.md5(F.concat_ws("", *_COLS))
    )
    t = grams(ground_truth.distinct(), "t_").withColumn(
        "_tid", F.md5(F.concat_ws("", *[f"t_{c}" for c in _COLS]))
    )
    gc = g.select("_gid", F.explode("_g").alias("gram")).groupBy(
        "_gid", "gram"
    ).agg(F.count(F.lit(1)).alias("cg"))
    tc = t.select("_tid", F.explode("_g").alias("gram")).groupBy(
        "_tid", "gram"
    ).agg(F.count(F.lit(1)).alias("ct"))
    gsize = g.select("_gid", F.size("_g").alias("ng"))
    tsize = t.select("_tid", F.size("_g").alias("nt"))
    overlap = (
        gc.join(tc, "gram")
        .groupBy("_gid", "_tid")
        .agg(F.sum(F.least("cg", "ct")).alias("ov"))
    )
    scored = (
        overlap.join(gsize, "_gid")
        .join(tsize, "_tid")
        .withColumn("p", F.col("ov") / F.col("ng"))
        .withColumn("r", F.col("ov") / F.col("nt"))
        .withColumn("f", 2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r")))
    )
    best = scored.groupBy("_gid").agg(F.max("f").alias("best_f"))
    return (
        g.select("_gid", *_COLS)
        .join(best, "_gid", "left")
        .select(
            *_COLS,
            F.coalesce("best_f", F.lit(0.0)).alias(f"best_rouge{n}_f"),
        )
    )


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
