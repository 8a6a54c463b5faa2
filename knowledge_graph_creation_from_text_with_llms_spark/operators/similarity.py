"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k of each query vector against the
  candidate set. Queries are broadcast (the query set is small by
  definition); candidates stream through — one scan, no shuffle of the
  candidate table, a per-query top-k window on the scored rows.
- ivf_topk: the scale path — candidates are pre-bucketed by a coarse
  deterministic quantizer (sign pattern of the leading dimensions, an
  LSH-style hyperplane code); each query probes only its own bucket.
  Recall < 1 by design; `probe_mirror` widens probing.

All math is double-precision deterministic folds (functions.vectors) so
results have exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_emb: str = "q_emb",
    c_id: str = "vec_id",
    c_emb: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """(q_id, vec_id, cos, rank_pos) — exact top-k by cosine,
    deterministic tie-break on candidate id."""
    joined = candidates.crossJoin(
        F.broadcast(queries.select(F.col(q_id), F.col(q_emb)))
    )
    if not include_self:
        joined = joined.where(F.col(q_id) != F.col(c_id))
    scored = joined.withColumn("cos", cosine_expr(F.col(q_emb), F.col(c_emb)))
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc(c_id))
    return (
        scored.withColumn("rank_pos", F.row_number().over(w))
        .where(F.col("rank_pos") <= k)
        .select(q_id, c_id, F.col("cos"), "rank_pos")
    )


def hyperplane_bucket_expr(emb: Column, bits: int = 3) -> Column:
    """Coarse IVF-style cell id: sign bits of the first `bits` dims.
    Deterministic, SQL-expressible; at scale swap for trained k-means
    centroids (same probe-join shape)."""
    out = F.lit(0)
    for b in range(bits):
        out = out + F.when(
            F.element_at(emb, b + 1) > 0, F.lit(2 ** b)
        ).otherwise(F.lit(0))
    return out


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    bits: int = 3,
    q_id: str = "q_id",
    q_emb: str = "q_emb",
    c_id: str = "vec_id",
    c_emb: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates bucketed by hyperplane code; each
    query scores only its bucket. The bucket join replaces the cross
    join — the candidate scan partitions by bucket and each query
    touches ~1/2^bits of the corpus."""
    cb = candidates.withColumn("_bkt", hyperplane_bucket_expr(F.col(c_emb), bits))
    qb = queries.withColumn("_bkt", hyperplane_bucket_expr(F.col(q_emb), bits))
    joined = cb.join(F.broadcast(qb), "_bkt").where(F.col(q_id) != F.col(c_id))
    scored = joined.withColumn("cos", cosine_expr(F.col(q_emb), F.col(c_emb)))
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc(c_id))
    return (
        scored.withColumn("rank_pos", F.row_number().over(w))
        .where(F.col("rank_pos") <= k)
        .select(q_id, c_id, F.col("cos"), "rank_pos")
    )
