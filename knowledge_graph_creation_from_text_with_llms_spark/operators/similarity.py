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


def _partial_topk(scored: DataFrame, q_id: str, c_id: str, k: int) -> DataFrame:
    """Per-input-partition top-k pre-reduction (exact).

    The global per-query window must shuffle every scored row on q_id —
    |Q|×|C| rows for a brute-force scan. Any row in the global top-k is
    necessarily in the top-k of its own partition under the same total
    order (cos desc, candidate id asc — strict, so no ties cross the
    cut), so reducing each partition to ≤|Q|·k rows first shrinks the
    shuffle by ~|C|/(k·P) with an identical result. Arrow-batched
    mapInPandas keeps the running best bounded at |Q|·k rows per
    partition; NaN cosines sort FIRST on the descending key to match
    Spark's NaN-greatest window ordering.
    """
    import pandas as pd  # noqa: F401 (worker-side)

    schema = scored.schema

    def reduce_partition(batches):
        import pandas as pd

        best = None
        for pdf in batches:
            cur = pdf if best is None else pd.concat((best, pdf), ignore_index=True)
            cur = cur.sort_values(
                [q_id, "cos", c_id],
                ascending=[True, False, True],
                na_position="first",
                ignore_index=True,
            )
            best = cur.groupby(q_id, sort=False).head(k)
        if best is not None:
            yield best

    return scored.mapInPandas(reduce_partition, schema=schema)


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_emb: str = "q_emb",
    c_id: str = "vec_id",
    c_emb: str = "embedding",
    include_self: bool = False,
    partial_reduce: bool = True,
) -> DataFrame:
    """(q_id, vec_id, cos, rank_pos) — exact top-k by cosine,
    deterministic tie-break on candidate id. Two-phase: scores stay
    JVM-side (codegen cosine over the broadcast queries), then each
    scan partition pre-reduces to its local top-k before the global
    per-query window — the q_id shuffle carries |Q|·k·P rows instead
    of |Q|×|C| (set partial_reduce=False to keep the single-phase
    plan for tiny inputs)."""
    joined = candidates.crossJoin(
        F.broadcast(queries.select(F.col(q_id), F.col(q_emb)))
    )
    if not include_self:
        joined = joined.where(F.col(q_id) != F.col(c_id))
    scored = joined.withColumn(
        "cos", cosine_expr(F.col(q_emb), F.col(c_emb))
    ).select(q_id, c_id, "cos")
    if partial_reduce:
        scored = _partial_topk(scored, q_id, c_id, k)
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
        # try_element_at: vectors shorter than `bits` dims contribute 0
        # for the missing dimensions (same as SQL's NULL-on-OOB index)
        out = out + F.when(
            F.try_element_at(emb, F.lit(b + 1)) > 0, F.lit(2 ** b)
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
    partial_reduce: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates bucketed by hyperplane code; each
    query scores only its bucket. The bucket join replaces the cross
    join — the candidate scan partitions by bucket and each query
    touches ~1/2^bits of the corpus. The same per-partition top-k
    pre-reduction as brute_force_topk shrinks the window shuffle."""
    cb = candidates.withColumn("_bkt", hyperplane_bucket_expr(F.col(c_emb), bits))
    qb = queries.withColumn("_bkt", hyperplane_bucket_expr(F.col(q_emb), bits))
    joined = cb.join(F.broadcast(qb), "_bkt").where(F.col(q_id) != F.col(c_id))
    scored = joined.withColumn(
        "cos", cosine_expr(F.col(q_emb), F.col(c_emb))
    ).select(q_id, c_id, "cos")
    if partial_reduce:
        scored = _partial_topk(scored, q_id, c_id, k)
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc(c_id))
    return (
        scored.withColumn("rank_pos", F.row_number().over(w))
        .where(F.col("rank_pos") <= k)
        .select(q_id, c_id, F.col("cos"), "rank_pos")
    )
