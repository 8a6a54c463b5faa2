"""Vector math as native Spark higher-order functions.

Embeddings are plain array<float> columns. All arithmetic is done in
double precision with deterministic left-to-right folds so results are
reproducible and comparable against the DuckDB oracle. No UDFs — these
stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Deterministic left-to-right double-precision dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either norm is zero."""
    d = dot_expr(a, b)
    na, nb = norm_expr(a), norm_expr(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def cosine_prenorm_expr(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine_expr with the two norms supplied as precomputed columns.

    Bit-identical to cosine_expr (same operations in the same order) —
    the point is that a pairwise operator can evaluate norm_expr once
    per input ROW before the pair join instead of once per PAIR, which
    removes two of the three O(dim) folds from the quadratic stage.
    """
    return F.when((na > 0) & (nb > 0), dot_expr(a, b) / (na * nb))
