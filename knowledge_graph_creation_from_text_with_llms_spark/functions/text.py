"""Text column expressions (all native Spark SQL — JVM-side codegen).

These are the shared primitives the KG stages and the training-data
operators build on. Every expression here has an exact ANSI-SQL
equivalent (used by the DuckDB oracles), so correctness is checkable
engine-vs-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_expr(col: str | Column) -> Column:
    """Lowercased alphanumeric tokens of a text column (array<string>).

    SQL equivalent: regexp_extract_all(lower(col), '[a-z0-9]+').
    """
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(TOKEN_RE), 0)


def normalize_text_expr(col: str | Column) -> Column:
    """Metric normalization: lowercase, remove [^\\w\\s], strip.

    Mirrors the reference's normalize_text
    (/root/reference/tests/test_modules/metrics.py:28-31) exactly.
    """
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"[^\w\s]", ""))


def word_shingles_expr(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined) as array<string>.

    Empty array when the document has fewer than n tokens. Computed
    entirely with higher-order functions — no UDF, no shuffle.
    """
    toks = tokens_expr(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_shingles_expr(col: str | Column, k: int = 8) -> Column:
    """Character k-gram shingles of lower(col) as array<string>."""
    low = F.lower(_c(col))
    return F.when(
        F.length(low) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(low) - F.lit(k - 1)),
            lambda i: low.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def lcs_len_expr(a: Column, b: Column) -> Column:
    """Longest-common-subsequence length of two token arrays — fully
    native (no UDF), as a single `aggregate` fold over `a` carrying the
    DP row for `b`.

    The row update is an inner fold over `b` applying the textbook
    recurrence directly — new[j] = max(old[j], new[j-1],
    (a_i == b_j) ? old[j-1] + 1 : 0 — with new[j-1] read off the tail
    of the accumulator being built, so every DP cell is computed
    exactly once (a transform-based rewrite re-evaluated its candidate
    array per output element; measured 2× slower). O(m·n) cells per
    row — intended for sentence/triple-length token arrays (ROUGE-L),
    not documents. The DuckDB oracle twin computes the same values via
    a recursive CTE with the running-max reformulation
    (gate.kg_metrics_rougel_nostem) — same result, engine-appropriate
    shape on each side.
    """
    def step(row: Column, x: Column) -> Column:
        def cell(acc: Column, y: Column) -> Column:
            j = F.size(acc)  # 0-based position of the cell being built
            old_j = F.element_at(row, j + F.lit(1))
            new_prev = F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0))
            diag = F.when(j == F.lit(0), F.lit(0)).otherwise(
                F.element_at(row, j)
            )
            val = F.greatest(
                old_j,
                new_prev,
                F.when(y == x, diag + F.lit(1)).otherwise(F.lit(0)),
            )
            return F.concat(acc, F.array(val))

        return F.aggregate(b, F.array().cast("array<int>"), cell)

    zero = F.transform(b, lambda _: F.lit(0))
    return F.aggregate(
        a,
        zero,
        step,
        lambda row: F.coalesce(F.try_element_at(row, F.lit(-1)), F.lit(0)),
    )


def bigrams_expr(col: str | Column) -> Column:
    """Adjacent token pairs as array<struct<subj,obj>> — the mention
    co-occurrence triple source. No shuffle: pure array transform.
    """
    toks = tokens_expr(col)
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
            lambda i: F.struct(
                F.element_at(toks, i).alias("subj"),
                F.element_at(toks, i + F.lit(1)).alias("obj"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<subj:string,obj:string>>")
    )
