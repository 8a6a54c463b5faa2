"""Deduplication operators for large-scale training-data pipelines.

Four families, all shuffle-conscious:
- exact: hash-groupBy on md5(text) — one shuffle on a short key.
- minhash + LSH: shingle → K keyed-md5 minhashes → band keys →
  bucket join for candidates → exact Jaccard verify. The band join is
  the only shuffle; candidate verification never cross-joins the corpus.
- simhash: 16-bit sign-aggregated fingerprint; near-dups share
  fingerprints (or differ by few bits).
- n-gram Jaccard: blocked pairwise Jaccard via shingle-inverted-index
  join (block on a grouping column to bound the quadratic term).

All hashing is md5-based (functions.hashing) so every operator has an
exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import minhash_expr
from ..functions.text import tokens_expr, word_shingles_expr


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group identical texts: (content_md5, survivor_id, dup_count).
    survivor = min id; only groups with >1 member are duplicates but
    all groups are returned (dup_count tells)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_band_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band_id, band_key) — LSH bucketing keys. band_key is the
    concat of rows_per_band adjacent minhash signatures."""
    # materialize the shingle array once — referencing
    # word_shingles_expr inside each signature would re-run the
    # tokenize+transform pipeline num_hashes times (no CSE across
    # independent higher-order expressions; ~8x the scan cost)
    with_sh = docs.select(
        F.col(id_col), word_shingles_expr(text_col, shingle_n).alias("_sh")
    )
    sigs = [
        minhash_expr(F.col("_sh"), i).alias(f"_mh{i}") for i in range(num_hashes)
    ]
    with_sigs = with_sh.select(F.col(id_col), *sigs).where(
        F.col("_mh0").isNotNull()
    )
    bands = num_hashes // rows_per_band
    parts = []
    for b in range(bands):
        key = F.concat_ws(
            "|", *[F.col(f"_mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        )
        parts.append(
            with_sigs.select(
                F.col(id_col), F.lit(b).alias("band_id"), key.alias("band_key")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs from shared LSH bands, verified with exact
    shingle-set Jaccard. Returns (id_a, id_b, jaccard), id_a < id_b.

    Scale: the band self-join groups by band_key — hot buckets (boiler-
    plate shingles) are the skew risk; AQE skew-join splits them, and
    `num_hashes/rows_per_band` tunes bucket selectivity.
    """
    bands = minhash_band_keys(docs, id_col, text_col, num_hashes, rows_per_band, shingle_n)
    a = bands.select(F.col("band_id"), F.col("band_key"), F.col(id_col).alias("id_a"))
    b = bands.select(F.col("band_id"), F.col("band_key"), F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh = docs.select(
        F.col(id_col),
        F.array_distinct(word_shingles_expr(text_col, shingle_n)).alias("_sh"),
    )
    j = (
        cand.join(sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sa")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sb")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sa", "_sb"))
            / F.size(F.array_union("_sa", "_sb")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.col("jaccard"))
    )
    return j


def simhash16(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """16-bit SimHash over token multiset: bit b = sign of the sum over
    tokens of ±count, where the token votes +1 on bit b iff hex digit b
    of md5(token) >= '8'. Returns (id, simhash int)."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok")
    )
    counted = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("cnt"))
    bits = counted.select(
        F.col(id_col),
        F.col("cnt"),
        F.posexplode(
            F.split(F.substring(F.md5("tok"), 1, 16), "(?!^)")
        ).alias("bit", "hexd"),
    )
    votes = bits.withColumn(
        "vote",
        F.when(F.col("hexd") >= F.lit("8"), F.col("cnt")).otherwise(-F.col("cnt")),
    )
    bit_vals = votes.groupBy(id_col, "bit").agg(
        F.when(F.sum("vote") > 0, F.lit(1)).otherwise(F.lit(0)).alias("bitval")
    )
    return bit_vals.groupBy(id_col).agg(
        F.sum(F.col("bitval") * F.pow(F.lit(2.0), F.col("bit")).cast("long"))
        .cast("long")
        .alias("simhash")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Blocked pairwise n-gram Jaccard: only doc pairs within the same
    block are compared (the block bounds the quadratic blow-up; use a
    cheap pre-cluster — source, language, simhash byte — as block)."""
    sh = docs.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col),
        F.array_distinct(word_shingles_expr(text_col, shingle_n)).alias("_sh"),
    ).where(F.size("_sh") > 0)
    # inverted index: |A ∩ B| by counting shared (block, shingle) rows —
    # pairs with zero overlap never materialize, and no shingle ARRAY is
    # duplicated onto O(pairs) join rows (the naive blocked
    # array_intersect form was the bench hotspot and would be quadratic
    # in rows×array-size at 100 TB)
    inv = sh.select(
        "_blk", F.col(id_col), F.explode("_sh").alias("_g")
    )
    a = inv.select("_blk", F.col(id_col).alias("id_a"), "_g")
    b = inv.select("_blk", F.col(id_col).alias("id_b"), "_g")
    inter = (
        a.join(b, ["_blk", "_g"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sizes = sh.select(F.col(id_col), F.size("_sh").alias("_n"))
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.col("jaccard"))
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, optionally blocked."""
    from ..functions.vectors import cosine_expr

    cols = [F.col(id_col), F.col(emb_col)] + (
        [F.col(block_col).alias("_blk")] if block_col else []
    )
    v = vectors.select(*cols)
    a = v.select(
        *( [F.col("_blk")] if block_col else [] ),
        F.col(id_col).alias("id_a"), F.col(emb_col).alias("_ea"),
    )
    b = v.select(
        *( [F.col("_blk")] if block_col else [] ),
        F.col(id_col).alias("id_b"), F.col(emb_col).alias("_eb"),
    )
    joined = a.join(b, "_blk") if block_col else a.crossJoin(b)
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_expr(F.col("_ea"), F.col("_eb")))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.col("cos"))
    )
