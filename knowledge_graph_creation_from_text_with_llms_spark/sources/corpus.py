"""Fixture corpus loaders: build the `source` input table
(repo, path, commit, lang, content [+ content_sha256, doc_id])
deterministically — from the reference's committed test corpora when
available (parity oracles), or from any documents DataFrame.
"""

from __future__ import annotations

import glob
import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REFERENCE_ROOT = "/root/reference"

CORPORA = {
    "ai": "tests/data/Datasets_Generator/Dataset_AI/Raw",
    "lebron": "tests/data/Datasets_Generator/Dataset_LebronJames/Raw",
}

_FIXED_COMMIT = hashlib.sha1(b"kg-spark-fixture").hexdigest()


def with_ingest_columns(df: DataFrame) -> DataFrame:
    """Attach the per-row invariant hash and the lineage doc id."""
    return df.withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    ).withColumn(
        "doc_id",
        F.sha2(F.concat_ws(" ", F.col("repo"), F.col("path"), F.col("commit")), 256),
    )


def _read_dir_rows(root: str, rel: str, repo: str) -> list[tuple]:
    rows = []
    d = os.path.join(root, rel)
    for p in sorted(glob.glob(os.path.join(d, "*.txt"))):
        with open(p, encoding="utf-8") as f:
            rows.append((repo, f"raw/{os.path.basename(p)}", _FIXED_COMMIT, "text", f.read()))
    return rows


def reference_source_table(
    spark: SparkSession, root: str = REFERENCE_ROOT, corpora: tuple[str, ...] = ("ai", "lebron")
) -> DataFrame:
    """source table carrying the reference corpora text (read-only
    access to /root/reference at test time; nothing is copied into the
    repo beyond what tests read on the fly)."""
    rows: list[tuple] = []
    for name in corpora:
        rows.extend(_read_dir_rows(root, CORPORA[name], f"corpus/{name}"))
    if not rows:
        raise FileNotFoundError(f"no corpus files under {root}")
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    return with_ingest_columns(df)


def documents_as_source(documents: DataFrame) -> DataFrame:
    """Map the driver's documents table (doc_id, text, lang, source,
    n_chars) into the input_hint `source` shape."""
    df = documents.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.lit(_FIXED_COMMIT).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    return with_ingest_columns(df)


def synthetic_scaled_source(
    spark: SparkSession, base: DataFrame, copies: int
) -> DataFrame:
    """Replicate a base source table `copies`× with distinct
    repo/path/commit but the same content pool — realistic per-row
    extractor work at benchmark scale (FIXTURES.md §1 'bench')."""
    reps = spark.range(copies).select(F.col("id").alias("_rep"))
    return with_ingest_columns(
        base.select("repo", "path", "commit", "lang", "content")
        .crossJoin(F.broadcast(reps))
        .select(
            F.concat_ws("-", "repo", "_rep").alias("repo"),
            "path",
            F.sha2(F.concat_ws("-", "commit", "_rep"), 256).substr(1, 40).alias("commit"),
            "lang",
            "content",
        )
    )
