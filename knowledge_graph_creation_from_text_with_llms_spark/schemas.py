"""Explicit StructType schemas for every table in the pipeline.

The reference keeps schema-by-convention in text files (SURVEY.md §1);
here every stage has a declared columnar schema so Catalyst can prune
columns and push predicates into the parquet/Iceberg scans.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input table (BASELINE.json input_hint shape, exact).
SOURCE = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
        # derived at ingest; carried through every stage as the per-row
        # invariant (content sha256 equality vs source)
        StructField("content_sha256", StringType()),
        StructField("doc_id", StringType()),
    ]
)

CHUNKS = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("chunk_id", IntegerType()),
        StructField("text", StringType()),
        StructField("content_sha256", StringType()),
    ]
)

RAW_RESPONSES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("chunk_id", IntegerType()),
        StructField("response", StringType()),
        StructField("content_sha256", StringType()),
    ]
)

TRIPLES_RAW = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("chunk_id", IntegerType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("content_sha256", StringType()),
    ]
)

# Broadcast dictionaries: one row per (id, alias); rank 0 = the
# canonical label itself, 1 = alias (preference order of the reference
# matcher, /root/reference/src/core/Integrator/Matcher.py:75-92).
ENTITY_DICT = StructType(
    [
        StructField("entity_id", StringType()),
        StructField("label", StringType()),
        StructField("alias", StringType()),
        StructField("rank", IntegerType()),
    ]
)

PROPERTY_DICT = StructType(
    [
        StructField("prop_id", StringType()),
        StructField("label", StringType()),
        StructField("alias", StringType()),
        StructField("rank", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

TRIPLES_LINKED = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("chunk_id", IntegerType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("subj_id", StringType()),
        StructField("pred_id", StringType()),
        StructField("obj_id", StringType()),
        StructField("is_literal", BooleanType()),
        StructField("content_sha256", StringType()),
    ]
)

# Output of canonicalizer.salted_mention_counts (the nodes stage).
NODES = StructType(
    [
        StructField("canonical_key", StringType()),
        StructField("node_id", StringType()),
        StructField("n_mentions", LongType()),
        StructField("n_docs", LongType()),
        StructField("aliases", ArrayType(StringType())),
    ]
)

EDGES = StructType(
    [
        StructField("src_id", StringType()),
        StructField("pred_id", StringType()),
        StructField("dst_id", StringType()),
        StructField("is_literal", BooleanType()),
        StructField("src_uri", StringType()),
        StructField("pred_uri", StringType()),
        StructField("dst_uri", StringType()),
        StructField("weight", LongType()),
    ]
)

ADJACENCY = StructType(
    [
        StructField("node_id", StringType()),
        StructField(
            "out",
            ArrayType(
                StructType(
                    [
                        StructField("pred_id", StringType()),
                        StructField("dst_id", StringType()),
                    ]
                )
            ),
        ),
        StructField("out_degree", IntegerType()),
    ]
)

# Per-partition progress + lineage for checkpoint/resume (north_rule).
MANIFEST = StructType(
    [
        StructField("run_id", StringType()),
        StructField("stage", StringType()),
        StructField("status", StringType()),  # committed | failed
        StructField("rows_in", LongType()),
        StructField("rows_out", LongType()),
        StructField("snapshot_id", LongType()),
        StructField("wall_sec", DoubleType()),
        StructField("updated_at", TimestampType()),
    ]
)
