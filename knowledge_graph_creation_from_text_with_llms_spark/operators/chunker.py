"""Chunker: source documents → fixed-size text chunks.

Reproduces the reference's greedy sentence-packing fold
(/root/reference/src/core/Extractor/Extractor.py:72-93): accumulate
units into the current chunk while len(chunk) + len(unit) + 1 <=
chunk_size, else flush and start a new chunk with the unit; flush the
trailing chunk. Units are sentences (regex splitter — the reference
uses NLTK punkt; we stay dependency-light and deterministic) or
whitespace words for punctuation-free corpora.

The fold is inherently sequential *within* a document but embarrassingly
parallel *across* documents, so it vectorizes as a scalar pandas UDF:
one Arrow batch in, one array<string> column out, then posexplode to
(chunk_id, text) rows. At 100 TB this is a map-only stage — no shuffle;
partition parallelism comes from the source scan.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    """Deterministic sentence split: break after ./!/? + whitespace."""
    if not text:
        return []
    return [s for s in _SENT_SPLIT.split(text) if s]


def greedy_pack(units: list[str], chunk_size: int) -> list[str]:
    """Exact reference fold (Extractor.py:79-87), including the quirk
    that an oversized first unit flushes the (empty) current chunk —
    we drop empty chunks at the end rather than writing empty files."""
    chunks: list[str] = []
    current = ""
    for unit in units:
        if len(current) + len(unit) + 1 <= chunk_size:
            current = current + " " + unit if current else unit
        else:
            chunks.append(current)
            current = unit
    if current:
        chunks.append(current)
    return [c for c in chunks if c]


def chunk_array_udf(chunk_size: int, unit: str = "sentence"):
    """Factory: scalar pandas UDF text -> array<string> of chunks."""

    def _split(text: str) -> list[str]:
        if unit == "word":
            # same tokenization as functions.text.tokens_expr so the
            # DuckDB oracle can reproduce the fold from SQL tokens
            units = re.findall(r"[a-z0-9]+", (text or "").lower())
        else:
            units = split_sentences(text or "")
        return greedy_pack(units, chunk_size)

    @F.pandas_udf(ArrayType(StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(_split)

    return _udf


def chunk_documents(
    source: DataFrame,
    chunk_size: int = 500,
    unit: str = "sentence",
    text_col: str = "content",
    carry_cols: tuple[str, ...] = (
        "doc_id",
        "repo",
        "path",
        "commit",
        "lang",
        "content_sha256",
    ),
) -> DataFrame:
    """source → chunks(doc_id, …, chunk_id, text). chunk_id is 1-based
    to match the reference's chunk_{i}.txt numbering
    (Extractor.py:95-106)."""
    keep = [c for c in carry_cols if c in source.columns]
    arr = chunk_array_udf(chunk_size, unit)(F.col(text_col))
    exploded = source.select(*keep, F.posexplode(arr).alias("pos", "text"))
    return exploded.select(
        *keep, (F.col("pos") + F.lit(1)).cast("int").alias("chunk_id"), "text"
    )
