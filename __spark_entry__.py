"""Driver contract for the spark-graft builder (PySpark target).

`entry` runs the flagship KG materialization (documents → mention
bigram triples → dictionary link → edges) at sf0.001. `queries` /
`oracle_sql` expose every gate query implemented in
knowledge_graph_creation_from_text_with_llms_spark.gate, each paired
with an exact DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from knowledge_graph_creation_from_text_with_llms_spark import gate


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gate.kg_edges(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data operators (dedup / similarity / text analysis)."""
    return dict(gate.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column names."""
    return dict(gate.ORACLES)
