"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE on, skew-join handling,
Arrow batching for the UDF stages) while remaining correct on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Let AQE re-plan at runtime: coalesce small shuffle partitions,
    # split skewed ones (hub entities are the known skew source).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF boundary; batch size bounds extractor
    # micro-batches (the LLM-backend unit of work).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    # Dictionaries (entity/property alias tables) are small; make sure
    # the planner broadcasts them rather than shuffling the fact side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    # Stable shuffle width for the local harness; a real cluster run
    # overrides via spark-submit --conf (see bench.py / plans.pipeline).
    "spark.sql.shuffle.partitions": "32",
    # InferFiltersFromGenerate turns every explode(computed_array) into
    # an inferred `size(arr) > 0 AND isnotnull(arr)` predicate that
    # predicate-pushdown then sinks below any repartition with the full
    # array-building expression INLINED — the tokenize/shingle/digest
    # pipeline re-evaluated interpreted inside a Filter, at the raw
    # scan's parallelism, per inferred conjunct (measured: the ngram
    # inverted-index explode went 53 s -> 5 s at sf1.0 with the rule
    # off). The inferred filter only prunes rows whose explode emits
    # nothing, so excluding it cannot change any result; this engine
    # explodes computed arrays everywhere, so the rule is a pure loss.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "kg-spark",
    master: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    master resolution order: explicit arg > $SPARK_GRAFT_MASTER >
    local[$SPARK_GRAFT_CPUS] > local[*].
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
