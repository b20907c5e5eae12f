"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (full parse → gate → reassemble → enrich
pipeline) on sf0.001. ``queries()`` / ``oracle_sql()`` — the per-operator
correctness gate; implementations live in
``log_aggregator_spark/entry_queries.py`` and
``log_aggregator_spark/oracle_sql.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from log_aggregator_spark.entry_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end pipeline's enriched output on sf0.001."""
    return QUERIES["pipeline_enriched"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
