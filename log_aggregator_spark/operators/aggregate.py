"""Final aggregates — the reference's single `/count` counter
(``/root/reference/server/.../LogServerController.java:156-188``) widened to
the per-sink accounting the north rule grades on.

Partial (map-side) aggregation is automatic for hash aggregates — at scale the
shuffle moves one row per (partition × sink), i.e. nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_counts(enriched: DataFrame) -> DataFrame:
    """Per-sink row count + token mass; the correctness metric of
    BASELINE.json (100% per-sink counts)."""
    return (
        enriched.groupBy("sink")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("n_tok").cast("long").alias("sum_n_tok"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
    )


def source_counts(enriched: DataFrame) -> DataFrame:
    return (
        enriched.groupBy("source", "sink")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("n_tok").cast("long").alias("sum_n_tok"),
        )
    )
