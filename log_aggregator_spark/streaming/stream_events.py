"""Structured-Streaming form of the events/telemetry analytics — the
shapes ``functions/events.py`` documents as mapping 1:1 onto streaming:

* ``stream_tumbling_counts`` — event-time tumbling windows via
  ``F.window`` with a watermark: late events inside the watermark are
  merged into their window's running aggregate; events later than the
  watermark are dropped (the documented bound on state).
* ``stream_sessionize`` — gap-based sessions via ``F.session_window``
  (same 30-min inactivity gap as the batch ``sessionize``): Spark merges
  adjacent micro-batch sessions in the state store, keyed by
  (user_id, session window) — a hot user costs one group's state.

Both are standard watermarked streaming aggregations: state is bounded by
the watermark horizon (closed windows are evicted after emission), partial
aggregation happens map-side per micro-batch, and the shuffle key
(window/session × group key) is the same key the batch plan shuffles on —
the streaming form adds state, not a new data layout.

Parity with the batch family is tested in tests/test_streaming.py
(complete-mode memory sink vs the batch aggregates on identical input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.events import SESSION_GAP_SEC

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)


def stream_tumbling_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Per (hour window, event_type) running counts/sums.
    (hour_epoch, event_type, n_events, sum_value_x100).
    ``countDistinct`` is not available in streaming aggregation — the
    distinct-users column of the batch twin becomes
    ``approx_count_distinct`` territory and is deliberately omitted here
    rather than silently approximated."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value") * 100, 0).cast("long").alias("sum_value_x100"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value_x100",
        )
    )


def stream_sessionize(
    events: DataFrame, gap_sec: int = SESSION_GAP_SEC, watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions per user via ``session_window``.
    (user_id, start_epoch, end_epoch_max, n_events) — end_epoch_max is the
    max event time (the batch twin's end_epoch), not the window's close
    (which session_window pads by the gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_sec} seconds"), "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.unix_timestamp(F.max("ts")).alias("end_epoch_max"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("start_epoch"),
            "end_epoch_max",
            "n_events",
        )
    )
