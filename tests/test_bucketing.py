"""Bucketed-layout co-location: joins and aggregations on the bucket key
must plan with ZERO shuffle Exchange when both sides carry the same bucket
spec (the storage-side answer to 'is there a shuffle here that becomes the
bottleneck at 1000x' — pre-shuffle once at write, never again)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from log_aggregator_spark.tableio import write_bucketed


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # shuffle exchanges only; BroadcastExchange moves a dim table, not data
    return len(re.findall(r"Exchange hashpartitioning", plan))


@pytest.fixture()
def bucketed_pair(spark):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("score")
    )
    right = spark.range(0, 10_000, 3).select(
        F.col("id").alias("doc_id"), F.lit("keep").alias("tag")
    )
    write_bucketed(left, "bt_left", "doc_id", 8, sort_cols=("doc_id",))
    write_bucketed(right, "bt_right", "doc_id", 8, sort_cols=("doc_id",))
    yield spark.table("bt_left"), spark.table("bt_right")
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    left, right = bucketed_pair
    with _no_broadcast(spark):
        joined = left.join(right, "doc_id")
        assert _shuffles(joined) == 0, "co-bucketed join must not shuffle"
        assert joined.count() == 3334  # ids 0,3,...,9999


def test_bucketed_groupby_is_shuffle_free(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = left.groupBy("doc_id").agg(F.sum("score").alias("s"))
    assert _shuffles(agg) == 0, "groupBy on the bucket key must not shuffle"
    assert agg.count() == 10_000


def test_unbucketed_join_shuffles_as_baseline(spark, bucketed_pair):
    """Control: the same join WITHOUT the bucketed layout pays exchanges —
    proving the zero above comes from the layout, not from AQE."""
    left, right = bucketed_pair
    plain_l = left.select("doc_id", "score").repartition(8)
    plain_r = right.select("doc_id", "tag").repartition(8)
    with _no_broadcast(spark):
        assert _shuffles(plain_l.join(plain_r, "doc_id")) > 0


class _no_broadcast:
    """Force sort-merge joins so the assertion targets the shuffle, not a
    broadcast fallback (restores the session threshold on exit)."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)
