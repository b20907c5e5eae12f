"""Partition pruning on a date-partitioned stored layout: a day-range
filter must prune at the MANIFEST level (PartitionFilters in the scan),
reading only the matching directories — at 100 TB the difference between
scanning one day and scanning three years. Complements PLANS.md's column
pruning with directory-level pruning on the standard events layout."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


def _partition_filters(plan: str) -> str:
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    return m.group(1) if m else ""


@pytest.fixture()
def partitioned_events(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(path)
    return spark.read.parquet(path)


def test_day_filter_prunes_partitions(spark, partitioned_events):
    days = [r["day"] for r in partitioned_events.select("day").distinct().collect()]
    assert len(days) > 1, "fixture must span multiple days"
    target = sorted(days)[0]
    q = partitioned_events.where(F.col("day") == F.lit(target)).select(
        "event_id", "event_type"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the day predicate must land in PartitionFilters (manifest pruning),
    # not merely PushedFilters (row-group skipping) or a post-scan Filter
    pf = _partition_filters(plan)
    assert str(target) in pf, plan[:1200]
    n_all = partitioned_events.count()
    n_day = q.count()
    assert 0 < n_day < n_all


def test_unpartitioned_filter_does_not_prune(spark, tmp_path):
    """Control: the same data flat-written has empty PartitionFilters —
    the pruning above comes from the layout, not the predicate."""
    path = str(tmp_path / "events_flat")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.withColumn("day", F.to_date("ts")).write.parquet(path)
    flat = spark.read.parquet(path)
    target = flat.select(F.min("day")).first()[0]
    q = flat.where(F.col("day") == F.lit(target))
    plan = q._jdf.queryExecution().executedPlan().toString()
    # flat layout: the PartitionFilters list must be empty — the predicate
    # only reaches PushedFilters (row-group skipping, not file pruning)
    assert str(target) not in _partition_filters(plan)
    assert str(target) in plan  # ...but it did push down
