"""Runtime skew defusal: AQE must split a hot join partition (the README's
'hot sources scatter via AQE skew-join' claim, made checkable). A 90%-hot
key under a sort-merge join becomes 'AQEShuffleRead ... skewed' in the
FINAL adaptive plan — the runtime answer to a skewed shuffle no static
plan can fix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ: skew path
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
}


@pytest.fixture()
def skew_confs(spark):
    prev = {k: spark.conf.get(k) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        spark.conf.set(k, v)


def test_aqe_splits_hot_join_partition(spark, skew_confs):
    left = spark.range(0, 500_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit("dim").alias("tag")
    )
    j = left.join(right, "k").groupBy().count()
    (row,) = j.collect()
    assert row["count"] == 450_100
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # the hot (left) side's shuffle read must carry the skew-split marker
    assert any(
        "AQEShuffleRead" in line and "skewed" in line
        for line in plan.splitlines()
    ), plan[:1500]
