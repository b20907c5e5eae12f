"""Router fan-out — per-sink partitioned writes with salted repartitioning.

The reference fans out one output file per (id, session)
(``/root/reference/datadecoder/.../DataPumpDecoderSort.java:93-97``), written
serially by one thread. Here the fan-out is a single partitioned write:

    df.repartition(n, sink, salt).write.partitionBy("sink")

The salt defuses hot-sink skew (north rule: one source can hold 50% of rows →
its sink would be one straggler task). ``hash(doc_id) % n_salts`` spreads a hot
sink over ``n_salts`` tasks while keeping each output file single-sink.
``partitionBy("sink")`` gives per-sink directories = per-sink tables; readers
get partition pruning on sink for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_write(
    enriched: DataFrame,
    out_dir: str,
    n_partitions: int = 32,
    n_salts: int = 8,
    mode: str = "overwrite",
) -> None:
    salted = enriched.repartition(
        n_partitions, F.col("sink"), (F.xxhash64("doc_id") % n_salts)
    )
    (
        salted.withColumn("tokens", F.col("tokens"))
        .write.mode(mode)
        .partitionBy("sink")
        .parquet(out_dir)
    )


def read_sink(spark_df_reader, out_dir: str, sink: str) -> DataFrame:
    """Partition-pruned read of one sink's table."""
    return spark_df_reader.parquet(out_dir).where(F.col("sink") == sink)
