"""Router fan-out — per-sink partitioned writes.

The reference fans out one output file per (id, session)
(``/root/reference/datadecoder/.../DataPumpDecoderSort.java:93-97``), written
serially by one thread. Here the fan-out is a single partitioned write:

    enriched.write.partitionBy("sink")

**Zero extra shuffle by default.** The pipeline's reassembly exchange already
spread rows uniformly over tasks by hash(doc_id, session) — a distribution
that is immune to hot-*source* skew (a hot source's rows still scatter across
all tasks). ``partitionBy("sink")`` then has every task write one file per
sink it sees; no task is a straggler, and re-shuffling ~all pipeline bytes a
second time just to cluster by sink would double shuffle I/O at 10^12-row
scale for zero correctness gain.

``cluster_by_sink=True`` is the opt-in layout pass for when the *stored*
layout matters more than write throughput (few large files per sink →
cheaper downstream scans/compaction). That path is where hot-sink skew
exists, so it salts: ``repartition(n, sink, xxhash64(doc_id) % n_salts)``
spreads a hot sink over ``n_salts`` writer tasks while keeping each output
file single-sink (north star: "salted repartitioning to defuse hot-source
skew").

``partitionBy("sink")`` gives per-sink directories = per-sink tables;
readers get partition pruning on sink for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_write(
    enriched: DataFrame,
    out_dir: str,
    mode: str = "overwrite",
    cluster_by_sink: bool = False,
    n_partitions: int = 32,
    n_salts: int = 8,
) -> None:
    df = enriched
    if cluster_by_sink:
        df = df.repartition(
            n_partitions, F.col("sink"), (F.xxhash64("doc_id") % n_salts)
        )
    df.write.mode(mode).partitionBy("sink").parquet(out_dir)


def read_sink(spark_df_reader, out_dir: str, sink: str) -> DataFrame:
    """Partition-pruned read of one sink's table."""
    return spark_df_reader.parquet(out_dir).where(F.col("sink") == sink)
