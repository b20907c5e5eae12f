"""Resumable batch job — the ``spark-submit`` entrypoint tying the pipeline
to the snapshot-table storage layer.

Each invocation is one "directory pass" of the reference decoder
(``/root/reference/datadecoder/.../DataPumpDecoderSort.java:103-181``),
promoted to a cluster batch job:

1. read NEW chunk rows (incremental scan of the chunks table since the last
   processed snapshot) plus the HELD cache (chunks previous runs could not
   consume — the reference's "cache grows" files, ``datadecoder/README.md:13-15``),
2. run parse → gate/reassemble → enrich against the persisted checkpoint
   table (``SequenceTracker`` analog),
3. commit, atomically per table: routed output (append), new checkpoint
   state (overwrite, carrying the processed-snapshot watermark in its
   manifest lineage), the new held cache (overwrite), and a metrics/lineage
   snapshot (append).

Crash safety: every commit is an atomic manifest swap (``tableio.py``); a
crash between commits re-runs the same pass — the checkpoint table is the
LAST thing advanced... actually ordering here is: routed append happens
before the checkpoint overwrite, so a crash in between would re-append on
retry. The run_id column (= chunks snapshot processed) makes such replays
detectable and idempotent to readers: ``SELECT ... QUALIFY row_number()
OVER (PARTITION BY doc_id, session, run_id ...) = 1`` or simply the fact
that a re-run of run_id N rewrites identical rows (deterministic
transforms, per SURVEY.md §7 hard part 2). The reference has the same
window, documented at ``DataPumpDecoderSort.java:48-51`` — duplicate
append between payload-append and ``.lastSeq`` write; we keep its
*intended* semantics and make replays detectable.

Output invariant (tested in tests/test_job_resume.py): for every
(doc_id, session), the concatenation of routed token segments in run order
equals the single-run reassembly of all chunks — byte-exact (the system
invariant of the reference's end-to-end test, ``README.md:93-104``).
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import lineage_records
from .operators.reassemble import held_back_full
from .plans.pipeline import run_pipeline
from .tableio import SnapshotTable


class JobState:
    """The three state tables a deployment owns, rooted at ``state_dir``."""

    def __init__(self, state_dir: str) -> None:
        self.checkpoint = SnapshotTable(f"{state_dir}/checkpoint")
        self.held = SnapshotTable(f"{state_dir}/held")
        self.metrics = SnapshotTable(f"{state_dir}/metrics")
        self.routed = SnapshotTable(f"{state_dir}/routed")


def run_job(
    spark: SparkSession,
    chunks_table: SnapshotTable,
    routes: DataFrame,
    state: JobState,
) -> dict:
    """One resumable pass. Returns a run summary dict."""
    t_start = time.perf_counter()
    last_processed = None
    ckpt_df = None
    if state.checkpoint.exists():
        last_processed = state.checkpoint.lineage().get("chunks_snapshot")
        ckpt_df = state.checkpoint.read(spark)

    current_snap = chunks_table.current_snapshot()
    new_chunks = chunks_table.read_incremental(spark, last_processed)
    if new_chunks is None and not state.held.exists():
        return {"run_id": None, "status": "no_new_data"}

    from .operators.parse import parse_envelope

    parsed_parts = []
    if new_chunks is not None:
        parsed_parts.append(parse_envelope(new_chunks))
    if state.held.exists():
        parsed_parts.append(state.held.read(spark))
    parsed = parsed_parts[0]
    for p in parsed_parts[1:]:
        parsed = parsed.unionByName(p)

    # lineage scan over this pass's *new* input (metrics, not on the hot path)
    lin = (
        lineage_records(new_chunks) if new_chunks is not None
        else spark.createDataFrame([], schema="partition_id int, input_file string, n_rows long, n_bytes long, wall_ms long")
    )

    run_id = current_snap or 0
    res = run_pipeline_from_parsed(parsed, routes, ckpt_df)

    enriched = res.enriched.withColumn("run_id", F.lit(run_id).cast("long"))
    state.routed.commit(enriched, mode="append",
                        lineage={"run_id": run_id})

    # checkpoint merge: streams that emitted this run advance; the rest keep
    # their old state. Broadcast-friendly (one row per live stream).
    new_ckpt = res.checkpoint_out
    if ckpt_df is not None:
        keep = ckpt_df.join(
            new_ckpt.select("doc_id", "session"), ["doc_id", "session"],
            "left_anti",
        )
        new_ckpt = new_ckpt.unionByName(keep)
    state.checkpoint.commit(
        new_ckpt, mode="overwrite",
        lineage={"chunks_snapshot": current_snap, "run_id": run_id},
    )
    state.held.commit(res.held_full, mode="overwrite",
                      lineage={"run_id": run_id})

    wall = time.perf_counter() - t_start
    summary_df = lin.withColumn("run_id", F.lit(run_id).cast("long"))
    state.metrics.commit(summary_df, mode="append",
                         lineage={"run_id": run_id, "wall_sec": wall})
    counts = {r["sink"]: r["n_rows"] for r in res.counts.collect()}
    return {
        "run_id": run_id,
        "status": "ok",
        "wall_sec": round(wall, 3),
        "sink_counts": counts,
    }


def run_pipeline_from_parsed(parsed, routes, ckpt_df):
    """run_pipeline, but starting from already-parsed chunk rows (the job
    unions freshly-parsed new data with the held cache, which is stored
    parsed)."""
    from dataclasses import dataclass

    from .operators.aggregate import sink_counts
    from .operators.enrich import enrich
    from .operators.reassemble import reassemble_sql

    reassembled = reassemble_sql(parsed, ckpt_df)
    enriched = enrich(reassembled, routes)

    @dataclass
    class R:
        reassembled: DataFrame
        enriched: DataFrame
        counts: DataFrame
        checkpoint_out: DataFrame
        held_full: DataFrame

    return R(
        reassembled=reassembled,
        enriched=enriched,
        counts=sink_counts(enriched),
        checkpoint_out=reassembled.selectExpr(
            "doc_id", "session", "last_seq_out as last_seq"
        ),
        held_full=held_back_full(parsed, ckpt_df),
    )


def main() -> None:  # pragma: no cover - exercised via spark-submit
    p = argparse.ArgumentParser(description="resumable log-aggregator pass")
    p.add_argument("--chunks", required=True, help="chunks SnapshotTable root")
    p.add_argument("--routes", required=True, help="routes parquet path")
    p.add_argument("--state", required=True, help="state dir (checkpoint/held/metrics/routed)")
    args = p.parse_args()

    from .session import get_spark

    spark = get_spark("log_aggregator_job")
    summary = run_job(
        spark,
        SnapshotTable(args.chunks),
        spark.read.parquet(args.routes),
        JobState(args.state),
    )
    print(summary)
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
