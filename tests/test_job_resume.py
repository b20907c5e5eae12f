"""Resumable-job oracles (SURVEY.md §5.2 item 5 + §7 hard part 1).

The system invariant (reference's end-to-end golden test, README.md:93-104):
after any sequence of incremental passes, the per-(doc_id, session)
concatenation of routed token segments in run order equals the single-run
reassembly of all chunks — and the final checkpoint/held state matches.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from log_aggregator_spark import chunker
from log_aggregator_spark.job import JobState, run_job
from log_aggregator_spark.operators.parse import encode_envelope
from log_aggregator_spark.plans.pipeline import run_pipeline
from log_aggregator_spark.tableio import SnapshotTable

from conftest import SF_DIR


@pytest.fixture()
def docs(spark):
    return chunker.load_documents(spark, SF_DIR)


def _routes(docs):
    return chunker.routes_table(docs)


def _segments(state: JobState, spark) -> pd.DataFrame:
    """Concatenate routed token segments per stream in run order."""
    routed = state.routed.read(spark)
    return (
        routed.groupBy("doc_id", "session")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("run_id", "tokens"))),
                    lambda s: s["tokens"],
                )
            ).alias("tokens"),
            F.first("source").alias("source"),
            F.first("sink").alias("sink"),
        )
        .toPandas()
        .sort_values(["doc_id", "session"])
        .reset_index(drop=True)
    )


def test_tableio_snapshot_commit_and_incremental(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df1 = spark.range(5).select(F.col("id").alias("x"))
    df2 = spark.range(5, 8).select(F.col("id").alias("x"))
    s1 = t.commit(df1)
    s2 = t.commit(df2)
    assert (s1, s2) == (1, 2)
    assert t.read(spark).count() == 8
    assert t.read(spark, snapshot=1).count() == 5
    inc = t.read_incremental(spark, since=1)
    assert inc is not None and sorted(r["x"] for r in inc.collect()) == [5, 6, 7]
    assert t.read_incremental(spark, since=2) is None
    # overwrite replaces visible state, keeps history
    t.commit(df1, mode="overwrite", lineage={"mark": 42})
    assert t.read(spark).count() == 5
    assert t.lineage()["mark"] == 42


def test_two_pass_job_equals_single_run(spark, docs, tmp_path):
    """Split the chunk corpus into two snapshots; two job passes must
    reproduce the one-shot pipeline byte-exactly."""
    chunks = chunker.chunks(docs)
    routes = _routes(docs)

    # Prefix-respecting split (agent ships oldest-first): per stream, seqs
    # ≤ 2 arrive in snapshot 1, the rest in snapshot 2. A hash split would
    # be a DIFFERENT (also valid) history: the init rule accepts any first
    # seq when state is empty, so a batch that starts mid-stream changes
    # the output exactly as it would in the reference — that case is
    # covered by test_midstream_init_across_runs below.
    seq = F.regexp_extract("envelope", r"_(\d+)\.pbData$", 1).cast("long")
    batch1 = chunks.where(seq <= 2)
    batch2 = chunks.where(seq > 2)

    ct = SnapshotTable(str(tmp_path / "chunks"))
    state = JobState(str(tmp_path / "state"))

    ct.commit(batch1)
    r1 = run_job(spark, ct, routes, state)
    assert r1["status"] == "ok"
    ct.commit(batch2)
    r2 = run_job(spark, ct, routes, state)
    assert r2["status"] == "ok" and r2["run_id"] != r1["run_id"]

    got = _segments(state, spark)

    want = (
        run_pipeline(chunks, routes, checkpoint=None)
        .reassembled.select("doc_id", "session", "tokens", "source")
        .toPandas()
        .sort_values(["doc_id", "session"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["doc_id", "session", "tokens"]].reset_index(drop=True),
        want[["doc_id", "session", "tokens"]].reset_index(drop=True),
    )

    # final checkpoint equals the one-shot checkpoint_out
    final_ckpt = (
        state.checkpoint.read(spark).toPandas()
        .sort_values(["doc_id", "session"]).reset_index(drop=True)
    )
    want_ckpt = (
        run_pipeline(chunks, routes).checkpoint_out.toPandas()
        .sort_values(["doc_id", "session"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(final_ckpt, want_ckpt, check_dtype=False)

    # held state: same streams/seqs as the one-shot held set
    held = state.held.read(spark).select("doc_id", "session", "seq")
    want_held = run_pipeline(chunks, routes).held
    assert sorted(map(tuple, held.collect())) == sorted(
        map(tuple, want_held.collect())
    )


def test_gap_fill_across_runs(spark, tmp_path):
    """A gap in run 1 is filled by run 2 → the suffix is emitted exactly
    once, in run 2 (SequenceTracker + cache-grows semantics)."""
    pdf = pd.DataFrame(
        {
            "doc_id": ["d"] * 4,
            "session": [10] * 4,
            "seq": [1, 2, 4, 3],
            "chunk_tokens": [[1], [2], [4], [3]],
            "source": ["src1"] * 4,
        }
    )
    full = spark.createDataFrame(
        pdf, schema="doc_id string, session long, seq long, chunk_tokens array<int>, source string"
    )
    routes = spark.createDataFrame(
        [("src1", "sinkA", 0)], schema="source string, sink string, priority int"
    )
    ct = SnapshotTable(str(tmp_path / "chunks"))
    state = JobState(str(tmp_path / "state"))

    ct.commit(encode_envelope(full.where(F.col("seq") != 3)).select(
        "envelope", "chunk_tokens", "source"))
    r1 = run_job(spark, ct, routes, state)
    seg1 = state.routed.read(spark).toPandas()
    assert [list(t) for t in seg1["tokens"]] == [[1, 2]]  # seq 4 held behind the gap

    ct.commit(encode_envelope(full.where(F.col("seq") == 3)).select(
        "envelope", "chunk_tokens", "source"))
    r2 = run_job(spark, ct, routes, state)
    seg2 = state.routed.read(spark).toPandas()
    seg2 = seg2[seg2["run_id"] == r2["run_id"]]
    assert [list(t) for t in seg2["tokens"]] == [[3, 4]]  # gap filled → suffix once

    # nothing held, checkpoint at 4
    assert state.held.read(spark).count() == 0
    ck = state.checkpoint.read(spark).collect()
    assert len(ck) == 1 and ck[0]["last_seq"] == 4

    # idempotent third pass: no new data → no output
    r3 = run_job(spark, ct, routes, state)
    assert r3["status"] in ("no_new_data", "ok")
    seg3 = state.routed.read(spark)
    assert seg3.count() == 2  # unchanged


def test_midstream_init_across_runs(spark, tmp_path):
    """If the first batch starts mid-stream (seq 3), the init rule anchors
    there — a later batch delivering seqs 1-2 must be treated as stale
    (DataPumpDecoderSort.java:167-174: last==0 accepts ANY first seq; after
    that, 1-2 < last are consumed-or-stale)."""
    pdf = pd.DataFrame(
        {
            "doc_id": ["d"] * 4,
            "session": [10] * 4,
            "seq": [3, 4, 1, 2],
            "chunk_tokens": [[3], [4], [1], [2]],
            "source": ["src1"] * 4,
        }
    )
    full = spark.createDataFrame(
        pdf, schema="doc_id string, session long, seq long, chunk_tokens array<int>, source string"
    )
    routes = spark.createDataFrame(
        [("src1", "sinkA", 0)], schema="source string, sink string, priority int"
    )
    ct = SnapshotTable(str(tmp_path / "chunks"))
    state = JobState(str(tmp_path / "state"))

    ct.commit(encode_envelope(full.where(F.col("seq") >= 3)).select(
        "envelope", "chunk_tokens", "source"))
    run_job(spark, ct, routes, state)
    ct.commit(encode_envelope(full.where(F.col("seq") <= 2)).select(
        "envelope", "chunk_tokens", "source"))
    run_job(spark, ct, routes, state)

    got = _segments(state, spark)
    assert [list(t) for t in got["tokens"]] == [[3, 4]]
    ck = state.checkpoint.read(spark).collect()
    assert len(ck) == 1 and ck[0]["last_seq"] == 4
    assert state.held.read(spark).count() == 0


def test_lineage_metrics_recorded(spark, docs, tmp_path):
    chunks = chunker.chunks(docs)
    ct = SnapshotTable(str(tmp_path / "chunks"))
    state = JobState(str(tmp_path / "state"))
    ct.commit(chunks)
    run_job(spark, ct, _routes(docs), state)
    m = state.metrics.read(spark).toPandas()
    assert {"partition_id", "input_file", "n_rows", "n_bytes", "wall_ms"}.issubset(m.columns)
    assert m["n_rows"].sum() == chunks.count()
    assert (m["n_bytes"] > 0).all()
    assert state.metrics.lineage()["wall_sec"] > 0
