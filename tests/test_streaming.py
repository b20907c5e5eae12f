"""Structured-Streaming gate oracles: the streaming pipeline must agree with
the batch pipeline segment-for-segment, including gap-fill across
micro-batches and exactly-once emission across restarts (checkpointLocation).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from log_aggregator_spark import chunker
from log_aggregator_spark.operators.parse import encode_envelope
from log_aggregator_spark.plans.pipeline import run_pipeline
from log_aggregator_spark.streaming import stream_reassemble

from conftest import SF_DIR


def _write_batch(df, path):
    df.write.mode("append").parquet(path)


def _drain(spark, chunks_dir, ckpt, out):
    q = (
        stream_reassemble(spark, chunks_dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _segments(spark, out) -> pd.DataFrame:
    pdf = (
        spark.read.schema(
            "doc_id string, session long, tokens array<int>, n_tok long, "
            "source string, last_seq_out long"
        )
        .parquet(out)
        .toPandas()
    )
    pdf["tokens"] = pdf["tokens"].map(list)
    return pdf


def test_streaming_matches_batch_single_batch(spark, tmp_path):
    docs = chunker.load_documents(spark, SF_DIR).limit(60)
    chunks = chunker.chunks(docs)
    cdir = str(tmp_path / "chunks")
    _write_batch(chunks, cdir)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, cdir, ckpt, out)

    got = (
        _segments(spark, out)
        .sort_values(["doc_id", "session"])
        .reset_index(drop=True)[["doc_id", "session", "tokens", "last_seq_out"]]
    )
    want = (
        run_pipeline(chunks, chunker.routes_table(docs))
        .reassembled.select("doc_id", "session", "tokens", "last_seq_out")
        .toPandas()
        .sort_values(["doc_id", "session"])
        .reset_index(drop=True)
    )
    want["tokens"] = want["tokens"].map(list)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_gap_fill_across_microbatches(spark, tmp_path):
    rows = pd.DataFrame(
        {
            "doc_id": ["d"] * 4,
            "session": [10] * 4,
            "seq": [1, 2, 4, 3],
            "chunk_tokens": [[1], [2], [4], [3]],
            "source": ["s"] * 4,
        }
    )
    full = spark.createDataFrame(
        rows,
        schema="doc_id string, session long, seq long, chunk_tokens array<int>, source string",
    )
    env = encode_envelope(full).select("envelope", "chunk_tokens", "source")
    cdir, out, ckpt = (str(tmp_path / p) for p in ("chunks", "out", "ckpt"))

    # micro-batch 1: gap at 3 → emit [1,2], hold 4 in state
    _write_batch(env.where(F.col("chunk_tokens")[0] != 3), cdir)
    _drain(spark, cdir, ckpt, out)
    seg = _segments(spark, out)
    assert [list(t) for t in seg["tokens"]] == [[1, 2]]

    # micro-batch 2 (same checkpoint → state restored): 3 arrives → [3,4]
    _write_batch(env.where(F.col("chunk_tokens")[0] == 3), cdir)
    _drain(spark, cdir, ckpt, out)
    seg = _segments(spark, out).sort_values("last_seq_out")
    assert [list(t) for t in seg["tokens"]] == [[1, 2], [3, 4]]
    assert list(seg["last_seq_out"]) == [2, 4]

    # re-drain with no new data: nothing re-emitted (exactly-once)
    _drain(spark, cdir, ckpt, out)
    assert len(_segments(spark, out)) == 2


def test_streaming_enrich_broadcast(spark, tmp_path):
    docs = chunker.load_documents(spark, SF_DIR).limit(20)
    chunks = chunker.chunks(docs)
    cdir = str(tmp_path / "chunks")
    _write_batch(chunks, cdir)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream_reassemble(spark, cdir, routes=chunker.routes_table(docs))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .partitionBy("sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    routed = spark.read.parquet(out)
    assert "sink" in routed.columns
    assert routed.count() > 0
    batch = run_pipeline(chunks, chunker.routes_table(docs)).enriched
    assert routed.count() == batch.count()
