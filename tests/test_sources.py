"""Source-format round trips: every reader must land on the canonical chunk
schema and produce IDENTICAL pipeline output to the parquet path — source
choice must be invisible downstream of parse."""

from __future__ import annotations

import pandas as pd
import pytest

from log_aggregator_spark import chunker, sources
from log_aggregator_spark.plans.pipeline import run_pipeline

from conftest import SF_DIR


@pytest.fixture(scope="module")
def chunk_df(spark):
    docs = chunker.load_documents(spark, SF_DIR).limit(40)
    return chunker.chunks(docs).cache()


def _result(spark, chunks):
    docs = chunker.load_documents(spark, SF_DIR).limit(40)
    r = run_pipeline(chunks, chunker.routes_table(docs)).reassembled
    pdf = r.select("doc_id", "session", "tokens", "n_tok", "source").toPandas()
    pdf["tokens"] = pdf["tokens"].map(list)
    return pdf.sort_values(["doc_id", "session"]).reset_index(drop=True)


@pytest.mark.parametrize("fmt", ["pbdata", "jsonl", "csv"])
def test_source_round_trip_matches_parquet_path(spark, tmp_path, chunk_df, fmt):
    want = _result(spark, chunk_df)
    path = str(tmp_path / fmt)
    writer = getattr(sources, f"write_chunks_{fmt}")
    reader = getattr(sources, f"read_chunks_{fmt}")
    writer(chunk_df, path)
    got_chunks = reader(spark, path)
    assert got_chunks.columns == ["envelope", "chunk_tokens", "source"]
    got = _result(spark, got_chunks)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pbdata_envelope_is_filename(spark, tmp_path, chunk_df):
    """The reference's contract: the envelope IS the file name."""
    path = str(tmp_path / "pb")
    sources.write_chunks_pbdata(chunk_df.limit(5), path)
    import os

    names = sorted(os.listdir(path))
    assert all(n.endswith(".pbData") for n in names)
    got = sources.read_chunks_pbdata(spark, path)
    assert sorted(r["envelope"] for r in got.collect()) == names


def test_pbdata_bad_magic_fails_loudly():
    with pytest.raises(ValueError, match="bad pbdata magic"):
        sources._decode_pbdata_bytes(b"XXXX\x00\x00\x00\x00")
