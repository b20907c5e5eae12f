from __future__ import annotations

import pandas as pd
import pytest

from log_aggregator_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


def make_chunks(rows):
    """rows: (doc_id, session, seq, chunk_tokens, source)."""
    return pd.DataFrame(
        rows, columns=["doc_id", "session", "seq", "chunk_tokens", "source"]
    )


def chunks_df(spark, rows):
    pdf = make_chunks(rows)
    return spark.createDataFrame(
        pdf,
        schema="doc_id string, session long, seq long, chunk_tokens array<int>, source string",
    )
