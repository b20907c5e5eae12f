"""Local replica of the driver's correctness gate: every queries() entry runs
in Spark AND its oracle_sql() twin runs in DuckDB on the same sf0.01 parquet,
then row counts, column names and values must match exactly (order-insensitive,
columns sorted by name — same procedure the driver uses)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from conftest import SF01_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str, sf_dir: str = SF01_DIR) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith(("int", "Int", "uint")):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)


def _query_names():
    import __spark_entry__ as e

    return sorted(e.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    import __spark_entry__ as e

    q = e.queries()[name]
    oracles = e.oracle_sql()
    if name not in oracles:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    got = normalize(q(spark, SF01_DIR).toPandas())
    want = normalize(run_oracle(oracles[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "tokens_csv" in df.columns
