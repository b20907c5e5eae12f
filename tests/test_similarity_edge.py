"""Edge-of-domain guarantees for the similarity kernels.

1. Non-finite / NULL / zero-norm vectors die at the _vecs boundary in BOTH
   engines. Without the shared exclusion the engines genuinely disagree:
   numpy treats NaN >= 0 as False (sign bit 0) while Spark and DuckDB
   order NaN greatest (sign bit 1), so one NaN vector would silently
   desynchronize the stored LSH index from the oracle; DuckDB's
   list_dot_product hard-errors on NULL elements where Spark folds to
   NULL. The poisoned-fixture tests prove all three compute paths (Arrow
   matmul, JVM fold, DuckDB twin) emit identical rows.

2. The brute kernels' sim matrix is sliced to a bounded element budget
   (_SIM_BLOCK_ELEMS) — one unsliced Arrow batch against a guard-allowed
   100k-row corpus would allocate a multi-GB dense matrix. The slice
   generator must be exactly result-equivalent to the single matmul.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from log_aggregator_spark.functions import similarity as fsim

DIM = fsim.DIM


def _poisoned_rows():
    rng = np.random.default_rng(11)
    clean1 = rng.standard_normal(DIM).round(3).tolist()
    clean2 = rng.standard_normal(DIM).round(3).tolist()
    nan_vec = list(clean1)
    nan_vec[7] = float("nan")
    pinf_vec = list(clean2)
    pinf_vec[0] = float("inf")
    ninf_vec = list(clean2)
    ninf_vec[63] = float("-inf")
    null_comp = list(clean1)
    null_comp[31] = None
    return [
        (1, clean1),
        (2, nan_vec),
        (3, pinf_vec),
        (4, ninf_vec),
        (5, [0.0] * DIM),  # zero-norm
        (6, null_comp),
        (7, None),  # whole-NULL vector
        (8, clean2),
    ]


@pytest.fixture(scope="module")
def poisoned_parquet(tmp_path_factory):
    rows = _poisoned_rows()
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
        }
    )
    path = str(tmp_path_factory.mktemp("poison") / "embeddings.parquet")
    pq.write_table(tbl, path)
    return path


def test_vecs_drops_poisoned(spark, poisoned_parquet):
    df = spark.read.parquet(poisoned_parquet)
    kept = sorted(
        r.vec_id for r in fsim._vecs(df).select("vec_id").collect()
    )
    assert kept == [1, 8]


def test_signature_parity_on_poisoned(spark, poisoned_parquet):
    import __spark_entry__ as e

    df = spark.read.parquet(poisoned_parquet)

    def norm(pdf):
        pdf = pdf[sorted(pdf.columns)].copy()
        for c in pdf.columns:
            pdf[c] = pdf[c].astype("int64")
        return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)

    arrow = norm(fsim.lsh_signature(df, impl="arrow").toPandas())
    jvm = norm(fsim.lsh_signature(df, impl="jvm").toPandas())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{poisoned_parquet}')"
    )
    oracle = norm(con.sql(e.oracle_sql()["sim_lsh_signature"]).df())
    # only the two clean vectors survive, in every engine
    assert sorted(arrow["vec_id"].unique()) == [1, 8]
    pd.testing.assert_frame_equal(arrow, jvm)
    pd.testing.assert_frame_equal(arrow, oracle)


def test_brute_kernels_skip_poisoned(spark, poisoned_parquet):
    df = spark.read.parquet(poisoned_parquet)
    top = fsim.brute_topk(df, k=3).toPandas()
    # clean pair only: each ranks the other; poisoned rows appear on
    # neither the query nor the corpus side
    assert sorted(top["vec_id"]) == [1, 8]
    assert sorted(top["neighbor_id"]) == [1, 8]
    nd = fsim.cosine_near_dup(df, tau=-1.0).toPandas()
    assert [(r.vec_a, r.vec_b) for r in nd.itertuples()] == [(1, 8)]


def test_sim_slices_equal_single_matmul(monkeypatch):
    rng = np.random.default_rng(3)
    n_corpus, n_query = 37, 23
    qc = np.rint(rng.standard_normal((n_corpus, DIM)) * fsim.QUANT)
    ids = np.arange(100, 100 + n_corpus, dtype=np.int64)
    n2c = np.einsum("ij,ij->i", qc, qc)
    qpdf = pd.DataFrame(
        {
            "vec_id": np.arange(n_query, dtype=np.int64),
            "embedding": list(
                rng.standard_normal((n_query, DIM)).astype(np.float32)
            ),
        }
    )
    full = list(fsim._sim_slices(qpdf, ids, qc, n2c))
    assert len(full) == 1  # default budget: one slice on small inputs
    # force many slices: budget of 5 corpus-rows-worth per slice
    monkeypatch.setattr(fsim, "_SIM_BLOCK_ELEMS", 5 * n_corpus)
    sliced = list(fsim._sim_slices(qpdf, ids, qc, n2c))
    assert len(sliced) == -(-n_query // 5)
    assert all(len(qids) <= 5 for qids, _ in sliced)
    np.testing.assert_array_equal(
        np.concatenate([q for q, _ in sliced]), full[0][0]
    )
    np.testing.assert_array_equal(
        np.vstack([s for _, s in sliced]), full[0][1]
    )


def test_norm_stats_parity_on_poisoned(spark, poisoned_parquet):
    import __spark_entry__ as e

    df = spark.read.parquet(poisoned_parquet)

    def norm(pdf):
        pdf = pdf[sorted(pdf.columns)].copy()
        return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)

    got = norm(fsim.norm_stats(df).toPandas())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{poisoned_parquet}')"
    )
    want = norm(con.sql(e.oracle_sql()["sim_norm_stats"]).df())
    # the five degenerate vectors (NaN, +Inf, -Inf, NULL component,
    # NULL vector) land in the sentinel bucket, the zero vector in
    # bucket 0 — identically in both engines
    sentinel = got[got["norm_x10"] == -1]
    assert int(sentinel["n_vecs"].iloc[0]) == 5
    assert sentinel["min_norm_mill"].isna().all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
