"""The corpus-sized LSH index (`scaled_lsh_signature` / `scaled_lsh_pairs`)
— the deployment form whose bucket width tracks log2(corpus), used by the
similarity-family scaling bench (`bench.py --scaling-sim`).

These builders have no DuckDB twin (the plane matrix is bench-sized, not
literal-sized), so correctness is pinned here instead: a planted-group
corpus with known ground truth, partitioning invariance (the property the
cross-parallelism checksum in the scaling bench asserts at 1M docs), and
recipe identity (same triple ⇒ same index; different seed ⇒ different
buckets).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import bench as bench_mod
from log_aggregator_spark.functions import similarity as fsim

N_VECS = 400  # 100 groups of 4 → 600 in-group pairs
BITS = 10     # sized for ~10³ vectors (≈ log2(n)), the rule under test
TAU = 0.99


@pytest.fixture(scope="module")
def sim_synth(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sim_synth"))
    path = bench_mod.materialize_sim_synth(spark, N_VECS, out, files=4)
    return spark.read.parquet(path)


def test_planted_pairs_exact_recovery(spark, sim_synth):
    """Every one of the 6·n_groups in-group pairs is found (groups share a
    base direction, cosine ≈ 0.9996 ≫ tau) and NOTHING else survives the
    exact-cosine verify (cross-group cosine ≈ 0 ± 0.13 ≪ tau) — recall 1.0
    and precision 1.0 on ground truth, not a statistical bound."""
    got = (
        fsim.scaled_lsh_pairs(sim_synth, TAU, bits_per_band=BITS)
        .select("vec_a", "vec_b")
        .toPandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    want = sorted(
        (4 * g + i, 4 * g + j)
        for g in range(N_VECS // 4)
        for i in range(4)
        for j in range(i + 1, 4)
    )
    assert list(map(tuple, got.to_numpy())) == want


def test_partitioning_invariance(spark, sim_synth):
    """The index and the verified pair set are functions of content only —
    identical under 2-partition and 16-partition layouts (the small-scale
    replica of the bench's cross-parallelism equality assert)."""
    outs = []
    for n_parts in (2, 16):
        df = sim_synth.repartition(n_parts)
        sig = fsim.scaled_lsh_signature(df, bits_per_band=BITS)
        pairs = fsim.scaled_lsh_pairs(
            df, TAU, bits_per_band=BITS, signature_df=sig
        )
        outs.append(
            pairs.toPandas()
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])


def test_recipe_identity(spark, sim_synth):
    """Same (n_bands, bits, seed) ⇒ bit-identical stored index across
    builds (the stored-index reuse contract); a different seed ⇒ a
    different index (the recipe triple really is the index's identity)."""
    a = fsim.scaled_lsh_signature(sim_synth, bits_per_band=BITS).toPandas()
    b = fsim.scaled_lsh_signature(sim_synth, bits_per_band=BITS).toPandas()
    key = ["vec_id", "band"]
    a, b = (x.sort_values(key).reset_index(drop=True) for x in (a, b))
    assert a.equals(b)
    c = (
        fsim.scaled_lsh_signature(sim_synth, bits_per_band=BITS, seed=99)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert not a["bucket"].equals(c["bucket"])


def test_stored_index_recipe_mismatch_rejected(spark, sim_synth, tmp_path):
    """A stored index carries its recipe triple as column metadata; probing
    it with a different triple raises instead of silently losing recall.
    The metadata survives both the localCheckpoint the bench takes and a
    full parquet round-trip (spark's row-metadata footer key)."""
    sig = fsim.scaled_lsh_signature(sim_synth, bits_per_band=BITS).localCheckpoint()
    # matching recipe: accepted (and still finds the planted pairs)
    ok = fsim.scaled_lsh_pairs(
        sim_synth, TAU, bits_per_band=BITS, signature_df=sig
    )
    assert ok.count() == 6 * (N_VECS // 4)
    for kwargs in (
        {"bits_per_band": BITS + 1},
        {"bits_per_band": BITS, "seed": 99},
        {"bits_per_band": BITS, "n_bands": fsim.N_BANDS - 1},
    ):
        with pytest.raises(ValueError, match="recipe"):
            fsim.scaled_lsh_pairs(sim_synth, TAU, signature_df=sig, **kwargs)
    # parquet round-trip keeps the stamp
    p = str(tmp_path / "sig.parquet")
    sig.write.parquet(p)
    stored = spark.read.parquet(p)
    with pytest.raises(ValueError, match="recipe"):
        fsim.scaled_lsh_pairs(
            sim_synth, TAU, bits_per_band=BITS, seed=99, signature_df=stored
        )
    assert fsim.scaled_lsh_pairs(
        sim_synth, TAU, bits_per_band=BITS, signature_df=stored
    ).count() == 6 * (N_VECS // 4)


def test_bucket_width_matches_recipe(spark, sim_synth):
    """Buckets stay inside [0, 2^bits) and use the full configured width
    (a packing bug that ignored high bits would still pass the planted
    test on a small corpus — the width check catches it)."""
    sig = fsim.scaled_lsh_signature(sim_synth, bits_per_band=BITS)
    row = sig.agg(
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert 0 <= row["lo"] and row["hi"] < 2**BITS
    # high half of the bucket space is actually populated
    assert row["hi"] >= 2 ** (BITS - 1)
    assert row["n"] == N_VECS * fsim.N_BANDS


def test_planes_are_exact_integers():
    """The scaled plane matrix keeps the exact-integer invariant that
    makes the matmul reassociation-proof (module header): every component
    is an integer-valued double within the 2^53 bound."""
    planes = fsim.make_scaled_planes(12, 20)
    assert planes.shape == (240, fsim.DIM)
    assert np.array_equal(planes, np.rint(planes))
    assert float(np.abs(planes).max()) * 1.1e6 * fsim.DIM < 2**53
