"""Embedding similarity search over the ``embeddings`` table
(vec_id bigint, embedding array<float>, label int).

Two physical strategies, one semantic (cosine):

``brute_topk`` / ``cosine_near_dup``
    Exact all-pairs baseline: broadcast one side, JVM-codegen dot products
    (``zip_with`` + ``aggregate`` — no Python anywhere). O(n²) — correct
    reference answer at test scale; at 100 TB the broadcast side no longer
    fits and the quadratic blowup is fatal, which is what the LSH path is
    for.

``lsh_signature`` / ``lsh_candidate_pairs`` / ``lsh_topk``
    The scale path: random-hyperplane LSH. Signature computation is a
    narrow, shuffle-free codegen projection (P literal hyperplanes →
    P sign bits → B banded bucket keys); candidates come from an equi-join
    on (band, bucket) — a plain shuffle hash join AQE can skew-split —
    touching only ~(1/2^bits_per_band)·B of all pairs instead of n².
    Exactly the MinHash-LSH shape of ``dedup.py`` with hyperplane signs in
    place of min-hashes.

Determinism: the hyperplanes are module-level constants derived from a
seeded RNG, embedded *literally* both in the Spark plan (``F.lit``) and in
the DuckDB oracle SQL (``oracle_sql.py`` interpolates ``PLANES``), so both
engines parse the identical decimal strings to identical doubles. All
compared columns are integers/identities; cosine values are carried only as
``floor(1e6·sim)`` after identical left-to-right double arithmetic on both
sides.

The reference has no similarity operator at all (SURVEY.md §2 — closest is
the exact-key dedupe S7); this family is the training-data-pipeline
extension the graft brief mandates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- constants

DIM = 64
N_PLANES = 32           # sign bits per signature
N_BANDS = 4             # LSH bands
BITS_PER_BAND = N_PLANES // N_BANDS
TOPK = 5
LSH_TOPK = 3
NEAR_DUP_TAU = 0.35     # exact near-dup threshold (max pairwise sim ≈ 0.51)
LSH_TAU = 0.30          # cosine filter applied to LSH candidates


def _make_planes(n: int = N_PLANES, dim: int = DIM, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n, dim))
    # round so the decimal literals are short; repr() of these floats
    # round-trips identically in Spark and DuckDB.
    return [[float(round(x, 6)) for x in row] for row in planes]


PLANES: list[list[float]] = _make_planes()


# ---------------------------------------------------------------- helpers

def _dot(a: Column, b: Column) -> Column:
    """Left-to-right double dot product — same association order as DuckDB's
    list_dot_product, so the two engines agree bitwise."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _vecs(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("n2", _dot(F.col("v"), F.col("v")))


def _pair_sim(a: DataFrame, b: DataFrame) -> DataFrame:
    """All-pairs cosine via broadcast cross join (exact baseline)."""
    bb = F.broadcast(
        b.select(
            F.col("vec_id").alias("nb_id"),
            F.col("v").alias("nb_v"),
            F.col("n2").alias("nb_n2"),
        )
    )
    return (
        a.crossJoin(bb)
        .where(F.col("vec_id") != F.col("nb_id"))
        .withColumn(
            "sim",
            _dot(F.col("v"), F.col("nb_v"))
            / F.sqrt(F.col("n2") * F.col("nb_n2")),
        )
    )


# ---------------------------------------------------------------- queries

def brute_topk(embeddings: DataFrame, k: int = TOPK) -> DataFrame:
    """Exact top-k cosine neighbors per vector.
    (vec_id, rank, neighbor_id, sim_x1m)."""
    v = _vecs(embeddings)
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.col("nb_id"))
    return (
        _pair_sim(v, v)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "vec_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("nb_id").alias("neighbor_id"),
            F.floor(F.col("sim") * 1_000_000).cast("long").alias("sim_x1m"),
        )
    )


def cosine_near_dup(embeddings: DataFrame, tau: float = NEAR_DUP_TAU) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, sim ≥ tau).
    (vec_a, vec_b, sim_x1m)."""
    v = _vecs(embeddings)
    return (
        _pair_sim(v, v)
        .where((F.col("vec_id") < F.col("nb_id")) & (F.col("sim") >= tau))
        .select(
            F.col("vec_id").alias("vec_a"),
            F.col("nb_id").alias("vec_b"),
            F.floor(F.col("sim") * 1_000_000).cast("long").alias("sim_x1m"),
        )
    )


def _signature_col() -> Column:
    """P sign bits packed into one bigint — pure codegen arithmetic over the
    literal hyperplanes (a narrow projection; zero shuffle, zero Python)."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(PLANES):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = (_dot(F.col("v"), lit_plane) >= 0).cast("long")
        sig = sig + bit * F.lit(1 << j).cast("long")
    return sig


def lsh_signature(embeddings: DataFrame) -> DataFrame:
    """(vec_id, sig) — the packed random-hyperplane signature."""
    return _vecs(embeddings).select("vec_id", _signature_col().alias("sig"))


def _banded(embeddings: DataFrame) -> DataFrame:
    """Explode each signature into (band, bucket) keys. bucket = the band's
    bit slice; the join key (band, bucket) is what shards candidate
    generation at scale."""
    sig = _vecs(embeddings).select("vec_id", "v", "n2", _signature_col().alias("sig"))
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                (
                    F.floor(F.col("sig") / F.lit(1 << (b * BITS_PER_BAND)))
                    % F.lit(1 << BITS_PER_BAND)
                )
                .cast("long")
                .alias("bucket"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select(
        "vec_id", "v", "n2", F.explode(bands).alias("bb")
    ).select("vec_id", "v", "n2", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(embeddings: DataFrame, tau: float = LSH_TAU) -> DataFrame:
    """Candidate pairs sharing ≥1 band bucket, then exact-cosine filtered at
    tau. (vec_a, vec_b, n_bands, sim_x1m). The join is a plain equi-join on
    (band, bucket) — the scale path (no cross join anywhere)."""
    bk = _banded(embeddings)
    left = bk.select("vec_id", "v", "n2", "band", "bucket")
    right = bk.select(
        F.col("vec_id").alias("nb_id"),
        F.col("v").alias("nb_v"),
        F.col("n2").alias("nb_n2"),
        "band",
        "bucket",
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .where(F.col("vec_id") < F.col("nb_id"))
        .groupBy("vec_id", "nb_id")
        .agg(
            F.count("*").cast("long").alias("n_bands"),
            F.first("v").alias("v"),
            F.first("n2").alias("n2"),
            F.first("nb_v").alias("nb_v"),
            F.first("nb_n2").alias("nb_n2"),
        )
        .withColumn(
            "sim",
            _dot(F.col("v"), F.col("nb_v")) / F.sqrt(F.col("n2") * F.col("nb_n2")),
        )
        .where(F.col("sim") >= tau)
    )
    return cand.select(
        F.col("vec_id").alias("vec_a"),
        F.col("nb_id").alias("vec_b"),
        "n_bands",
        F.floor(F.col("sim") * 1_000_000).cast("long").alias("sim_x1m"),
    )


def lsh_topk(embeddings: DataFrame, k: int = LSH_TOPK) -> DataFrame:
    """Approximate top-k: rank exact cosine *within LSH candidates only*
    (both directions of each pair). (vec_id, rank, neighbor_id)."""
    bk = _banded(embeddings)
    left = bk.select("vec_id", "v", "n2", "band", "bucket")
    right = bk.select(
        F.col("vec_id").alias("nb_id"),
        F.col("v").alias("nb_v"),
        F.col("n2").alias("nb_n2"),
        "band",
        "bucket",
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .where(F.col("vec_id") != F.col("nb_id"))
        .groupBy("vec_id", "nb_id")
        .agg(
            F.first("v").alias("v"),
            F.first("n2").alias("n2"),
            F.first("nb_v").alias("nb_v"),
            F.first("nb_n2").alias("nb_n2"),
        )
        .withColumn(
            "sim",
            _dot(F.col("v"), F.col("nb_v")) / F.sqrt(F.col("n2") * F.col("nb_n2")),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.col("nb_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "vec_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("nb_id").alias("neighbor_id"),
        )
    )
