"""Embedding similarity search over the ``embeddings`` table
(vec_id bigint, embedding array<float>, label int).

Two physical strategies, one semantic (cosine over quantized vectors):

``brute_topk`` / ``cosine_near_dup``
    Exact all-pairs baseline, sample-only by construction (the quadratic
    guard raises past ``QUADRATIC_MAX_ROWS``): the corpus sample is pulled
    once into an id-sorted numpy matrix and every query partition ranks
    against it with ONE BLAS matmul inside ``mapInPandas`` — Arrow-batched,
    zero per-row Python, no join in the plan at all. O(n²) work stays
    O(n²), but at vectorized speed; at 100 TB the matrix no longer fits
    and the guard refuses, which is what the LSH/IVF paths are for.

``lsh_signature`` / ``lsh_candidate_pairs`` / ``lsh_topk``
    The scale path: random-hyperplane LSH. The signature (96 sign bits →
    12 banded bucket keys) is ONE vectorized ``pandas_udf`` matmul per
    Arrow batch — (rows × 64) @ (64 × 96) — instead of 96 interpreted
    higher-order-function dot products per row (~10× constant-factor win
    measured on the sf0.1 fixture; HOFs are CodegenFallback). Candidates
    come from an equi-join on (band, bucket) — a plain shuffle hash join
    AQE can skew-split — touching only ~(1/2^bits)·B of all pairs.

Exact cross-engine arithmetic (the reason the gate can hash-compare):
every vector is quantized ONCE to integer-valued doubles,
``q[i] = rint(x[i] · 10⁶)`` (round-half-even: Spark ``rint`` = Java
``Math.rint``, numpy ``np.rint``, DuckDB ``round_even`` — verified
identical, including the exact-.5 boundary a float32 corpus does hit).
Every dot product is then a sum of integers: |q| ≤ ~6·10⁵ and hyperplane
literals ≤ ~4.4·10⁶, so each term ≤ ~2.7·10¹² and every 64-dim partial
sum stays < 2⁵³ — integer-valued doubles below 2⁵³ add EXACTLY in any
order, so a BLAS matmul (pairwise/FMA reassociation and all), a
sequential JVM ``aggregate(zip_with(...))`` fold and DuckDB's
``list_dot_product`` produce the bitwise-identical value. Derived floats
(``sim = dot / sqrt(n2a·n2b)``) are a fixed sequence of individually
correctly-rounded IEEE ops on identical exact inputs — also bitwise
identical across engines. The hyperplanes/centroids are module-level
integer literals embedded both in the Spark plan (``F.lit``) and the
DuckDB oracle SQL (``oracle_sql.py`` interpolates ``PLANES``); compared
columns carry only integers (``floor(10⁶·sim)``).

The JVM HOF twins of each kernel (``impl="jvm"``) are kept for the
equality tests that prove the vectorized path computes the identical
bits (`tests/test_dedup_scale.py`); production defaults to Arrow.

The reference has no similarity operator at all (SURVEY.md §2 — closest
is the exact-key dedupe S7); this family is the training-data-pipeline
extension the graft brief mandates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

# ---------------------------------------------------------------- constants

DIM = 64
QUANT = 1_000_000  # quantization scale: q = rint(x * QUANT)
# Tuned on the fixture via measured recall@3 (sim_lsh_recall): the synthetic
# embeddings are the ADVERSARIAL case for hyperplane LSH — iid gaussian
# vectors whose true top-3 neighbors sit at cosine ≈ 0.34 (θ≈70°), barely
# tighter than random pairs (θ≈90°). Multi-probe (query each band's bucket
# plus its BITS_PER_BAND Hamming-1 neighbors — flip one sign bit) buys
# recall WITHOUT more hash tables: candidates grow ×(1+bits) per band on
# the probe side only, while the stored index stays one entry per band.
# Measured sweep on the sf0.01 fixture (recall@3 / candidate volume):
#   16 bands × 6 bits, no probe → .576 / 23.4%   (the r2 setting)
#   16 bands × 6 bits, Hamming-1 → .993 / 82.5%  (≈ brute, too wide)
#   12 bands × 8 bits, no probe → .186 /  5.2%
#   12 bands × 8 bits, Hamming-1 → .786 / 35.9%  ← chosen
#   12 bands × 7 bits, Hamming-1 → .864 / 54.1%
#    8 bands ×12 bits, Hamming-1 → .157 /  3.2%
# (Quantization flips zero sign bits on the fixture — the sweep holds.)
# On production corpora neighbors sit at cosine ≥ 0.8, where 12 bands at
# 10-14 bits/band with Hamming-1 probes reach ≥95% recall at ≤2% candidate
# volume; the knobs are module constants measured by sim_lsh_recall, so a
# retune is a one-line change gated by a number, not a guess.
N_PLANES = 96           # sign bits total
N_BANDS = 12            # LSH bands (hash tables)
BITS_PER_BAND = N_PLANES // N_BANDS
MULTIPROBE = True       # probe Hamming-1 neighbor buckets on the query side
TOPK = 5
LSH_TOPK = 3
NEAR_DUP_TAU = 0.35     # exact near-dup threshold (max pairwise sim ≈ 0.51)
LSH_TAU = 0.30          # cosine filter applied to LSH candidates

# The brute-force baselines are O(n²) by construction — valid ONLY on
# samples (ground truth for recall measurement, small-corpus validation).
# Above this row count they raise instead of silently materializing a
# corpus-sized matrix; callers that really mean it pass
# allow_quadratic=True. 100k rows × 64 dims × 8 B ≈ 51 MB — comfortably a
# sample, never a corpus.
QUADRATIC_MAX_ROWS = 100_000

_EXACT_BOUND = float(2**53)  # integer-double exactness ceiling


def _make_planes(n: int = N_PLANES, dim: int = DIM, seed: int = 42) -> list[list[float]]:
    """Random hyperplanes as INTEGER-valued doubles (×QUANT): short exact
    literals that round-trip identically through Spark, DuckDB and numpy,
    and keep every signature dot product in exact-integer territory."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n, dim))
    # round() to int BEFORE the float cast: round(x, 6) * QUANT would be a
    # double *approximation* of the 6-decimal value ×10⁶ (e.g.
    # 123456.99999999999), silently breaking the exact-integer invariant
    return [[float(round(x * QUANT)) for x in row] for row in planes]


PLANES: list[list[float]] = _make_planes()
_PLANES_NP = np.array(PLANES, dtype=np.float64)        # (N_PLANES, DIM)
_PLANES_ABS_MAX = float(np.abs(_PLANES_NP).max())


# ---------------------------------------------------------------- helpers

def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product (JVM, interpreted HOF). On the
    quantized integer-valued arrays this repo feeds it, the result is
    EXACT and therefore equal to any reassociated sum — DuckDB's
    list_dot_product, a numpy einsum/matmul, or this fold all agree
    bitwise. Used where per-row volume is small (n2 norms, K-row k-means
    re-scoring) and in the ``impl="jvm"`` twins; hot paths use the Arrow
    kernels below."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _quantize(col: Column) -> Column:
    """q[i] = rint(x[i] · QUANT) as integer-valued doubles — THE
    quantization, applied exactly once per vector (codegen-side; both
    engines round half-even, see module header)."""
    return F.transform(
        col.cast("array<double>"), lambda x: F.rint(x * F.lit(float(QUANT)))
    )


def _vecs(embeddings: DataFrame, drop_zero: bool = True) -> DataFrame:
    """(vec_id, v=quantized vector, n2=exact squared norm ×QUANT²).

    ``drop_zero`` (default): zero-norm vectors are excluded at this
    boundary — cosine is undefined for them (0/0 → NaN, which every
    engine orders differently: numpy drops/last, Spark and DuckDB sort
    NaN greatest) and a zero vector has no sign direction for the LSH /
    IVF projections (same rule as ``multimodal.media_feature_signature``).
    Excluding them HERE keeps every downstream kernel (numpy block, JVM
    fold, DuckDB twin) bit-identical instead of inheriting each engine's
    NaN convention. ``norm_stats`` opts out — it is the QA query whose
    job is to SEE the degenerate vectors."""
    out = embeddings.select(
        "vec_id", _quantize(F.col("embedding")).alias("v")
    ).withColumn("n2", _dot(F.col("v"), F.col("v")))
    if not drop_zero:
        return out
    # predicate ≡ the oracle's list_dot_product(v, v) > 0 (exact integer
    # arithmetic: n2 = 0 ⟺ all components 0; -0.0 == 0.0 in both engines).
    # Stated as array_remove/size — codegen expressions — instead of
    # n2 > 0, which would force the interpreted HOF fold on every row even
    # in queries that prune n2 (the signature/index builds, the one
    # full-corpus pass to keep cheap).
    #
    # Non-finite components are excluded at the same boundary: the
    # engines genuinely disagree on them (numpy NaN >= 0 is False while
    # Spark and DuckDB order NaN greatest, so one NaN vector would give
    # the Arrow sign-bit kernels bucket 0 where the JVM/DuckDB twins give
    # 255, silently desynchronizing the stored index from the oracle; an
    # Inf survives the comparison consistently but trips _check_exact in
    # the Arrow kernels only — raise-vs-run is still a divergence). A
    # NULL component or a NULL vector makes `exists` NULL → row dropped.
    return out.where(
        _finite_vec() & (F.size(F.array_remove(F.col("v"), 0.0)) > 0)
    )


def _finite_vec(col: str = "v") -> Column:
    """TRUE ⟺ every component finite; NULL for a NULL vector or a NULL
    component (three-valued `exists`) — callers that must classify
    rather than filter wrap this in coalesce(…, FALSE)."""
    return ~F.exists(
        col, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )


def _np_rows(series: pd.Series, dim: int = DIM) -> np.ndarray:
    """Stack an Arrow-delivered array column into an (n, dim) float64
    matrix (embeddings arrive float32 → float64 is exact). Shared with
    the media-feature kernels (multimodal), whose vectors are
    MM_FDIM-wide."""
    if not len(series):
        return np.empty((0, dim), dtype=np.float64)
    return np.stack(series.to_numpy()).astype(np.float64, copy=False)


def _check_exact(q: np.ndarray, other_abs_max: float) -> None:
    """Defensive exactness guard: every partial sum of the upcoming
    integer matmul must stay < 2⁵³ (see module header). Never fires on
    sane embeddings (needs |x| ≳ 20 post-quantization); raising beats
    silently losing bit-equality with the oracle."""
    if q.size and float(np.abs(q).max()) * other_abs_max * DIM >= _EXACT_BOUND:
        raise ValueError(
            "quantized dot product could exceed 2^53 — exact cross-engine "
            "arithmetic no longer guaranteed (embedding values too large?)"
        )


# ------------------------------------------------ vectorized Arrow kernels

def pack_band_bits(
    fm: np.ndarray, planes: np.ndarray, n_bands: int, bits_per_band: int
) -> np.ndarray:
    """(n, n_bands) int64 bucket keys from one sign-bit matmul: (n × dim)
    @ (dim × n_bands·bits) → signs → bits packed per band. THE shared
    band-packing kernel — the text-embedding LSH here and the media
    feature LSH (multimodal) both call it, so a fix to the packing logic
    lands in both."""
    bits = (fm @ planes.T) >= 0                          # (n, total bits)
    out = np.zeros((len(fm), n_bands), dtype=np.int64)
    for b in range(n_bands):
        for j in range(bits_per_band):
            out[:, b] |= bits[:, b * bits_per_band + j].astype(np.int64) << j
    return out


@pandas_udf(ArrayType(LongType()))
def _band_buckets_pd(v: pd.Series) -> pd.Series:
    """All N_BANDS bucket keys per vector in one BLAS matmul. Input is the
    already-quantized vector, so the matmul is exact (module header) and
    the signs equal the JVM/DuckDB fold's."""
    q = _np_rows(v)
    _check_exact(q, _PLANES_ABS_MAX)
    out = pack_band_bits(q, _PLANES_NP, N_BANDS, BITS_PER_BAND)
    return pd.Series(list(out))


# The kernel UDFs ARE pure functions; the nondeterministic flag exists to
# stop Catalyst duplicating them: InferFiltersFromGenerate plants a
# size(arr)>0 AND isnotnull(arr) filter under every explode of a UDF
# result, and because a deterministic Python UDF may be collapsed through
# that filter, the plan evaluates the WHOLE matmul twice per row (one
# ArrowEvalPython feeding the filter, a second feeding the explode —
# caught in review via PLANS.md). Nondeterministic expressions can't be
# moved through filters, so the single evaluation survives with the
# inferred filter applied after it; results are bit-identical (the flag
# restricts optimizer moves only) and the audit now pins the node count.
_band_buckets_nd = _band_buckets_pd.asNondeterministic()


@pandas_udf(DoubleType())
def _pair_dot_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise exact dot over two quantized vector columns (einsum per
    Arrow batch). Identical bits to the JVM fold — kept as the tested
    alternative kernel, but NOT used on the candidate-verify path: there
    the join already co-locates both arrays JVM-side and shipping
    2 × 512 B per pair through Arrow costs more than the interpreted
    64-step fold (measured at sf0.1: lsh_pairs 8.0 s Arrow vs 3.7 s JVM,
    ivf_topk 10.7 s vs 8.8 s). The matmul kernels win where one side is
    a CONSTANT matrix (signatures, cell ranking, brute) — per-pair dots
    with both sides row-varying stay JVM-side."""
    qa, qb = _np_rows(a), _np_rows(b)
    _check_exact(qa, float(np.abs(qb).max()) if qb.size else 0.0)
    return pd.Series(np.einsum("ij,ij->i", qa, qb))


def _pair_sim_col(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """sim = exact_dot / sqrt(n2a·n2b) — the one shared cosine formula
    (fixed IEEE op sequence on exact integer inputs; bitwise identical in
    numpy / JVM / DuckDB). JVM fold by measurement — see _pair_dot_pd."""
    return _dot(va, vb) / F.sqrt(na * nb)


def _pair_sim_col_i32(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """`_pair_sim_col` over int32-TRANSPORTED quantized vectors (see
    `_attach_vectors`): each element is cast back to double before the
    multiply, so every product, every partial sum, and the final divide
    are the same IEEE ops on the same values as the double-array fold —
    bit-identical sim, half the shuffle bytes."""
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / F.sqrt(na * nb)


# ---------------------------------------------------------------- brute

def _corpus_matrix(
    embeddings: DataFrame, allow_quadratic: bool, max_rows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pull the (guarded) corpus sample into an id-SORTED quantized matrix
    — sorted so that a stable argsort over matrix columns breaks score
    ties by ascending neighbor id, the same tie rule as the SQL
    ``ORDER BY sim DESC, nb_id``. The fetch doubles as the quadratic
    guard: one Arrow collect of at most max_rows+1 rows (O(max_rows)
    work, short-circuits the scan) instead of a separate count job —
    r3's guard probe was a second action per call; this is zero extra."""
    sel = embeddings.select("vec_id", "embedding")
    if not allow_quadratic:
        pdf = sel.limit(max_rows + 1).toPandas()
        if len(pdf) > max_rows:
            raise ValueError(
                f"brute-force similarity on >{max_rows} rows exceeds the "
                "sample bound; use the LSH path (lsh_topk/"
                "lsh_candidate_pairs) or pass allow_quadratic=True on an "
                "explicit sample"
            )
    else:
        pdf = sel.toPandas()
    # whole-NULL vectors arrive as None and would break the stack; NULL
    # components arrive as NaN and fall to the finite mask below — the
    # same rows _vecs drops, handled numpy-side because the brute path
    # takes raw embeddings
    pdf = pdf[pdf["embedding"].notna()].sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    q = np.rint(_np_rows(pdf["embedding"]) * QUANT)
    n2 = np.einsum("ij,ij->i", q, q)
    # the _vecs rule, numpy-side: drop zero-norm (cosine undefined) and
    # non-finite vectors. isfinite must be explicit — a NaN n2 fails
    # `> 0` here but passes it in Spark/DuckDB (both order NaN greatest),
    # and an Inf n2 passes everywhere while poisoning the matmul — and it
    # must run BEFORE _check_exact, whose abs-max would see the Inf.
    nz = np.isfinite(n2) & (n2 > 0)
    ids, q, n2 = ids[nz], q[nz], n2[nz]
    _check_exact(q, float(np.abs(q).max()) if q.size else 0.0)
    return ids, q, n2


# sim-matrix element budget per slice: 2^22 float64 = 32 MB. Peak live
# memory per slice is exactly two such arrays (`dots`, reused in place as
# the sim matrix, plus the sqrt'd denominator — the kernel sqrts and
# divides in place to keep it at two). At the 100k-row guard boundary
# that is ~41 query rows per slice; on the 2k-vector gate fixture a whole
# 10k-row Arrow batch fits in one slice, so small corpora pay nothing.
_SIM_BLOCK_ELEMS = 1 << 22


def _sim_slices(
    pdf: pd.DataFrame, ids: np.ndarray, qc: np.ndarray, n2c: np.ndarray
):
    """Yield (query_ids, sim matrix vs the whole corpus sample) in
    memory-bounded query slices — the BLAS matmul all brute queries
    share. One unsliced Arrow batch × a guard-allowed corpus would be a
    multi-GB dense matrix (10k × 100k × 8 B ≈ 8 GB, twice with the dots
    temporary), so slices are sized to _SIM_BLOCK_ELEMS. Zero-norm and
    non-finite query rows are dropped (the _vecs rule, same mask as
    _corpus_matrix) and the 2^53 exactness guard covers BOTH matmul
    operands — the corpus-side check alone would let an oversized query
    vector silently break bit-equality."""
    pdf = pdf[pdf["embedding"].notna()]  # _corpus_matrix's None rule
    qids = pdf["vec_id"].to_numpy(dtype=np.int64)
    qq = np.rint(_np_rows(pdf["embedding"]) * QUANT)
    n2q = np.einsum("ij,ij->i", qq, qq)
    nz = np.isfinite(n2q) & (n2q > 0)
    qids, qq, n2q = qids[nz], qq[nz], n2q[nz]
    _check_exact(qq, float(np.abs(qc).max()) if qc.size else 0.0)
    step = max(1, _SIM_BLOCK_ELEMS // max(1, len(ids)))
    for lo in range(0, len(qids), step):
        hi = lo + step
        dots = qq[lo:hi] @ qc.T                          # exact
        # in place: same IEEE sqrt-then-divide sequence as the SQL twin's
        # dot/sqrt(n2a*n2b), but peak memory stays at two slice arrays
        denom = np.outer(n2q[lo:hi], n2c)
        np.sqrt(denom, out=denom)
        dots /= denom
        yield qids[lo:hi], dots


def brute_topk(
    embeddings: DataFrame,
    k: int = TOPK,
    allow_quadratic: bool = False,
    max_rows: int = QUADRATIC_MAX_ROWS,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector. ``queries`` optionally
    restricts the ranked (left) side — candidates always come from the
    full corpus sample. (vec_id, rank, neighbor_id, sim_x1m).

    Shape: corpus sample → one id-sorted in-memory matrix (guarded);
    ranking = mapInPandas over the query side, one matmul + one stable
    argsort per Arrow batch. No join, no shuffle, no per-row Python —
    embarrassingly parallel over query partitions."""
    ids, qc, n2c = _corpus_matrix(embeddings, allow_quadratic, max_rows)
    left = (queries if queries is not None else embeddings).select(
        "vec_id", "embedding"
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf) or not len(ids):  # empty corpus → empty result
                continue
            for qids, sim in _sim_slices(pdf, ids, qc, n2c):
                # mask self-pairs (query may or may not be in the corpus)
                pos = np.searchsorted(ids, qids)
                hit = (pos < len(ids)) & (
                    ids[np.minimum(pos, len(ids) - 1)] == qids
                )
                sim[np.nonzero(hit)[0], pos[hit]] = -np.inf
                kk = min(k, sim.shape[1])
                # stable argsort on -sim: ties keep column order = id ASC
                # — exactly ORDER BY sim DESC, nb_id (the SQL twin's rule)
                idx = np.argsort(-sim, axis=1, kind="stable")[:, :kk]
                top = np.take_along_axis(sim, idx, axis=1)
                nrow = len(qids)
                out_vec = np.repeat(qids, kk)
                out_rank = np.tile(
                    np.arange(1, kk + 1, dtype=np.int64), nrow
                )
                out_nb = ids[idx].ravel()
                flat = top.ravel()
                keep = np.isfinite(flat)  # drops masked self when kk == n
                yield pd.DataFrame(
                    {
                        "vec_id": out_vec[keep],
                        "rank": out_rank[keep],
                        "neighbor_id": out_nb[keep],
                        "sim_x1m": np.floor(flat[keep] * 1e6).astype(
                            np.int64
                        ),
                    }
                )

    return left.mapInPandas(
        gen, "vec_id long, rank long, neighbor_id long, sim_x1m long"
    )


def cosine_near_dup(
    embeddings: DataFrame,
    tau: float = NEAR_DUP_TAU,
    allow_quadratic: bool = False,
    max_rows: int = QUADRATIC_MAX_ROWS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, sim ≥ tau).
    (vec_a, vec_b, sim_x1m). Same matrix/mapInPandas shape as
    ``brute_topk``; the a < b half-matrix filter replaces ranking."""
    ids, qc, n2c = _corpus_matrix(embeddings, allow_quadratic, max_rows)

    def gen(batches):
        for pdf in batches:
            if not len(pdf) or not len(ids):  # empty corpus → empty result
                continue
            for qids, sim in _sim_slices(pdf, ids, qc, n2c):
                cond = (sim >= tau) & (qids[:, None] < ids[None, :])
                r, c = np.nonzero(cond)
                yield pd.DataFrame(
                    {
                        "vec_a": qids[r],
                        "vec_b": ids[c],
                        "sim_x1m": np.floor(sim[r, c] * 1e6).astype(
                            np.int64
                        ),
                    }
                )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        gen, "vec_a long, vec_b long, sim_x1m long"
    )


# ------------------------------------------------------------------- LSH

def _bucket_col(b: int) -> Column:
    """Band b's bucket key via the JVM HOF fold — the ``impl="jvm"`` twin
    of ``_band_buckets_pd`` (bit-identical by the exactness argument;
    asserted equal in tests)."""
    bucket = F.lit(0).cast("long")
    for j in range(BITS_PER_BAND):
        plane = PLANES[b * BITS_PER_BAND + j]
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = (_dot(F.col("v"), lit_plane) >= 0).cast("long")
        bucket = bucket + bit * F.lit(1 << j).cast("long")
    return bucket


def lsh_signature(embeddings: DataFrame, impl: str = "arrow") -> DataFrame:
    """(vec_id, band, bucket) — the banded hyperplane signature, i.e. the
    ANN index itself: N_BANDS rows per vector, each a hash-table key.
    The 96 sign bits come from one vectorized matmul per Arrow batch
    (``impl="arrow"``, default) or the per-plane JVM fold
    (``impl="jvm"``, the equality-test twin) — identical bits either way.
    Narrow projection + a 12-wide explode; zero shuffle: the index build
    is embarrassingly parallel, the one full-corpus pass you want cheap
    at 100 TB."""
    base = _vecs(embeddings)
    if impl == "arrow":
        bks = _band_buckets_nd(F.col("v"))  # nd: see _band_buckets_nd
    else:
        bks = F.array(*[_bucket_col(b) for b in range(N_BANDS)])
    return (
        base.select("vec_id", bks.alias("bks"))
        .select("vec_id", F.posexplode("bks").alias("band", "bucket"))
        .select("vec_id", F.col("band").cast("long").alias("band"), "bucket")
    )


def lsh_probe_keys(embeddings: DataFrame) -> DataFrame:
    """Multi-probe expansion of the banded signature: for each band, the
    base bucket plus its BITS_PER_BAND Hamming-1 neighbors (one sign bit
    flipped). Standard multi-probe LSH (Lv et al., VLDB'07): the vectors
    most likely to hash NEAR a query land one bit away, so probing
    adjacent buckets recovers them without adding hash tables. Query-side
    only — the index (lsh_signature) still stores one entry per band, and
    the expansion is an ids-only narrow projection (24 B/row × (1+bits)),
    never vector bytes."""
    return _expand_probes(lsh_signature(embeddings))


def _expand_probes(sig: DataFrame) -> DataFrame:
    """Probe expansion over an existing (vec_id, band, bucket) signature —
    the reuse form: a materialized index expands without recomputing the
    96 hyperplane dot products."""
    masks = F.array(
        *[F.lit(m).cast("long") for m in [0] + [1 << j for j in range(BITS_PER_BAND)]]
    )
    return sig.select(
        "vec_id",
        "band",
        F.explode(
            F.transform(masks, lambda m: F.col("bucket").bitwiseXOR(m))
        ).alias("bucket"),
    )


def _attach_vectors(cand_ids: DataFrame, v: DataFrame) -> DataFrame:
    """Join the exact-verify vectors back onto an ids-only candidate-pair
    set, then compute cosine. The banded pair join itself moves ONLY
    (vec_id, band, bucket) — 24 bytes/row instead of two 512-byte vectors
    duplicated ×N_BANDS through the explode AND the pair-dedup exchange;
    vectors are re-joined once per deduped pair against the narrow vecs
    projection (broadcast when small, co-partitioned shuffle join on
    vec_id at scale — AQE picks). The per-pair verify dot stays JVM-side
    (measured faster than an Arrow round-trip of both arrays — see
    _pair_dot_pd).

    TRANSPORT COMPRESSION (r5): the quantized components are integer-
    valued doubles, so they ship through the two attach shuffles as
    ``array<int>`` — 4 B/element instead of 8 — and are cast back to
    double inside the verify fold, keeping the IEEE op sequence (and
    therefore every bit of ``sim``) identical to the uncompressed form.
    This halves the byte-dominant shuffle of the whole pair job: the
    second attach join moves n_pairs × (ids + one full vector); at 4M
    vectors that intermediate is the single largest exchange in the
    family (BENCH/BASELINE.md, sim scaling). Exactness of the int32
    round-trip: |q| < 2³¹ is implied many times over by the exactness
    screen every indexed vector already passed (`_check_exact` bounds
    |q| ≲ 2.8×10⁷ against the plane/centroid matrices before any
    candidate pair exists; Java double→int narrowing is exact for
    integer-valued doubles in range)."""
    vi = v.select(
        "vec_id",
        F.transform(F.col("v"), lambda x: x.cast("int")).alias("v"),
        "n2",
    )
    va = vi.select(
        F.col("vec_id").alias("_ida"), F.col("v").alias("va"), F.col("n2").alias("na")
    )
    vb = vi.select(
        F.col("vec_id").alias("_idb"), F.col("v").alias("vb"), F.col("n2").alias("nb")
    )
    return (
        cand_ids.join(va, cand_ids["vec_id"] == va["_ida"])
        .join(vb, cand_ids["nb_id"] == vb["_idb"])
        .withColumn(
            "sim",
            _pair_sim_col_i32(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")),
        )
    )


def lsh_candidate_pairs(
    embeddings: DataFrame,
    tau: float = LSH_TAU,
    probes: bool = MULTIPROBE,
    signature_df: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs within Hamming-1 on ≥1 band (multi-probe; exact
    bucket match when ``probes=False``), then exact-cosine filtered at
    tau. (vec_a, vec_b, n_bands, sim_x1m). The join is a plain equi-join on
    (band, bucket) over ids-only keys — the scale path (no cross join
    anywhere, no vector bytes through the pair shuffle). ``n_bands`` counts
    bands whose buckets are within the probe radius (each band matches at
    most one probe mask, so multiplicity stays 0/1 per band).
    ``signature_df``: a precomputed/materialized lsh_signature — the
    index-reuse seam (the index is stored once, every lookup derives from
    it)."""
    bk = signature_df if signature_df is not None else lsh_signature(embeddings)
    left = _expand_probes(bk) if probes else bk
    cand_ids = (
        left.join(
            bk.select(
                F.col("vec_id").alias("nb_id"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .where(F.col("vec_id") < F.col("nb_id"))
        .groupBy("vec_id", "nb_id")
        .agg(F.count("*").cast("long").alias("n_bands"))
    )
    cand = _attach_vectors(cand_ids, _vecs(embeddings)).where(F.col("sim") >= tau)
    return cand.select(
        F.col("vec_id").alias("vec_a"),
        F.col("nb_id").alias("vec_b"),
        "n_bands",
        F.floor(F.col("sim") * 1_000_000).cast("long").alias("sim_x1m"),
    )


def lsh_topk(
    embeddings: DataFrame,
    k: int = LSH_TOPK,
    queries: DataFrame | None = None,
    probes: bool = MULTIPROBE,
    signature_df: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: rank exact cosine *within LSH candidates only*
    (both directions of each pair). ``queries`` optionally restricts the
    ranked side; with a materialized ``signature_df`` the query-side keys
    come from a semi-join on the index (no recompute), otherwise they are
    re-derived (a narrow projection). The query side is multi-probe-
    expanded by default (see lsh_probe_keys). (vec_id, rank, neighbor_id)."""
    bk = signature_df if signature_df is not None else lsh_signature(embeddings)
    if queries is None:
        qsig = bk
    elif signature_df is not None:
        qsig = bk.join(queries.select("vec_id"), "vec_id", "left_semi")
    else:
        qsig = lsh_signature(queries)
    left = _expand_probes(qsig) if probes else qsig
    cand_ids = (
        left.join(
            bk.select(F.col("vec_id").alias("nb_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .where(F.col("vec_id") != F.col("nb_id"))
        .groupBy("vec_id", "nb_id")
        .agg(F.count("*").alias("_nb"))
        .drop("_nb")
    )
    cand = _attach_vectors(cand_ids, _vecs(embeddings))
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


# -------------------------------------------- corpus-sized LSH (deployment)
# The gated 96-plane index keeps 8-bit bands so every query stays
# expressible as the DuckDB twin (2⁸ bucket literals). But band buckets
# must be SIZED TO THE CORPUS: with sign bits ~uniform, a band's random
# candidate volume is ~n²/2^bits pairs, so 8-bit bands saturate past
# ~10⁵ vectors (at n = 10⁶ they'd emit ~4×10⁹ spurious candidates per
# band — O(n²) in disguise). The deployment rule is bits_per_band ≈
# log2(n): 20 bits at 10⁶ vectors ⇒ ~1 spurious candidate per vector
# per band; ~30 bits at 10⁹. Recall at fixed bits is bought with BANDS
# (each an independent hash table), not with probes: sized-up buckets
# put sim ≳ 0.99 near-dups (per-bit sign agreement 1 − θ/π ≈ 0.955+)
# in the same bucket on ≥1 of 12 bands w.p. ≥ 0.998; for a lower tau,
# add bands. These builders are Arrow-only (no per-plane SQL twin —
# the plane matrix is ~240×64; correctness is pinned by the pytest
# planted-pair suite and the cross-parallelism checksum in
# `bench.py --scaling-sim` instead of a DuckDB oracle).

def make_scaled_planes(
    n_bands: int, bits_per_band: int, seed: int = 42, dim: int = DIM
) -> np.ndarray:
    """Hyperplane matrix for a corpus-sized index — same ×QUANT integer
    rounding as PLANES, so every projection stays exact (|q|·|p|·DIM ≲
    1e6 · 5e6 · 64 ≈ 3×10¹⁴ ≪ 2⁵³) and both parallelism levels of the
    scaling bench compute bit-identical buckets."""
    rng = np.random.default_rng(seed)
    return np.rint(rng.standard_normal((n_bands * bits_per_band, dim)) * QUANT)


SCALED_BITS_PER_BAND = 20  # sized for ~10⁶-vector corpora (see above)


def scaled_lsh_signature(
    embeddings: DataFrame,
    n_bands: int = N_BANDS,
    bits_per_band: int = SCALED_BITS_PER_BAND,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, band, bucket) with corpus-sized buckets — the deployment
    form of ``lsh_signature``. Build shape is identical: one Arrow BLAS
    matmul per batch against a constant plane matrix, narrow projection,
    posexplode, ZERO shuffle — the embarrassingly-parallel full-corpus
    pass. The plane matrix ships to executors once in the UDF closure
    (~n_bands·bits·DIM·8 B ≈ 120 KB at the defaults)."""
    planes = make_scaled_planes(n_bands, bits_per_band, seed)
    abs_max = float(np.abs(planes).max())

    @pandas_udf(ArrayType(LongType()))
    def _bks(v: pd.Series) -> pd.Series:
        q = _np_rows(v)
        _check_exact(q, abs_max)
        return pd.Series(list(pack_band_bits(q, planes, n_bands, bits_per_band)))

    # nondeterministic = single evaluation under the explode-inferred
    # filter (see _band_buckets_nd); the kernel itself is pure
    return (
        _vecs(embeddings)
        .select("vec_id", _bks.asNondeterministic()(F.col("v")).alias("bks"))
        .select("vec_id", F.posexplode("bks").alias("band", "bucket"))
        .select(
            "vec_id",
            F.col("band").cast("long").alias("band"),
            # the recipe triple IS the index's identity: stamp it as
            # column metadata (survives localCheckpoint AND a parquet
            # round-trip via spark's row-metadata footer key) so a stored
            # index probed with a different recipe fails loudly in
            # scaled_lsh_pairs instead of silently losing recall
            F.col("bucket").alias(
                "bucket",
                metadata={
                    "lsh_n_bands": n_bands,
                    "lsh_bits_per_band": bits_per_band,
                    "lsh_seed": seed,
                },
            ),
        )
    )


def scaled_lsh_pairs(
    embeddings: DataFrame,
    tau: float,
    n_bands: int = N_BANDS,
    bits_per_band: int = SCALED_BITS_PER_BAND,
    seed: int = 42,
    signature_df: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs over the corpus-sized index: ids-only
    equi-join on (band, bucket) — 24 B/row through the one pair shuffle —
    then exact-cosine verify on candidates only, vectors re-attached once
    per deduped pair (``_attach_vectors``). No multi-probe: probing
    compensates UNDER-sized buckets; a corpus-sized index relies on band
    count for recall (module comment above). ``signature_df``: a stored
    index built by ``scaled_lsh_signature`` with the SAME
    (n_bands, bits_per_band, seed) — the reuse seam; the recipe triple is
    part of the index's identity exactly like the streaming dedup
    recipe (``stream_dedup`` module header).
    (vec_a, vec_b, n_bands, sim_x1m)."""
    if signature_df is not None:
        # the stored index carries its recipe as column metadata (stamped
        # by scaled_lsh_signature); a mismatched probe recipe would yield
        # silently wrong recall, so reject it here. Absent metadata
        # (index built by other means) keeps the documented contract.
        meta = dict(signature_df.schema["bucket"].metadata or {})
        if meta and (
            meta.get("lsh_n_bands") != n_bands
            or meta.get("lsh_bits_per_band") != bits_per_band
            or meta.get("lsh_seed") != seed
        ):
            raise ValueError(
                "scaled_lsh_pairs: stored signature index was built with "
                f"recipe (n_bands={meta.get('lsh_n_bands')}, "
                f"bits_per_band={meta.get('lsh_bits_per_band')}, "
                f"seed={meta.get('lsh_seed')}) but was probed with "
                f"(n_bands={n_bands}, bits_per_band={bits_per_band}, "
                f"seed={seed}); the recipe triple is part of the index's "
                "identity — rebuild the index or probe with its recipe"
            )
        bk = signature_df
    else:
        bk = scaled_lsh_signature(embeddings, n_bands, bits_per_band, seed)
    # one pair path: the candidate join / dedup / verify / projection live
    # in lsh_candidate_pairs; this form is exactly probes=False over the
    # corpus-sized signature
    return lsh_candidate_pairs(embeddings, tau, probes=False, signature_df=bk)


# ------------------------------------------------------------------- IVF
# The second ANN strategy the training-data brief names (IVF): a coarse
# quantizer partitions the corpus into K_CELLS Voronoi cells; each vector
# is indexed under its best cell, and a query probes its NPROBE best
# cells. Index = one bigint per vector (vs N_BANDS rows for LSH);
# candidates ≈ NPROBE/K_CELLS of the corpus per query. Centroids are
# deterministic module literals (integer-valued ×QUANT like PLANES) so
# both engines score identically. The quantizer is TRAINED:
# scripts/train_ivf.py drives the gated distributed Lloyd step
# (``kmeans_iterate``) to convergence on the sf0.1 fixture (33 iters)
# and emits ``_ivf_centroids.TRAINED_CENTROIDS``. Measured recall@3 at
# identical candidate volume on the training corpus (sf0.1, 2000 vecs):
#   nprobe=4: seed 0.509 → trained 0.586   (both ≈25% candidates)
#   nprobe=6: seed 0.659 → trained 0.730   (both ≈37% candidates)
# Off-sample (sf0.01) the trained quantizer does NOT transfer (0.426 vs
# 0.457 seed at nprobe=4) — iid gaussian fixtures have no cluster
# structure to learn, so train-on-the-corpus-you-index is the procedure
# (which is also what production IVF does). Multi-probe LSH still leads
# on this adversarial fixture (0.786 at 36%); on genuinely clustered
# embedding corpora trained IVF flips the comparison.
K_CELLS = 16
NPROBE = 4


def _make_centroids(k: int = K_CELLS, dim: int = DIM, seed: int = 7) -> list[list[float]]:
    """Seed init for the quantizer (unit-norm seeded gaussians) — what
    scripts/train_ivf.py starts Lloyd from; NOT what production scores
    against (that is TRAINED_CENTROIDS below)."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((k, dim))
    c = c / np.linalg.norm(c, axis=1, keepdims=True)  # unit norm: dot == cosine rank
    return [[float(round(x * QUANT)) for x in row] for row in c]  # exact ints


from ._ivf_centroids import TRAINED_CENTROIDS  # noqa: E402

CENTROIDS: list[list[float]] = TRAINED_CENTROIDS


def _centroids_np() -> np.ndarray:
    return np.array(CENTROIDS, dtype=np.float64)


@pandas_udf(ArrayType(LongType()))
def _ranked_cells_pd(v: pd.Series) -> pd.Series:
    """All K_CELLS cell ids ranked by (score desc, cell asc) in one
    matmul per Arrow batch — argmax is element 1, the probe list is the
    head slice. Stable argsort on the exact integer scores keeps ties in
    column order = cell ASC, the shared deterministic tie rule."""
    q = _np_rows(v)
    cents = _centroids_np()
    _check_exact(q, float(np.abs(cents).max()))
    scores = q @ cents.T                                 # exact
    order = np.argsort(-scores, axis=1, kind="stable").astype(np.int64)
    return pd.Series(list(order))


# same duplicate-evaluation guard as _band_buckets_nd (the probe-cell
# explode in ivf_probe_cells otherwise runs the 16-centroid matmul twice)
_ranked_cells_nd = _ranked_cells_pd.asNondeterministic()


def _cell_scores() -> Column:
    """JVM twin of the centroid scoring (array of (score, nc) structs,
    nc = -cell so lexicographic DESC = (score desc, cell asc)) — kept for
    the equality tests; production ranks cells in ``_ranked_cells_pd``."""
    return F.array(
        *[
            F.struct(
                _dot(F.col("v"), F.array(*[F.lit(x) for x in CENTROIDS[c]])).alias("s"),
                F.lit(-c).cast("long").alias("nc"),
            )
            for c in range(K_CELLS)
        ]
    )


def ivf_assign(embeddings: DataFrame, impl: str = "arrow") -> DataFrame:
    """(vec_id, cell): the IVF index — each vector under its best-scoring
    cell. One vectorized matmul + head-of-ranking per Arrow batch
    (``impl="jvm"``: the sort_array-over-structs twin); no explode, no
    shuffle: the index build is embarrassingly parallel."""
    if impl == "arrow":
        cell = F.element_at(_ranked_cells_pd(F.col("v")), 1)
    else:
        cell = (-F.sort_array(_cell_scores(), asc=False)[0]["nc"]).cast("long")
    return _vecs(embeddings).select("vec_id", cell.alias("cell"))


def semantic_near_dup(
    embeddings: DataFrame,
    tau: float = NEAR_DUP_TAU,
    assign_df: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    confine the near-duplicate search to vectors quantized into the SAME
    IVF cell, then exact-cosine re-rank inside each cell. This is the
    scale path of ``cosine_near_dup``: candidate generation is an
    equi-join on ``cell`` (each vector lives in exactly one cell, so every
    pair is generated at most once — no dedup aggregation), bounding the
    all-pairs blow-up per cell instead of globally. Pairs move ids-only
    through the join; vectors are re-attached once per candidate
    (``_attach_vectors``). With trained (balanced) centroids each cell is
    O(n/k) and the per-cell block join is local work.
    ``assign_df``: a materialized ``ivf_assign`` index (the reuse seam).
    (vec_a, vec_b, cell, sim_x1m)."""
    assign = assign_df if assign_df is not None else ivf_assign(embeddings)
    right = assign.select(F.col("vec_id").alias("nb_id"), "cell")
    cand_ids = (
        assign.join(right, "cell")
        .where(F.col("vec_id") < F.col("nb_id"))
        .select("vec_id", "nb_id", "cell")
    )
    cand = _attach_vectors(cand_ids, _vecs(embeddings))
    return cand.where(F.col("sim") >= tau).select(
        F.col("vec_id").alias("vec_a"),
        F.col("nb_id").alias("vec_b"),
        F.col("cell").cast("long").alias("cell"),
        F.floor(F.col("sim") * 1_000_000).cast("long").alias("sim_x1m"),
    )


def ivf_probe_cells(embeddings: DataFrame, nprobe: int = NPROBE) -> DataFrame:
    """(vec_id, cell) — each query's NPROBE best cells (head slice of the
    vectorized ranking, then a tiny explode)."""
    return _vecs(embeddings).select(
        "vec_id",
        F.explode(
            F.slice(_ranked_cells_nd(F.col("v")), 1, nprobe)
        ).alias("cell"),
    )


def _ivf_cell_topk(key, qpdf: pd.DataFrame, mpdf: pd.DataFrame) -> pd.DataFrame:
    """Per-cell block kernel: (queries probing this cell) × (members of
    this cell) in ONE exact matmul, then per-query top-k with the shared
    tie rule (sim desc, nb_id asc — members id-sorted + stable argsort).
    Queries are processed in 1024-row slices so the sim matrix stays
    bounded by 1024 × |cell|. Emits (vec_id, nb_id, sim) — at most k rows
    per (query, cell), the partial the global re-rank consumes."""
    out = []
    if len(qpdf) and len(mpdf):
        mpdf = mpdf.sort_values("nb_id")
        nb_ids = mpdf["nb_id"].to_numpy(dtype=np.int64)
        mm = _np_rows(mpdf["vb"])
        n2m = mpdf["nb"].to_numpy(dtype=np.float64)
        mm_abs = float(np.abs(mm).max()) if mm.size else 0.0
        for lo in range(0, len(qpdf), 1024):
            qc = qpdf.iloc[lo:lo + 1024]
            qids = qc["vec_id"].to_numpy(dtype=np.int64)
            qm = _np_rows(qc["va"])
            # guard both matmul operands (queries may come from a
            # different, larger-valued table than the indexed corpus)
            _check_exact(qm, mm_abs)
            n2q = qc["na"].to_numpy(dtype=np.float64)
            sims = (qm @ mm.T) / np.sqrt(np.outer(n2q, n2m))
            sims[qids[:, None] == nb_ids[None, :]] = -np.inf  # self-mask
            kk = min(int(qc["k"].iloc[0]), sims.shape[1])
            idx = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            top = np.take_along_axis(sims, idx, axis=1)
            keep = np.isfinite(top.ravel())
            out.append(pd.DataFrame({
                "vec_id": np.repeat(qids, kk)[keep],
                "nb_id": nb_ids[idx].ravel()[keep],
                "sim": top.ravel()[keep],
            }))
    return (
        pd.concat(out)
        if out
        else pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                           "nb_id": pd.Series(dtype="int64"),
                           "sim": pd.Series(dtype="float64")})
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = LSH_TOPK,
    queries: DataFrame | None = None,
    nprobe: int = NPROBE,
    assign_df: DataFrame | None = None,
    impl: str = "block",
) -> DataFrame:
    """Approximate top-k via IVF: rank exact cosine within the probed
    cells. Each corpus vector lives in exactly ONE cell and a query probes
    nprobe distinct cells, so a (query, neighbor) candidate appears at most
    once — no dedup aggregation at all (vs LSH's per-pair groupBy).

    ``impl="block"`` (default, the FAISS shape): cogroup queries and
    members by cell and scan each cell's inverted list with ONE matmul per
    1024-query slice — every vector crosses Arrow once per cell it touches
    (members ×1, queries ×nprobe) instead of twice per candidate pair, and
    the per-pair interpreted fold disappears (measured 7.5 s → sub-second
    at sf0.1). Per-cell partials are ≤ k rows per (query, cell); the global
    re-rank windows over ≤ nprobe·k rows per query. The sim arithmetic is
    the byte-identical IEEE sequence of ``_pair_sim_col`` (exact integer
    dot, then /sqrt(na·nb)), so block ≡ join bitwise — asserted in tests.
    Scale contract (same as FAISS): K_CELLS grows ~√n so one cell's
    inverted list is a bounded block per task; the 1024-row query slicing
    bounds the matmul regardless of probe fan-in.

    ``impl="join"``: the ids-only candidate join + per-pair JVM fold —
    the streaming twin kept for the equality test.
    ``assign_df``: a materialized ivf_assign index (the reuse seam).
    (vec_id, rank, neighbor_id)."""
    assign = assign_df if assign_df is not None else ivf_assign(embeddings)
    qside = queries if queries is not None else embeddings
    probes = ivf_probe_cells(qside, nprobe=nprobe)
    if impl == "block":
        v = _vecs(embeddings)
        mem = assign.join(v, "vec_id").select(
            "cell",
            F.col("vec_id").alias("nb_id"),
            F.col("v").alias("vb"),
            F.col("n2").alias("nb"),
        )
        qs = probes.join(_vecs(qside), "vec_id").select(
            "cell", "vec_id",
            F.col("v").alias("va"), F.col("n2").alias("na"),
            F.lit(k).alias("k"),
        )
        partial = qs.groupBy("cell").cogroup(mem.groupBy("cell")).applyInPandas(
            _ivf_cell_topk, "vec_id long, nb_id long, sim double"
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.col("nb_id"))
        return (
            partial.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "vec_id",
                F.col("rank").cast("long").alias("rank"),
                F.col("nb_id").alias("neighbor_id"),
            )
        )
    cand_ids = (
        probes.join(
            assign.select(F.col("vec_id").alias("nb_id"), "cell"), ["cell"]
        )
        .where(F.col("vec_id") != F.col("nb_id"))
        .select("vec_id", "nb_id")
    )
    cand = _attach_vectors(cand_ids, _vecs(embeddings))
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


def centroid_update(
    embeddings: DataFrame, assign_df: DataFrame | None = None
) -> DataFrame:
    """One Lloyd iteration's reduce step — the k-means refit that turns
    the fixed quantizer into a trained one: per (cell, dim), the exact
    component sum and member count (the combiner state; the new centroid
    is sum/n, derived by the tiny driver-side step that also re-emits the
    literals). The components ARE the quantized integers
    (``rint(e·10⁶) → long``), so the sums are associative-exact — a float
    sum's value depends on reduction order and can never hash-gate.
    (cell, dim, sum_x1m, n_members).

    Scale shape: with no ``assign_df``, assignment is inlined into the
    projection (one Arrow matmul batch, join-free), so the whole update is
    scan → posexplode(×DIM) → ONE partial-agg shuffle whose distinct key
    space is K_CELLS·DIM rows — each map task pre-collapses to at most
    that many rows regardless of input size, the canonical map-combined
    k-means step (what MLlib's KMeans does per iteration via
    treeAggregate). With a materialized ``assign_df`` (the reuse seam) it
    is one extra equi-join on vec_id."""
    v = _vecs(embeddings).select("vec_id", "v")
    if assign_df is None:
        base = _vecs(embeddings).select(
            F.element_at(_ranked_cells_pd(F.col("v")), 1).alias("cell"), "v"
        )
    else:
        base = assign_df.join(v, "vec_id").select("cell", "v")
    ex = base.select("cell", F.posexplode("v").alias("dim", "e"))
    return ex.groupBy("cell", F.col("dim").cast("long").alias("dim")).agg(
        F.sum(F.col("e").cast("long")).cast("long").alias("sum_x1m"),
        F.count("*").cast("long").alias("n_members"),
    )


def kmeans_iterate(
    embeddings: DataFrame, assign_df: DataFrame | None = None
) -> DataFrame:
    """One full distributed Lloyd iteration — the loop body that trains the
    IVF quantizer: refit centroids from the current assignment
    (``centroid_update``'s exact integer sums), then re-assign every vector
    to its nearest refit centroid. Iterating this to convergence is
    k-means (scripts/train_ivf.py drives the loop). (vec_id, cell).

    Scale shape: the reduce is ``centroid_update`` (one partial-agg
    shuffle, ≤ K·DIM rows out); folding sums into K centroid arrays is a
    K-row aggregate; re-scoring joins every vector against the K-row
    centroid table via BROADCAST (the only sane plan when one side is 16
    rows), and the argmax is ``max(struct(score, -cell))`` — partial-max,
    map-combinable, deterministic under the shared (score desc, cell asc)
    tie rule. Means are exact-integer sums divided once per (cell, dim) —
    both engines do the same two IEEE divisions on identical int64 pairs,
    so scores match bitwise and the gate stays hash-exact. (The refit
    centroids are runtime values, not literals, so this path keeps the
    JVM fold — K dots per row, not a hot constant.)"""
    upd = centroid_update(embeddings, assign_df=assign_df)
    cents = (
        upd.groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "sum_x1m", "n_members"))
            ).alias("a")
        )
        .select(
            F.col("cell").alias("c_cell"),
            F.transform(
                "a",
                lambda s: (s["sum_x1m"].cast("double") / s["n_members"])
                / F.lit(1_000_000.0),
            ).alias("c_v"),
        )
    )
    v = _vecs(embeddings).select("vec_id", "v")
    scored = v.join(F.broadcast(cents)).select(
        "vec_id",
        F.struct(
            _dot(F.col("v"), F.col("c_v")).alias("s"),
            (-F.col("c_cell")).cast("long").alias("nc"),
        ).alias("sc"),
    )
    return scored.groupBy("vec_id").agg(
        (-F.max("sc")["nc"]).cast("long").alias("cell")
    )


def ivf_recall(
    embeddings: DataFrame,
    k: int = LSH_TOPK,
    query_sample_16ths: int = 4,
    nprobe: int = NPROBE,
    assign_df: DataFrame | None = None,
) -> DataFrame:
    """Measured recall@k of the IVF index vs brute-force ground truth —
    same gate shape as lsh_recall. One row:
    (n_vecs, n_hits, recall_x1000)."""
    queries = _query_sample(embeddings, query_sample_16ths)
    truth = brute_topk(embeddings, k=k, queries=queries).select(
        "vec_id", "neighbor_id"
    )
    approx = ivf_topk(
        embeddings, k=k, queries=queries, nprobe=nprobe, assign_df=assign_df
    ).select("vec_id", "neighbor_id", F.lit(1).alias("hit"))
    joined = truth.join(approx, ["vec_id", "neighbor_id"], "left")
    return joined.agg(
        F.countDistinct("vec_id").cast("long").alias("n_vecs"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        F.floor(
            1000 * F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count("*")
        )
        .cast("long")
        .alias("recall_x1000"),
    )


QUERY_SAMPLE_16THS = 4  # recall measured over 4/16 of vectors as queries


def _query_sample(embeddings: DataFrame, keep_16ths: int) -> DataFrame:
    """Deterministic content-hash sample of QUERY vectors (same nibble
    scheme as text.sample_stratified — reproducible, engine-portable,
    never rand())."""
    nib = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    return embeddings.where(nib < keep_16ths)


def lsh_recall(
    embeddings: DataFrame,
    k: int = LSH_TOPK,
    query_sample_16ths: int = QUERY_SAMPLE_16THS,
    signature_df: DataFrame | None = None,
) -> DataFrame:
    """Measured recall@k of the LSH index vs exact brute-force ground truth
    — the number that turns the ANN path from "runs" into "shippable".
    One row: (n_vecs, n_hits, recall_x1000) with
    recall_x1000 = floor(1000 · |approx ∩ truth| / |truth|), integer math.

    Recall is estimated over a deterministic hash-sample of QUERY vectors
    (default 4/16) ranked against the FULL corpus — ground truth for a
    sampled query needs every candidate, but not every vector needs to be
    a query; sampling the query side cuts the brute-force cost by
    16/query_sample_16ths at identical statistical value. The quadratic
    guard still applies through ``brute_topk``: at 100 TB you run this on
    a ≲10⁵-vector corpus sample to tune (N_BANDS, BITS_PER_BAND), then
    deploy the LSH path corpus-wide.

    Measured on the fixture (500 iid-gaussian 64-dim vecs — the adversarial
    near-orthogonal case; see the parameter sweep at the top of this
    module): recall@3 = 0.786 at 12 bands × 8 bits with Hamming-1
    multi-probe, 35.9% candidate volume (r2: 0.584 at 23% without probes).
    The value is recorded by the driver's CORRECTNESS gate every round, so
    a re-tune that silently hurts recall fails the gate."""
    queries = _query_sample(embeddings, query_sample_16ths)
    truth = brute_topk(embeddings, k=k, queries=queries).select(
        "vec_id", "neighbor_id"
    )
    approx = lsh_topk(
        embeddings, k=k, queries=queries, signature_df=signature_df
    ).select(
        "vec_id", "neighbor_id", F.lit(1).alias("hit")
    )
    joined = truth.join(approx, ["vec_id", "neighbor_id"], "left")
    return joined.agg(
        F.countDistinct("vec_id").cast("long").alias("n_vecs"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        F.floor(
            1000 * F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count("*")
        )
        .cast("long")
        .alias("recall_x1000"),
    )


def norm_stats(embeddings: DataFrame) -> DataFrame:
    """Embedding QA: the L2-norm distribution in 0.1-wide buckets — the
    sanity check a pipeline runs before trusting an embedding column
    (collapsed/zero vectors, un-normalized batches and mixed model
    versions all show up as histogram anomalies). Norms come from the
    exact quantized n2 (×QUANT², so /1000 restores the ×1000 integer
    scale every cross-engine float in this repo uses); the floor/div are
    the same IEEE ops in both engines.

    Scale shape: one narrow projection (the per-row dot product runs over
    the array column) + a partial-agg groupBy on ≤ a few hundred bucket
    keys. (norm_x10, n_vecs, min_norm_mill, max_norm_mill).

    Degenerate vectors (any NaN/Inf/NULL component, or a NULL vector)
    land in sentinel bucket norm_x10 = -1 with NULL min/max — the QA
    query must SURFACE them, and without the explicit classification the
    engines disagree on what a NaN norm even is (Spark's non-ANSI NaN→
    long cast gives bucket 0, Inf gives Long.MAX/100, while DuckDB
    hard-errors casting NaN to BIGINT). Zero vectors stay in bucket 0,
    as before.
    """
    # drop_zero=False: this is the one query whose JOB is to surface the
    # zero/collapsed/degenerate vectors every other operator excludes
    v = _vecs(embeddings, drop_zero=False)
    fin = F.coalesce(_finite_vec(), F.lit(False))
    norm_mill = F.when(
        fin, F.floor(F.sqrt(F.col("n2")) / 1000.0).cast("long")
    )
    return (
        v.select(norm_mill.alias("norm_mill"))
        .select(
            F.coalesce(
                F.expr("norm_mill div 100"), F.lit(-1).cast("long")
            ).alias("norm_x10"),
            "norm_mill",
        )
        .groupBy("norm_x10")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.min("norm_mill").alias("min_norm_mill"),
            F.max("norm_mill").alias("max_norm_mill"),
        )
    )
