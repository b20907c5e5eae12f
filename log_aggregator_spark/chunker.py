"""Derive the canonical ``sequences`` and ``chunks`` tables from the shared
``documents`` parquet, entirely with JVM-side built-in functions (no Python in
the hot path; whole-stage codegen end to end).

This stage plays the role of the reference's *agent + datapump* processes —
tailing a source and emitting keyed ≤64KB chunks
(``/root/reference/agent/.../LogTail.java:239-284``,
``/root/reference/agent/.../dataPump/DataPumpImpl.java:37-89``) — but as a
deterministic, engine-portable derivation so a DuckDB oracle can reproduce it
bit-for-bit (see ``oracle_sql.py``). The perturbations reproduce the arrival
pathologies the decoder must survive: duplicates, gaps, lost prefixes,
multi-session docs, resume-from-checkpoint (SURVEY.md §2 S7/S10/S11/S13).

Scale note: every operation here is a narrow projection (sequence/filter/
posexplode) — no shuffle at all until the pipeline's reassembly groupBy.
At 100 TB the chunks table would be the stored input (the Iceberg table of
the north rule); this module is only the test/bench generator of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import spec


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _n_tok(text: Column) -> Column:
    # Word count of the whitespace-tokenized text; identical in DuckDB as
    # len(regexp_split_to_array(trim(text), '\s+')).
    return F.size(F.split(F.trim(text), r"\s+"))


def sequences(documents: DataFrame) -> DataFrame:
    """The input table of BASELINE.json input_hint:
    (doc_id string, tokens array<int>, n_tok int, source string).

    tokens = [1..n_tok] counter payload (logGen/logCheck analog)."""
    return documents.select(
        F.format_string(spec.DOC_ID_FMT, F.col("doc_id")).alias("doc_id"),
        F.col("doc_id").alias("dnum"),
        F.sequence(F.lit(1), _n_tok(F.col("text"))).cast("array<int>").alias("tokens"),
        _n_tok(F.col("text")).cast("int").alias("n_tok"),
        F.col("source"),
    )


def chunks(documents: DataFrame, perturb: bool = True) -> DataFrame:
    """The shipped-chunk table (LogPart analog):
    (envelope string, chunk_tokens array<int>, source string).

    doc_id/session/seq are carried ONLY inside the envelope string — the
    pipeline's parse stage must re-extract them (the reference's
    PBLogFile.java:17-27 regex moment).

    Derivation per doc:
      n_chunks = ceil(n_tok / CHUNK); global chunk k=1..n_chunks holds tokens
      (k-1)*CHUNK+1 .. min(k*CHUNK, n_tok).
      MULTISESSION docs split the run: first ceil(n_chunks/2) chunks →
      session SESSION_BASE (seq=k), rest → SESSION_BASE+SESSION_STEP with seq
      renumbered from 1.
    Perturbations (first session only):
      DUP: duplicate seq 2.  GAP: drop seq 3.  LOST_PREFIX: drop seq ≤ 2.
      (dup applied before drops, so a dropped seq removes its dup too)
    """
    seq_df = sequences(documents)

    n_chunks = F.ceil(F.col("n_tok") / spec.CHUNK).cast("long")
    base = seq_df.withColumn("n_chunks", n_chunks).withColumn(
        "half",
        F.when(
            (F.col("dnum") % spec.MOD_MULTISESSION == 0) & (F.col("n_chunks") >= 2),
            F.ceil(F.col("n_chunks") / 2).cast("long"),
        ).otherwise(F.col("n_chunks")),
    )

    exploded = base.select(
        "doc_id",
        "dnum",
        "tokens",
        "n_tok",
        "source",
        "half",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_chunks"))).alias("k"),
    )

    lo = (F.col("k") - 1) * spec.CHUNK
    hi = F.col("k") * spec.CHUNK
    with_keys = exploded.select(
        "doc_id",
        "dnum",
        "source",
        F.when(F.col("k") <= F.col("half"), F.lit(spec.SESSION_BASE))
        .otherwise(F.lit(spec.SESSION_BASE + spec.SESSION_STEP))
        .cast("long")
        .alias("session"),
        F.when(F.col("k") <= F.col("half"), F.col("k"))
        .otherwise(F.col("k") - F.col("half"))
        .alias("seq"),
        # tokens are the counter [1..n], so a value-range filter IS the slice —
        # portable to DuckDB list_filter and stays inside codegen.
        F.filter(F.col("tokens"), lambda t: (t > lo) & (t <= hi)).alias("chunk_tokens"),
    )

    if perturb:
        dup = with_keys.where(
            (F.col("dnum") % spec.MOD_DUP == 0)
            & (F.col("session") == spec.SESSION_BASE)
            & (F.col("seq") == 2)
        )
        with_keys = with_keys.unionAll(dup)
        first = F.col("session") == spec.SESSION_BASE
        with_keys = with_keys.where(
            ~(first & (F.col("dnum") % spec.MOD_GAP == 0) & (F.col("seq") == 3))
        ).where(
            ~(first & (F.col("dnum") % spec.MOD_LOST_PREFIX == 0) & (F.col("seq") <= 2))
        )

    return with_keys.select(
        F.format_string(
            spec.ENVELOPE_FMT, F.col("doc_id"), F.col("session"), F.col("seq")
        ).alias("envelope"),
        F.col("chunk_tokens"),
        F.col("source"),
    )


def synth_chunks(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    min_tok: int = 64,
    max_tok: int = 1024,
    chunk: int = 64,
    n_sources: int = 32,
    hot_permille: int = 500,
    dup_mod: int = 16,
    gap_mod: int = 997,
) -> DataFrame:
    """Deterministic synthetic chunk corpus for scale benchmarking — the
    sandbox stand-in for the north rule's 10^12-sequence Iceberg table
    (driver instruction: synthesize the input-hint shape at small scale;
    no external data).

    Entirely JVM built-ins (codegen end to end, no Python, no shuffle):
    every value is integer arithmetic on ``spark.range`` ids, so the corpus
    is bit-identical across runs/partitionings. ``hot_permille``/1000 of
    docs land on src0 → its sink carries ~50% of rows, reproducing the
    hot-source skew the north rule requires the router to survive.
    Perturbations (sparse): 1/dup_mod docs duplicate seq 2; 1/gap_mod docs
    drop seq 3 (held-back suffix path stays exercised at scale).

    Schema matches ``chunks()``: (envelope string, chunk_tokens array<int>,
    source string).
    """
    did = F.col("id")
    h = lambda salt: F.xxhash64(did, F.lit(seed), F.lit(salt))  # noqa: E731
    n_tok = (F.pmod(h(1), F.lit(max_tok - min_tok + 1)) + F.lit(min_tok)).cast("int")
    roll = F.pmod(h(2), F.lit(1000))
    src_k = F.when(roll < F.lit(hot_permille), F.lit(0)).otherwise(
        F.pmod(h(3), F.lit(n_sources - 1)) + 1
    )
    docs = spark.range(n_docs).select(
        did.alias("dnum"),
        F.format_string("doc%09d", did).alias("doc_id"),
        n_tok.alias("n_tok"),
        F.concat(F.lit("src"), src_k.cast("string")).alias("source"),
    )

    n_chunks = F.ceil(F.col("n_tok") / chunk).cast("long")
    base = docs.withColumn("n_chunks", n_chunks).withColumn(
        "half",
        F.when(
            (F.col("dnum") % spec.MOD_MULTISESSION == 0) & (F.col("n_chunks") >= 2),
            F.ceil(F.col("n_chunks") / 2).cast("long"),
        ).otherwise(F.col("n_chunks")),
    )
    exploded = base.select(
        "dnum",
        "doc_id",
        "n_tok",
        "source",
        "half",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_chunks"))).alias("k"),
    )

    lo = (F.col("k") - 1) * chunk
    hi = F.least(F.col("k") * chunk, F.col("n_tok").cast("long"))
    # token value at position p: multiplicative mixing into a GPT-2-sized
    # vocab — spreads like a hash but stays pure codegen arithmetic.
    # Reduce mod 2^31 before the multiply so ANSI mode never overflows long.
    mix = F.pmod(F.col("dnum") * F.lit(1_000_003) + F.lit(seed), F.lit(2_147_483_647))
    with_keys = exploded.select(
        "dnum",
        "doc_id",
        "source",
        F.when(F.col("k") <= F.col("half"), F.lit(spec.SESSION_BASE))
        .otherwise(F.lit(spec.SESSION_BASE + spec.SESSION_STEP))
        .cast("long")
        .alias("session"),
        F.when(F.col("k") <= F.col("half"), F.col("k"))
        .otherwise(F.col("k") - F.col("half"))
        .alias("seq"),
        F.transform(
            F.sequence(lo + 1, hi),
            lambda p: F.pmod(
                F.pmod(mix + p, F.lit(2_147_483_647)) * F.lit(48_271), F.lit(50_257)
            ).cast("int"),
        ).alias("chunk_tokens"),
    )

    dup = with_keys.where(
        (F.col("dnum") % dup_mod == 0)
        & (F.col("session") == spec.SESSION_BASE)
        & (F.col("seq") == 2)
    )
    with_keys = with_keys.unionAll(dup).where(
        ~(
            (F.col("dnum") % gap_mod == 0)
            & (F.col("session") == spec.SESSION_BASE)
            & (F.col("seq") == 3)
        )
    )
    return with_keys.select(
        F.format_string(
            spec.ENVELOPE_FMT, F.col("doc_id"), F.col("session"), F.col("seq")
        ).alias("envelope"),
        F.col("chunk_tokens"),
        F.col("source"),
    )


def checkpoint_table(documents: DataFrame) -> DataFrame:
    """Resume state (SequenceTracker .lastSeq analog,
    /root/reference/datadecoder/.../SequenceTracker.java:122-154):
    (doc_id, session, last_seq). CKPT docs resume their first session at
    last_seq=1 — chunks with seq ≤ 1 were consumed by a previous run."""
    return (
        sequences(documents)
        .where(F.col("dnum") % spec.MOD_CKPT == 0)
        .select(
            "doc_id",
            F.lit(spec.SESSION_BASE).cast("long").alias("session"),
            F.lit(1).cast("long").alias("last_seq"),
        )
    )


def routes_table(documents: DataFrame) -> DataFrame:
    """Enrichment lookup (north-star requirement; broadcast-join side):
    source 'srcK' → sink 'sink{K % N_SINKS}', priority K % N_PRIORITIES."""
    knum = F.substring(F.col("source"), 4, 10).cast("int")
    return (
        documents.select("source")
        .distinct()
        .select(
            "source",
            F.concat(F.lit("sink"), (knum % spec.N_SINKS).cast("string")).alias("sink"),
            (knum % spec.N_PRIORITIES).cast("int").alias("priority"),
        )
    )
