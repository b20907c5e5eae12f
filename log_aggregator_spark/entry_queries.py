"""The Spark half of the driver's correctness gate: one named query per
implemented operator (SURVEY.md §2), each paired with a DuckDB oracle in
``oracle_sql.py``. Column names and dtypes are aligned pair-by-pair — the
driver sorts columns by name and value-hashes, so both sides emit identical
scalars (arrays as CSV, all integer aggregates as long).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import chunker, oracle_sql
from .functions import dedup as fdedup
from .functions import events as fev
from .functions import multimodal as fmm
from .functions import similarity as fsim
from .functions import text as ftext
from .operators.merge import merge_upsert
from .operators.parse import parse_envelope, split_rejects
from .operators.reassemble import held_back, held_back_full, reassemble_sql
from .plans.pipeline import run_pipeline

QueryFn = Callable[[SparkSession, str], DataFrame]


def _csv(col: str) -> F.Column:
    return F.concat_ws(",", F.col(col).cast("array<string>"))


def _pipeline(spark: SparkSession, sf_dir: str):
    docs = chunker.load_documents(spark, sf_dir)
    return run_pipeline(
        chunker.chunks(docs),
        chunker.routes_table(docs),
        chunker.checkpoint_table(docs),
        strategy="sql",
    )


def q_pipeline_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = chunker.load_documents(spark, sf_dir)
    return parse_envelope(chunker.chunks(docs)).select(
        "doc_id",
        "session",
        "seq",
        _csv("chunk_tokens").alias("chunk_csv"),
        F.size("chunk_tokens").cast("long").alias("n_chunk_tok"),
        "source",
    )


def q_pipeline_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _pipeline(spark, sf_dir).reassembled
    return r.select(
        "doc_id",
        "session",
        _csv("tokens").alias("tokens_csv"),
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.col("last_seq_out").cast("long").alias("last_seq_out"),
    )


def q_pipeline_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _pipeline(spark, sf_dir).enriched
    return e.select(
        "doc_id",
        "session",
        _csv("tokens").alias("tokens_csv"),
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        "sink",
        F.col("priority").cast("long").alias("priority"),
    )


def q_pipeline_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pipeline(spark, sf_dir).counts.select(
        "sink", "n_rows", "sum_n_tok", "n_docs"
    )


def q_pipeline_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _pipeline(spark, sf_dir).enriched
    return e.groupBy("source", "sink").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("n_tok").cast("long").alias("sum_n_tok"),
    )


def q_pipeline_held_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = chunker.load_documents(spark, sf_dir)
    return held_back(
        parse_envelope(chunker.chunks(docs)), chunker.checkpoint_table(docs)
    ).select("doc_id", "session", "seq")


def q_pipeline_checkpoint_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pipeline(spark, sf_dir).checkpoint_out.select(
        "doc_id", "session", F.col("last_seq").cast("long").alias("last_seq")
    )


def q_pipeline_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter path under the hash gate: union the real chunk corpus
    with deterministically-synthesized CORRUPT envelopes (every 10th doc
    contributes one 'garbage-<id>' row); the reject stream must contain
    exactly the corrupt set — which simultaneously proves every legitimate
    chunk parses (a real chunk leaking into rejects breaks the row count,
    a corrupt row leaking into the ok stream breaks it too)."""
    docs = chunker.load_documents(spark, sf_dir)
    chunks = chunker.chunks(docs)
    corrupt = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 10 == 0)
        .select(
            F.concat(F.lit("garbage-"), F.col("doc_id").cast("string")).alias("envelope"),
            F.array().cast("array<int>").alias("chunk_tokens"),
            "source",
        )
    )
    _ok, rejects = split_rejects(chunks.unionByName(corrupt))
    return rejects


def q_pipeline_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-splitting invariance as a first-class gated query: the corpus is
    processed as TWO checkpointed passes (phase 1 = seqs ≤ 2, phase 2 =
    the rest + phase 1's held cache, against the merged checkpoint) and
    the per-stream concatenation of the two runs' segments must equal the
    ORACLE, which is the ordinary single-pass reassembly SQL. This is
    job.py's resume contract (reference invariant README.md:93-104)
    expressed as one declarative plan — it exercises resume-at-last+1,
    init-accept of sessions that restart mid-corpus, gap carry-over and
    checkpoint merge, all under the driver's value-hash."""
    docs = chunker.load_documents(spark, sf_dir)
    parsed = parse_envelope(chunker.chunks(docs))
    ckpt0 = chunker.checkpoint_table(docs)

    p1 = parsed.where(F.col("seq") <= 2)
    p2 = parsed.where(F.col("seq") > 2)

    r1 = reassemble_sql(p1, ckpt0)
    held1 = held_back_full(p1, ckpt0)
    ck1 = r1.selectExpr("doc_id", "session", "cast(last_seq_out as long) as last_seq")
    ckpt1 = ck1.unionByName(
        ckpt0.join(ck1.select("doc_id", "session"), ["doc_id", "session"], "left_anti")
    )
    r2 = reassemble_sql(p2.unionByName(held1), ckpt1)

    seg = r1.withColumn("run", F.lit(1)).unionByName(r2.withColumn("run", F.lit(2)))
    return (
        seg.groupBy("doc_id", "session")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("run", "tokens"))),
                    lambda s: s["tokens"],
                )
            ).alias("tokens"),
            F.sum("n_tok").cast("long").alias("n_tok"),
            F.first("source").alias("source"),
            F.max("last_seq_out").cast("long").alias("last_seq_out"),
        )
        .select(
            "doc_id",
            "session",
            _csv("tokens").alias("tokens_csv"),
            "n_tok",
            "source",
            "last_seq_out",
        )
    )


# -------------------------------------------------- text / dedup queries


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_text_token_count(spark, sf_dir):
    return ftext.token_counts(_docs(spark, sf_dir))


def q_text_quality(spark, sf_dir):
    return ftext.quality_features(_docs(spark, sf_dir))


def q_text_langid(spark, sf_dir):
    return ftext.language_id(_docs(spark, sf_dir))


def q_text_fingerprint(spark, sf_dir):
    return ftext.fingerprints(_docs(spark, sf_dir))


def q_text_quality_filter(spark, sf_dir):
    return ftext.quality_filter(_docs(spark, sf_dir))


def q_text_sample_stratified(spark, sf_dir):
    return ftext.sample_stratified(_docs(spark, sf_dir))


def q_dedup_exact(spark, sf_dir):
    return fdedup.exact_groups(_docs(spark, sf_dir))


def q_dedup_ngram_jaccard(spark, sf_dir):
    return fdedup.jaccard_pairs(
        _docs(spark, sf_dir), shingles_df=_shingles(spark, sf_dir)
    )


def _mh_pairs(spark, sf_dir):
    """The materialized MinHash candidate lattice — shared between the pair
    REPORT query and the clustering's minhash edge family, so the band
    join over the shingle table runs once per store (the same
    store-the-intermediate seam as ``_shingles``/``_simhash``)."""
    return _memo(
        spark, sf_dir, "mh_pairs",
        lambda: fdedup.minhash_candidate_pairs(
            _docs(spark, sf_dir), shingles_df=_shingles(spark, sf_dir)
        ),
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    return _mh_pairs(spark, sf_dir)


def _simhash(spark, sf_dir):
    """The materialized simhash fingerprint table — the seam both the pair
    REPORT (quadratic-by-nature answer enumeration) and the clustering's
    O(n) connectivity edges derive from, so the corpus is fingerprinted
    once per store."""
    return _memo(
        spark, sf_dir, "simhash",
        lambda: fdedup.simhash(_docs(spark, sf_dir)),
    )


def q_dedup_simhash(spark, sf_dir):
    return _simhash(spark, sf_dir)


def q_dedup_simhash_pairs(spark, sf_dir):
    return fdedup.simhash_near_pairs(
        _docs(spark, sf_dir), simhash_df=_simhash(spark, sf_dir)
    )


# Materialize-once intermediates, exactly as a real pipeline stores them:
# the df-capped shingle table feeds Jaccard/minhash/clusters; the cluster
# labels feed clusters/survivors. Keyed by (applicationId, sf_dir); both are
# narrow (2-3 longs/strings per row).
_seam_cache: dict[tuple, DataFrame] = {}


def _app_key(spark) -> str:
    """Session identity for memo keys: the Spark applicationId — unique
    per application and never address-reused (``id(spark)`` values can be
    reallocated after a stopped session is GC'd). Fixture regeneration
    under the SAME app would still serve the cached seam — acceptable
    because the driver's testdata is generated once, read-only."""
    return spark.sparkContext.applicationId


def _memo(spark, sf_dir, name: str, build) -> DataFrame:
    key = (_app_key(spark), sf_dir, name)
    if key not in _seam_cache:
        _evict_other_sf(spark, sf_dir)
        df = build().persist()
        df.count()  # materialize under the persist
        _seam_cache[key] = df
    return _seam_cache[key]


def _evict_other_sf(spark, sf_dir) -> None:
    """Unpersist this session's seams for every OTHER sf_dir before the
    first seam of a new sf_dir materializes — a long-lived session
    benching several scale factors must not pin storage memory without
    bound (one suite runs one sf at a time; interleaving would thrash the
    cache but never return a wrong or unpersisted-under-it frame)."""
    app = _app_key(spark)
    stale = [k for k in _seam_cache if k[0] == app and k[1] != sf_dir]
    for k in stale:
        _seam_cache.pop(k).unpersist()


def _shingles(spark, sf_dir):
    return _memo(
        spark, sf_dir, "shingles",
        lambda: fdedup.capped_shingles(_docs(spark, sf_dir)),
    )


def _clusters(spark, sf_dir):
    return _memo(
        spark, sf_dir, "clusters",
        lambda: fdedup.duplicate_clusters(
            _docs(spark, sf_dir),
            shingles_df=_shingles(spark, sf_dir),
            simhash_df=_simhash(spark, sf_dir),
            minhash_pairs_df=_mh_pairs(spark, sf_dir),
        ),
    )


def q_dedup_clusters(spark, sf_dir):
    return _clusters(spark, sf_dir)


def q_dedup_survivors(spark, sf_dir):
    return fdedup.survivors_by_quality(
        _docs(spark, sf_dir), clusters=_clusters(spark, sf_dir)
    )


def q_text_split_assign(spark, sf_dir):
    return ftext.split_assign(_docs(spark, sf_dir))


def q_sim_norm_stats(spark, sf_dir):
    return fsim.norm_stats(_emb(spark, sf_dir))


def _mm_features(spark, sf_dir):
    """The materialized perceptual-feature table (one MM_FDIM vector per
    media object) — extracted once per suite, exactly as a deployment
    stores codec output next to the media table."""
    return _memo(
        spark, sf_dir, "mm_features",
        lambda: fmm.media_features(_docs(spark, sf_dir)),
    )


def q_mm_near_dup(spark, sf_dir):
    return fmm.media_near_dup(
        _docs(spark, sf_dir), features_df=_mm_features(spark, sf_dir)
    )


def q_dedup_rate_by_source(spark, sf_dir):
    return fdedup.dup_rate_by_source(
        _docs(spark, sf_dir), clusters=_clusters(spark, sf_dir)
    )


def q_text_vocab(spark, sf_dir):
    return ftext.vocabulary(_docs(spark, sf_dir))


def q_text_pii_scrub(spark, sf_dir):
    """PII scrub over the corpus with deterministic synthesized PII (the
    fixture text is PII-free, so docs ≡0 mod 10 get an email + phone
    appended — the same derivation the oracle SQL applies)."""
    docs = _docs(spark, sf_dir)
    t2 = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.format_string("%04d", (F.col("doc_id") % 10000).cast("int")),
        ),
    ).otherwise(F.col("text"))
    return ftext.pii_scrub(docs.withColumn("text", t2))


def q_text_repetition(spark, sf_dir):
    return ftext.repetition_stats(_docs(spark, sf_dir))


def q_text_domain_quota(spark, sf_dir):
    return ftext.domain_quota(_docs(spark, sf_dir))


def q_text_corpus_mix(spark, sf_dir):
    return ftext.corpus_mix(_docs(spark, sf_dir))


def q_text_pack_sequences(spark, sf_dir):
    return ftext.pack_sequences(_docs(spark, sf_dir))


def q_text_tfidf(spark, sf_dir):
    return ftext.tfidf_top_terms(_docs(spark, sf_dir))


def q_dedup_span(spark, sf_dir):
    return fdedup.span_dedup(_docs(spark, sf_dir))


def q_dedup_incremental(spark, sf_dir):
    """Incremental crawl dedup over a deterministic batch/corpus split.
    sf0.01 has no natural exact dups, so the batch synthesizes them the
    way a rolling pipeline sees them (identically in the oracle SQL):
    'echoes' = corpus docs re-crawled under new ids (doc_id+1e6, killed by
    the anti-join) and 'resubmits' = in-batch duplicate submissions
    (doc_id+2e6, collapsed by the intra-batch min pick)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    nib = ftext.hash_nibble(F.col("doc_id"))
    corpus = docs.where(nib < 13)
    fresh = docs.where(nib >= 13)
    echo = corpus.where(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    resub = fresh.where(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 2_000_000
    )
    batch = fresh.unionByName(echo).unionByName(resub)
    return fdedup.incremental_exact(corpus, batch)


def q_dedup_incremental_lsh(spark, sf_dir):
    """Near-dup incremental dedup: the nib<13 majority plays the stored
    corpus LSH index, the nib>=13 minority is the incoming batch. Band
    keys come from ONE hashing of the universe (memoized shingle seam) —
    exactly the invariant the production shape relies on: index rows and
    probe rows share the hash recipe."""
    keys = fdedup.minhash_band_keys(
        fdedup.minhash_signatures(
            _docs(spark, sf_dir), shingles_df=_shingles(spark, sf_dir)
        )
    )
    nib = ftext.hash_nibble(F.col("doc_id"))
    index_keys = keys.where(nib < 13)
    batch_keys = keys.where(nib >= 13)
    batch_ids = _docs(spark, sf_dir).where(nib >= 13).select("doc_id")
    return fdedup.incremental_near_lsh(index_keys, batch_keys, batch_ids)


def q_dedup_containment(spark, sf_dir):
    """Containment dedup over a corpus with deterministic snippet docs:
    docs ≡0 mod 11 contribute a 12-word prefix snippet under doc_id+3e6.
    A prefix's 3-shingles are a subset of its source's, and the df-cap
    removes any capped shingle from BOTH sides of the pair, so the snippet
    is contained at exactly 1.0 — Jaccard would score it well under the
    dedup threshold (the asymmetric case this operator exists for)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    w = ftext.words(F.col("text"))
    snip = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(w, 1, 12)).alias("text"),
    )
    return fdedup.containment_pairs(docs.unionByName(snip))


def q_text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: the deterministic 3/16 hash-sample of
    docs plays the held-out benchmark; training docs sharing an 8-gram
    with it are flagged."""
    docs = _docs(spark, sf_dir)
    nib = ftext.hash_nibble(F.col("doc_id"))
    return ftext.decontaminate(
        docs.where(nib < 13), docs.where(nib >= 13)
    )


# ------------------------------------------------ similarity queries


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_sim_brute_topk(spark, sf_dir):
    return fsim.brute_topk(_emb(spark, sf_dir))


def q_sim_cosine_near_dup(spark, sf_dir):
    return fsim.cosine_near_dup(_emb(spark, sf_dir))


def _lsh_index(spark, sf_dir):
    """The materialized ANN index (one signature row per (vec, band)) —
    computed once per suite, exactly as a deployment stores it."""
    return _memo(
        spark, sf_dir, "lsh_index",
        lambda: fsim.lsh_signature(_emb(spark, sf_dir)),
    )


def q_sim_lsh_signature(spark, sf_dir):
    return _lsh_index(spark, sf_dir)


def q_sim_lsh_pairs(spark, sf_dir):
    return fsim.lsh_candidate_pairs(
        _emb(spark, sf_dir), signature_df=_lsh_index(spark, sf_dir)
    )


def q_sim_lsh_topk(spark, sf_dir):
    return fsim.lsh_topk(
        _emb(spark, sf_dir), signature_df=_lsh_index(spark, sf_dir)
    )


def q_sim_lsh_recall(spark, sf_dir):
    return fsim.lsh_recall(
        _emb(spark, sf_dir), signature_df=_lsh_index(spark, sf_dir)
    )


def _ivf_index(spark, sf_dir):
    """The materialized IVF index (one cell per vector)."""
    return _memo(
        spark, sf_dir, "ivf_index",
        lambda: fsim.ivf_assign(_emb(spark, sf_dir)),
    )


def q_sim_ivf_assign(spark, sf_dir):
    return _ivf_index(spark, sf_dir)


def q_sim_semantic_near_dup(spark, sf_dir):
    return fsim.semantic_near_dup(
        _emb(spark, sf_dir), assign_df=_ivf_index(spark, sf_dir)
    )


def q_sim_ivf_topk(spark, sf_dir):
    return fsim.ivf_topk(
        _emb(spark, sf_dir), assign_df=_ivf_index(spark, sf_dir)
    )


def q_sim_ivf_recall(spark, sf_dir):
    return fsim.ivf_recall(
        _emb(spark, sf_dir), assign_df=_ivf_index(spark, sf_dir)
    )


# ------------------------------------------------ events/telemetry queries


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_ev_transitions(spark, sf_dir):
    return fev.event_transitions(_events(spark, sf_dir))


def q_ev_tumbling_counts(spark, sf_dir):
    return fev.tumbling_counts(_events(spark, sf_dir))


def q_ev_sessionize(spark, sf_dir):
    return fev.sessionize(_events(spark, sf_dir))


def q_ev_topk_users(spark, sf_dir):
    return fev.topk_users(_events(spark, sf_dir))


def q_ev_error_rate(spark, sf_dir):
    return fev.error_rate(_events(spark, sf_dir))


def q_ev_props_extract(spark, sf_dir):
    return fev.props_extract(_events(spark, sf_dir))


def q_ev_percentiles(spark, sf_dir):
    return fev.value_percentiles(_events(spark, sf_dir))


def q_ev_percentiles_approx(spark, sf_dir):
    return fev.value_percentiles_approx(_events(spark, sf_dir))


def q_ev_windowed_topk(spark, sf_dir):
    return fev.windowed_topk_types(_events(spark, sf_dir))


def q_ev_spikes(spark, sf_dir):
    return fev.hourly_spikes(_events(spark, sf_dir))


def q_ev_asof_enrich(spark, sf_dir):
    return fev.asof_enrich(_events(spark, sf_dir))


def q_ev_retention(spark, sf_dir):
    return fev.retention(_events(spark, sf_dir))


def q_ev_profile(spark, sf_dir):
    return fev.profile_columns(_events(spark, sf_dir))


def q_ev_funnel(spark, sf_dir):
    return fev.funnel_steps(_events(spark, sf_dir))


def q_ev_interval_errors(spark, sf_dir):
    return fev.session_error_impact(_events(spark, sf_dir))


def q_ev_throttle_audit(spark, sf_dir):
    return fev.throttle_audit(_events(spark, sf_dir))


def q_ev_rolling_active(spark, sf_dir):
    return fev.rolling_active_users(_events(spark, sf_dir))


def q_ev_new_users(spark, sf_dir):
    return fev.new_users_daily(_events(spark, sf_dir))


def q_sim_centroid_update(spark, sf_dir):
    return fsim.centroid_update(_emb(spark, sf_dir), assign_df=_ivf_index(spark, sf_dir))


def q_sim_kmeans_iterate(spark, sf_dir):
    return fsim.kmeans_iterate(_emb(spark, sf_dir), assign_df=_ivf_index(spark, sf_dir))


def q_tbl_merge_upsert(spark, sf_dir):
    """CDC MERGE over a deterministic change batch derived from documents:
    doc_id%13 → delete, %7 → in-place update, %17 → insert (new key space
    doc_id+10⁷). Twin: oracle_sql.MERGE_SQL."""
    base = _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars")
    did = F.col("doc_id")
    upd = base.where((did % 7 == 0) & (did % 13 != 0)).select(
        "doc_id",
        "lang",
        F.lit("patched").alias("source"),
        (F.col("n_chars") + 1000).alias("n_chars"),
        F.lit(1).alias("version"),
        F.lit("U").alias("op"),
    )
    dels = base.where(did % 13 == 0).select(
        "doc_id", "lang", "source", "n_chars",
        F.lit(1).alias("version"), F.lit("D").alias("op"),
    )
    ins = base.where(did % 17 == 0).select(
        (did + 10_000_000).alias("doc_id"),
        "lang",
        F.lit("inserted").alias("source"),
        "n_chars",
        F.lit(1).alias("version"),
        F.lit("U").alias("op"),
    )
    updates = upd.unionByName(dels).unionByName(ins)
    merged = merge_upsert(base, updates, keys=["doc_id"])
    return merged.select(
        "doc_id", "lang", "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("version").cast("long").alias("version"),
    )


def q_tbl_time_travel(spark, sf_dir):
    """Snapshot time travel under the hash gate: commit the corpus into a
    SnapshotTable in two snapshots (v1 = doc_id ≡0 mod 3, v2 appends the
    rest), then read AS OF snapshot 1 and AS OF current and emit both
    tagged — the read-at-snapshot machinery the resumable job leans on,
    proven value-exact (not just row-counted) against an oracle that
    reconstructs each version from the base table."""
    t = _tt_table(spark, sf_dir)
    v1 = t.read(spark, snapshot=1).withColumn("snap", F.lit(1).cast("long"))
    v2 = t.read(spark).withColumn("snap", F.lit(2).cast("long"))
    return v1.unionByName(v2).select("snap", "doc_id", "source")


_tt_tables: dict[tuple, object] = {}


def _tt_table(spark, sf_dir):
    """The two-snapshot demo table (v1 = doc_id ≡0 mod 3, v2 appends the
    rest), built ONCE per (session, sf) — repeated gate/bench calls must
    not accumulate table copies in TMPDIR. Serves both the time-travel
    and the incremental-read gates."""
    key = (_app_key(spark), sf_dir)
    if key not in _tt_tables:
        import atexit
        import shutil
        import tempfile

        from .tableio import SnapshotTable

        docs = _docs(spark, sf_dir).select("doc_id", "source")
        path = tempfile.mkdtemp(prefix="tt_")
        # private per-process dir (no cross-process CAS races on a shared
        # path), removed at interpreter exit so repeated gate/bench runs
        # don't accumulate orphan tt_* trees in TMPDIR (a crash can still
        # leak one dir — the tradeoff for race-free isolation)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        t = SnapshotTable(path)
        t.commit(docs.where(F.col("doc_id") % 3 == 0))
        t.commit(docs.where(F.col("doc_id") % 3 != 0))
        _tt_tables[key] = t
    return _tt_tables[key]


def q_tbl_incremental(spark, sf_dir):
    """Incremental (snapshot-diff) read under the hash gate: everything
    committed AFTER snapshot 1 of the two-snapshot table must be exactly
    the v2 append — the read path run_job's resume leans on, value-gated
    (the oracle reconstructs the diff from the base table)."""
    inc = _tt_table(spark, sf_dir).read_incremental(spark, since=1)
    return inc.select("doc_id", "source")


def q_text_ngram_counts(spark, sf_dir):
    return ftext.ngram_counts(_docs(spark, sf_dir))


def q_mm_format_stats(spark, sf_dir):
    return fmm.format_stats(_docs(spark, sf_dir))


# ------------------------------------------------ multimodal queries


def q_mm_dedup_media(spark, sf_dir):
    """Exact media dedup under the hash gate. sf docs are unique, so
    duplicates are synthesized the way a crawler sees them — docs ≡0 mod 9
    re-crawled under new ids (doc_id+1e6, same payload); the digest groups
    must pair exactly those (and the sha parity of every singleton row
    proves the Spark/DuckDB hash agreement byte-for-byte)."""
    docs = _docs(spark, sf_dir)
    echo = docs.where(F.col("doc_id") % 9 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return fmm.media_dedup(fmm.attach_media(docs.unionByName(echo)))


def q_ev_distinct_users(spark, sf_dir):
    return fev.distinct_users(_events(spark, sf_dir))


def q_ev_hll_distinct(spark, sf_dir):
    return fev.hll_distinct(_events(spark, sf_dir))


def q_text_length_buckets(spark, sf_dir):
    return ftext.length_buckets(_docs(spark, sf_dir))


def q_mm_media_meta(spark, sf_dir):
    return fmm.media_meta(_docs(spark, sf_dir))


def q_mm_decode_features(spark, sf_dir):
    return fmm.decode_features(_docs(spark, sf_dir))


def q_mm_frame_sample(spark, sf_dir):
    return fmm.frame_sample(_docs(spark, sf_dir))


QUERIES: dict[str, QueryFn] = {
    "pipeline_parse": q_pipeline_parse,
    "pipeline_reassemble": q_pipeline_reassemble,
    "pipeline_enriched": q_pipeline_enriched,
    "pipeline_sink_counts": q_pipeline_sink_counts,
    "pipeline_source_counts": q_pipeline_source_counts,
    "pipeline_held_back": q_pipeline_held_back,
    "pipeline_checkpoint_out": q_pipeline_checkpoint_out,
    "pipeline_resume": q_pipeline_resume,
    "pipeline_rejects": q_pipeline_rejects,
    "text_token_count": q_text_token_count,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "text_quality_filter": q_text_quality_filter,
    "text_sample_stratified": q_text_sample_stratified,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_clusters": q_dedup_clusters,
    "dedup_survivors": q_dedup_survivors,
    "text_vocab": q_text_vocab,
    "text_pii_scrub": q_text_pii_scrub,
    "text_decontaminate": q_text_decontaminate,
    "sim_brute_topk": q_sim_brute_topk,
    "sim_cosine_near_dup": q_sim_cosine_near_dup,
    "sim_lsh_signature": q_sim_lsh_signature,
    "sim_lsh_pairs": q_sim_lsh_pairs,
    "sim_lsh_topk": q_sim_lsh_topk,
    "sim_lsh_recall": q_sim_lsh_recall,
    "sim_ivf_assign": q_sim_ivf_assign,
    "sim_ivf_topk": q_sim_ivf_topk,
    "sim_ivf_recall": q_sim_ivf_recall,
    "sim_semantic_near_dup": q_sim_semantic_near_dup,
    "text_repetition": q_text_repetition,
    "text_domain_quota": q_text_domain_quota,
    "text_corpus_mix": q_text_corpus_mix,
    "text_pack_sequences": q_text_pack_sequences,
    "text_tfidf": q_text_tfidf,
    "dedup_span": q_dedup_span,
    "dedup_incremental": q_dedup_incremental,
    "dedup_incremental_lsh": q_dedup_incremental_lsh,
    "mm_media_meta": q_mm_media_meta,
    "mm_decode_features": q_mm_decode_features,
    "mm_frame_sample": q_mm_frame_sample,
    "ev_tumbling_counts": q_ev_tumbling_counts,
    "ev_sessionize": q_ev_sessionize,
    "ev_topk_users": q_ev_topk_users,
    "ev_error_rate": q_ev_error_rate,
    "ev_props_extract": q_ev_props_extract,
    "ev_percentiles": q_ev_percentiles,
    "ev_percentiles_approx": q_ev_percentiles_approx,
    "ev_windowed_topk": q_ev_windowed_topk,
    "ev_spikes": q_ev_spikes,
    "ev_asof_enrich": q_ev_asof_enrich,
    "ev_retention": q_ev_retention,
    "ev_profile": q_ev_profile,
    "ev_funnel": q_ev_funnel,
    "text_ngram_counts": q_text_ngram_counts,
    "mm_format_stats": q_mm_format_stats,
    "ev_interval_errors": q_ev_interval_errors,
    "ev_throttle_audit": q_ev_throttle_audit,
    "ev_rolling_active": q_ev_rolling_active,
    "ev_new_users": q_ev_new_users,
    "sim_centroid_update": q_sim_centroid_update,
    "sim_kmeans_iterate": q_sim_kmeans_iterate,
    "tbl_merge_upsert": q_tbl_merge_upsert,
    "mm_dedup_media": q_mm_dedup_media,
    "ev_distinct_users": q_ev_distinct_users,
    "ev_hll_distinct": q_ev_hll_distinct,
    "text_length_buckets": q_text_length_buckets,
    "dedup_containment": q_dedup_containment,
    "tbl_time_travel": q_tbl_time_travel,
    "dedup_rate_by_source": q_dedup_rate_by_source,
    "text_split_assign": q_text_split_assign,
    "sim_norm_stats": q_sim_norm_stats,
    "mm_near_dup": q_mm_near_dup,
    "tbl_incremental": q_tbl_incremental,
    "ev_transitions": q_ev_transitions,
}

ORACLES: dict[str, str] = {
    **oracle_sql.PIPELINE_SQL,
    **oracle_sql.TEXT_SQL,
    **oracle_sql.SIMILARITY_SQL,
    **oracle_sql.MM_SQL,
    **oracle_sql.EVENTS_SQL,
    **oracle_sql.FILTER_SQL,
    **oracle_sql.MERGE_SQL,
}
