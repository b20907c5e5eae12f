"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (full parse → gate → reassemble → enrich
pipeline) on sf0.001. ``queries()`` / ``oracle_sql()`` — the per-operator
correctness gate; implementations live in
``log_aggregator_spark/entry_queries.py`` and
``log_aggregator_spark/oracle_sql.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from log_aggregator_spark.entry_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end pipeline's enriched output on sf0.001."""
    return QUERIES["pipeline_enriched"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate samples a prefix of this dict (r1–r4
# sampled the first 31/42/50/50 registry keys). Round-5 rotation
# (VERDICT r4, task 1): the 30 queries below have no CORRECTNESS_r04
# row — crucially the similarity family, whose kernels were rewritten
# to Arrow matmuls + trained IVF centroids in r4 AFTER their last green
# driver row — so they are listed first (sim family at the head) to get
# fresh external rows against the code now in the tree. Every query
# passes the identical local replica of the gate regardless of order
# (tests/test_entry_parity.py runs all 80 against their DuckDB
# oracles). bench.py keeps iterating the canonical QUERIES order so
# per-query timings stay comparable round-over-round (memoized seams
# bill their build cost to whichever query touches them first).
_VERIFY_FIRST = [
    "sim_cosine_near_dup",
    "sim_lsh_signature",
    "sim_lsh_pairs",
    "sim_lsh_topk",
    "sim_lsh_recall",
    "sim_ivf_assign",
    "sim_ivf_topk",
    "sim_ivf_recall",
    "sim_semantic_near_dup",
    "text_repetition",
    "text_domain_quota",
    "text_corpus_mix",
    "text_pack_sequences",
    "text_tfidf",
    "dedup_span",
    "dedup_incremental",
    "dedup_incremental_lsh",
    "mm_media_meta",
    "mm_decode_features",
    "mm_frame_sample",
    "ev_tumbling_counts",
    "ev_sessionize",
    "ev_topk_users",
    "ev_error_rate",
    "ev_props_extract",
    "ev_percentiles",
    "ev_windowed_topk",
    "ev_spikes",
    "text_ngram_counts",
    "mm_format_stats",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {name: QUERIES[name] for name in _VERIFY_FIRST}
    ordered.update(QUERIES)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
