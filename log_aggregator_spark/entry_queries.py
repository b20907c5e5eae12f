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
from .operators.parse import parse_envelope
from .operators.reassemble import held_back
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


QUERIES: dict[str, QueryFn] = {
    "pipeline_parse": q_pipeline_parse,
    "pipeline_reassemble": q_pipeline_reassemble,
    "pipeline_enriched": q_pipeline_enriched,
    "pipeline_sink_counts": q_pipeline_sink_counts,
    "pipeline_source_counts": q_pipeline_source_counts,
    "pipeline_held_back": q_pipeline_held_back,
    "pipeline_checkpoint_out": q_pipeline_checkpoint_out,
}

ORACLES: dict[str, str] = dict(oracle_sql.PIPELINE_SQL)
