"""Chunk-table source formats.

The pipeline's canonical storage is the parquet/Iceberg snapshot table
(``tableio``), but deployments inherit data in whatever shape the previous
system spooled — the reference's own interchange format IS a directory of
``<doc>_<session>_<seq>.pbData`` payload files (``/root/reference/README.md:
203-216``; the decoder globs them, ``datadecoder/.../DataPumpDecoderSort.
java:103-122``). Every reader here lands on the SAME canonical chunk schema
``(envelope string, chunk_tokens array<int>, source string)`` so the rest of
the pipeline is source-agnostic:

* ``read_chunks_parquet`` — the canonical columnar form.
* ``read_chunks_pbdata``  — directory-of-files interchange via Spark's
  ``binaryFile`` source: the envelope is the FILENAME (exactly the
  reference's contract), the payload is a tiny length-prefixed binary
  record; decode is one Arrow-batched UDF whose per-file loop is the codec
  boundary (same rule as multimodal decode — per-object Python only where
  a codec is inherent).
* ``read_chunks_jsonl``   — newline-delimited JSON with an EXPLICIT schema
  (schema inference is a full extra pass at 100 TB; never rely on it).
* ``read_chunks_csv``     — CSV with the token array carried as a joined
  string column (CSV has no arrays); split+cast is pure codegen.

Writers exist for pbdata/jsonl/csv so tests can round-trip; the pbdata
writer runs ``foreachPartition`` (each task writes its own files — the
distributed shape), not a driver collect.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_SCHEMA = "envelope string, chunk_tokens array<int>, source string"

_PB_MAGIC = b"PBD0"


def read_chunks_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CHUNK_SCHEMA).parquet(path)


# ------------------------------------------------------------------ jsonl


def read_chunks_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Explicit-schema JSONL read — no inference pass, bad lines fail loudly
    (PERMISSIVE would silently null-out corrupt records; a training corpus
    wants the failure)."""
    return (
        spark.read.schema(CHUNK_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )


def write_chunks_jsonl(chunks: DataFrame, path: str) -> None:
    chunks.write.mode("overwrite").json(path)


# -------------------------------------------------------------------- csv


def read_chunks_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV carries tokens as a '|'-joined string column; split + cast back
    is whole-stage codegen. Empty payloads round-trip via the empty-string
    → empty-array special case."""
    raw = (
        spark.read.schema("envelope string, tokens_str string, source string")
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(path)
    )
    toks = F.when(
        F.coalesce(F.length("tokens_str"), F.lit(0)) == 0,
        F.array().cast("array<int>"),
    ).otherwise(
        F.transform(F.split("tokens_str", r"\|"), lambda x: x.cast("int"))
    )
    return raw.select("envelope", toks.alias("chunk_tokens"), "source")


def write_chunks_csv(chunks: DataFrame, path: str) -> None:
    chunks.select(
        "envelope",
        F.concat_ws("|", F.col("chunk_tokens").cast("array<string>")).alias("tokens_str"),
        "source",
    ).write.mode("overwrite").option("header", "true").csv(path)


# ----------------------------------------------------------------- pbdata


def _encode_pbdata(source: str, tokens: np.ndarray) -> bytes:
    src = source.encode("utf-8")
    return (
        _PB_MAGIC
        + len(src).to_bytes(4, "little")
        + src
        + np.asarray(tokens, dtype="<i4").tobytes()
    )


def _decode_pbdata_bytes(b: bytes) -> tuple[str, np.ndarray]:
    if b[: len(_PB_MAGIC)] != _PB_MAGIC:
        raise ValueError("bad pbdata magic")
    n = int.from_bytes(b[4:8], "little")
    src = b[8 : 8 + n].decode("utf-8")
    toks = np.frombuffer(b[8 + n :], dtype="<i4")
    return src, toks


def read_chunks_pbdata(spark: SparkSession, directory: str) -> DataFrame:
    """Directory-of-``.pbData``-files → canonical chunk rows, via the
    ``binaryFile`` source (distributed file listing + reading; predicate
    pushdown on path/length works as with any file source). The envelope is
    recovered from the file NAME — the reference's exact contract — with a
    JVM regexp; only the payload decode crosses into Python, Arrow-batched."""

    @F.pandas_udf("source string, chunk_tokens array<int>")
    def decode(content: pd.Series) -> pd.DataFrame:
        srcs, toks = [], []
        for b in content:  # per-FILE loop: the codec boundary
            s, t = _decode_pbdata_bytes(bytes(b))
            srcs.append(s)
            toks.append(t)
        return pd.DataFrame({"source": srcs, "chunk_tokens": toks})

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pbData")
        .load(directory)
    )
    return files.select(
        F.regexp_extract("path", r"([^/]+\.pbData)$", 1).alias("envelope"),
        F.col("content"),
    ).select(
        "envelope",
        decode(F.col("content")).alias("_d"),
    ).select(
        "envelope",
        F.col("_d.chunk_tokens").alias("chunk_tokens"),
        F.col("_d.source").alias("source"),
    )


def write_chunks_pbdata(chunks: DataFrame, directory: str) -> None:
    """One file per chunk, named by its envelope — the reference's spool
    layout. ``foreachPartition``: every task writes its own files (works on
    any shared filesystem; no driver bottleneck)."""
    os.makedirs(directory, exist_ok=True)

    def write_partition(rows) -> None:
        for r in rows:
            payload = _encode_pbdata(r["source"], np.asarray(r["chunk_tokens"]))
            tmp = os.path.join(directory, f".{r['envelope']}.tmp")
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, os.path.join(directory, r["envelope"]))  # atomic, like the reference

    chunks.foreachPartition(write_partition)
