"""Vectorized envelope parse — the pipeline's grok/regex stage.

The reference extracts (id, session, seq) from the cached-chunk filename with
a per-file regex match (``/root/reference/datadecoder/.../PBLogFile.java:17-27``,
pattern ``(.*)_(\\d*)_(\\d*)\\.pbData``). Here the same extraction runs as ONE
Arrow-batched pandas UDF over the envelope column — ``pandas.Series.str.extract``
is a single vectorized C call per batch, never per-row Python (BASELINE.json
``input_hint``).

A pure-JVM variant (three ``regexp_extract`` calls, whole-stage codegen) is
provided as well; the pipeline default is chosen by benchmark (see bench.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import spec

_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("session", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


@F.pandas_udf(_PARSE_SCHEMA)
def _parse_envelope_udf(env: pd.Series) -> pd.DataFrame:
    ext = env.str.extract(spec.ENVELOPE_REGEX)
    return pd.DataFrame(
        {
            "doc_id": ext[0],
            "session": pd.to_numeric(ext[1], errors="coerce").astype("Int64"),
            "seq": pd.to_numeric(ext[2], errors="coerce").astype("Int64"),
        }
    )


# The UDF is pure, but declaring it nondeterministic stops Catalyst from
# pushing downstream filters through the struct-projection and re-evaluating
# the whole Arrow batch a second time (observed as two ArrowEvalPython nodes
# in the physical plan — 2x the Python cost of the parse stage).
_parse_envelope_udf = _parse_envelope_udf.asNondeterministic()


def parse_envelope(chunks: DataFrame, jvm: bool = False) -> DataFrame:
    """chunks(envelope, chunk_tokens, source) →
    (doc_id, session, seq, chunk_tokens, source)."""
    if jvm:
        parsed = chunks.select(
            F.regexp_extract("envelope", spec.ENVELOPE_REGEX, 1).alias("doc_id"),
            F.regexp_extract("envelope", spec.ENVELOPE_REGEX, 2).cast("long").alias("session"),
            F.regexp_extract("envelope", spec.ENVELOPE_REGEX, 3).cast("long").alias("seq"),
            "chunk_tokens",
            "source",
        )
    else:
        parsed = chunks.withColumn("_p", _parse_envelope_udf(F.col("envelope"))).select(
            F.col("_p.doc_id").alias("doc_id"),
            F.col("_p.session").alias("session"),
            F.col("_p.seq").alias("seq"),
            "chunk_tokens",
            "source",
        )
    return parsed


def encode_envelope(df: DataFrame) -> DataFrame:
    """Inverse of parse — the filename-encode operator (SURVEY.md §2 S4;
    /root/reference/agent/.../DataPumpImpl.java:87-89)."""
    return df.withColumn(
        "envelope",
        F.format_string(spec.ENVELOPE_FMT, F.col("doc_id"), F.col("session"), F.col("seq")),
    )
