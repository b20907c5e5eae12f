"""The Arrow gram kernel must produce the BIT-identical grams the JVM
higher-order-function twin produces — including the Java-semantics corners
the Python standard library gets wrong by default (unicode whitespace,
unicode trim). Same twin-equality discipline as the ANN kernels
(`test_dedup_scale.py::test_arrow_kernels_equal_jvm_twins`)."""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from log_aggregator_spark.functions import text as ftext

# Every tokenizer trap in one fixture: empty doc, whitespace-only doc,
# every ASCII separator Java \s matches (space, tab, LF, VT, FF, CR),
# runs of separators, a single word, exactly-n words, unicode NBSP and
# LINE SEPARATOR (NOT word separators in Java \s — must stay inside the
# word in BOTH engines), mixed case for the lower=True paths, and a null.
EDGE_TEXTS = [
    ("d00", ""),
    ("d01", "   "),
    ("d02", "\t\n\x0b\x0c\r"),
    ("d03", "one"),
    ("d04", "one two"),
    ("d05", "one two three"),
    ("d06", "one two three four"),
    ("d07", "  padded   with\truns\n\nof \x0c separators  "),
    ("d08", "nbsp stays lsep stays"),
    ("d09", "MiXeD CaSe WoRdS MiXeD CaSe"),
    ("d10", "a a a a a a a a a a"),
    ("d11", "x " * 500 + "y"),
    ("d12", None),
    # non-ASCII + uppercase I: the locale trap. Spark's lower() is
    # locale-sensitive for non-ASCII strings (a Turkish-locale JVM gives
    # dotless 'ı' where Python str.lower() gives 'i'); parity holds only
    # under the en-US pin get_spark sets (session._LOCALE_PIN).
    ("d13", "IŞIK İI Kapı ẞ GROSSES ΣΙΓΜΑΣ"),
]


def _docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(EDGE_TEXTS, columns=["doc_id", "text"]),
        schema="doc_id string, text string",
    )


def _collect(df):
    return df.toPandas().reset_index(drop=True)


def test_gram_array_equals_jvm_twin_edges(spark):
    docs = _docs(spark)
    for n in (1, 2, 3, 8):
        for lower in (False, True):
            a = docs.select(
                "doc_id",
                F.posexplode(
                    ftext.gram_array(F.col("text"), n, lower=lower)
                ).alias("pos", "g"),
            ).orderBy("doc_id", "pos")
            j = docs.select(
                "doc_id",
                F.posexplode(
                    ftext.gram_array(F.col("text"), n, lower=lower,
                                     impl="jvm")
                ).alias("pos", "g"),
            ).orderBy("doc_id", "pos")
            pd.testing.assert_frame_equal(_collect(a), _collect(j))


def test_gram_array_equals_jvm_twin_fixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for n, lower in ((2, True), (3, False), (8, False)):
        a = docs.select(
            "doc_id",
            F.posexplode(ftext.gram_array(F.col("text"), n, lower=lower))
            .alias("pos", "g"),
        )
        j = docs.select(
            "doc_id",
            F.posexplode(
                ftext.gram_array(F.col("text"), n, lower=lower, impl="jvm")
            ).alias("pos", "g"),
        )
        assert a.exceptAll(j).isEmpty() and j.exceptAll(a).isEmpty()


def test_repetition_arrow_equals_jvm_twin(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = ftext.repetition_stats(docs).orderBy("doc_id")
    j = ftext.repetition_stats(docs, impl="jvm").orderBy("doc_id")
    pd.testing.assert_frame_equal(_collect(a), _collect(j))
    # and on the edge fixture, where empty/whitespace docs exercise the
    # one-gram tail rule (null text rides the same "" path)
    edges = _docs(spark)
    ae = ftext.repetition_stats(edges).orderBy("doc_id")
    je = ftext.repetition_stats(edges, impl="jvm").orderBy("doc_id")
    pd.testing.assert_frame_equal(_collect(ae), _collect(je))


def test_repetition_arrow_plan_is_shuffle_free(spark):
    """The per-doc form must not exchange anything — that IS its point."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = (
        ftext.repetition_stats(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_span_dedup_arrow_equals_jvm_twin(spark):
    from log_aggregator_spark.functions import dedup as fdedup

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = fdedup.span_dedup(docs).orderBy("doc_id")
    j = fdedup.span_dedup(docs, impl="jvm").orderBy("doc_id")
    pd.testing.assert_frame_equal(_collect(a), _collect(j))
    edges = _docs(spark)
    ae = fdedup.span_dedup(edges, span_words=2).orderBy("doc_id")
    je = fdedup.span_dedup(edges, span_words=2, impl="jvm").orderBy("doc_id")
    pd.testing.assert_frame_equal(_collect(ae), _collect(je))


def test_jvm_locale_pinned(spark):
    """get_spark must pin the JVM default locale (session._LOCALE_PIN) —
    the lowercase-parity contract every Python-twin kernel relies on."""
    loc = spark._jvm.java.util.Locale.getDefault()
    assert loc.getLanguage() == "en"
    # and the locale-trap doc actually lowers identically in both engines
    row = (
        spark.createDataFrame([("IŞIK İI",)], "t string")
        .select(F.lower("t").alias("l"))
        .collect()[0]
    )
    assert row.l == "IŞIK İI".lower()
