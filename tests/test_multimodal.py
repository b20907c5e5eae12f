"""Unit edges for the media operators (the parity gate covers bulk
behaviour; this pins the digest-dedup semantics directly)."""
from __future__ import annotations

from log_aggregator_spark.functions import multimodal as fmm


def _docs(spark, rows):
    """rows: (doc_id, text). n_chars derived like the sf tables."""
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows],
        schema="doc_id long, text string, n_chars long",
    )


def test_media_dedup_groups_identical_payloads(spark):
    docs = _docs(
        spark,
        [(1, "same payload"), (5, "same payload"), (9, "different")],
    )
    got = fmm.media_dedup(fmm.attach_media(docs)).collect()
    by_copies = sorted((r["n_copies"], r["canonical_doc_id"]) for r in got)
    # dup group keeps the min doc_id as canonical; unique row is its own group
    assert by_copies == [(1, 9), (2, 1)]
    # digests are 64-char lowercase hex (sha2-256: survivor-picking
    # digests need collision resistance, unlike the md5 oracle hashes)
    assert all(len(r["content_sha"]) == 64 for r in got)


def test_media_dedup_magic_header_is_part_of_the_content(spark):
    # payload = MAGIC + utf8(text): two docs with equal text collide even
    # though every doc_id-derived meta field differs (content-only hash)
    docs = _docs(spark, [(2, "x"), (3, "x")])
    got = fmm.media_dedup(fmm.attach_media(docs)).collect()
    assert len(got) == 1 and got[0]["n_copies"] == 2
