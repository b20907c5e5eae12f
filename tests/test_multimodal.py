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


def test_fake_feature_matches_duckdb_tokenization_on_whitespace_edges():
    """The stubbed featurizer must tokenize exactly like its DuckDB twin
    (mm_near_dup oracle: trim = ASCII spaces only, RE2 \\s+ split keeping
    boundary empty fields). Python str.strip()/unicode \\s would silently
    diverge on leading tabs, trailing newlines and NBSP."""
    import duckdb
    import numpy as np

    from log_aggregator_spark.oracle_sql import _hash_cell_sql

    cases = [
        "\tfoo bar baz",          # leading tab -> empty first word
        "foo bar baz\n",          # trailing newline -> empty last word
        "foo bar baz qux",   # NBSP is NOT \s in RE2/Java
        "  foo   bar  ",          # ASCII spaces trim + collapse
        "foo bar",
        "",
    ]
    con = duckdb.connect()
    for text in cases:
        want = np.zeros(fmm.MM_FDIM, dtype=np.int64)
        rows = con.execute(
            f"""
            WITH ws AS (SELECT regexp_split_to_array(trim(?), '\\s+') AS ws),
            bg AS (SELECT unnest(list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1])) AS gram
                   FROM ws)
            SELECT {_hash_cell_sql("gram", 2)} AS nib FROM bg
            """,
            [text],
        ).fetchall()
        for (nib,) in rows:
            want[int(nib)] += 1
        want = want * fmm.MM_FDIM - len(rows)
        got = fmm._fake_feature(text)
        assert np.array_equal(got, want), text


def test_media_near_dup_finds_edited_copy_not_unrelated(spark):
    """An object whose decoded content is a light edit of another must
    pair with it at high centered-cosine; unrelated objects must not
    pair. Exercises the full decode-kernel -> sign-LSH -> exact-verify
    path on controlled payloads."""
    base = " ".join(f"w{i} tok{i % 7} body{i % 13}" for i in range(80))
    edited = base.replace("w3 ", "W3x ").replace("w40 ", "w40edit ")
    other = " ".join(f"z{i} q{i % 5} r{i % 11}" for i in range(80))
    docs = _docs(spark, [(1, base), (2, edited), (3, other)])
    pairs = {(r["doc_a"], r["doc_b"]): r["sim_x1m"]
             for r in fmm.media_near_dup(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 900_000
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_media_near_dup_excludes_degenerate_payloads(spark):
    """Zero-norm feature vectors (empty or single-word bodies have no
    bigrams) must be excluded BEFORE the banded join — otherwise every
    degenerate object lands in one bucket and fabricates a candidate
    block."""
    docs = _docs(spark, [(1, ""), (2, "solo"), (3, "a b c d e f g h"),
                         (4, "a b c d e f g h")])
    pairs = [(r["doc_a"], r["doc_b"]) for r in fmm.media_near_dup(docs).collect()]
    assert pairs == [(3, 4)]
    sig_ids = {r["doc_id"] for r in fmm.media_feature_signature(
        fmm.media_features(docs)).collect()}
    assert sig_ids == {3, 4}


def test_media_near_dup_matches_brute_force_over_candidates(spark):
    """On the sf0.001 fixture: every emitted pair must carry the exact
    centered cosine its feature vectors imply, and every all-pairs
    near-dup that shares >= 1 band must be emitted (the banded join loses
    only pairs the LSH never collides — none at fixture similarity
    levels)."""
    import numpy as np

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = {r["doc_id"]: (np.array(r["v"]), r["n2"])
             for r in fmm.media_features(docs).collect() if r["n2"] > 0}
    got = {(r["doc_a"], r["doc_b"]): r["sim_x1m"]
           for r in fmm.media_near_dup(docs).collect()}
    ids = sorted(feats)
    planes = fmm._MM_PLANES_NP
    want = {}
    for i, a in enumerate(ids):
        va, na = feats[a]
        ba = (planes @ va) >= 0
        for b in ids[i + 1:]:
            vb, nb2 = feats[b]
            sim = float(va @ vb) / ((na * nb2) ** 0.5)
            if sim < fmm.MM_TAU:
                continue
            bb = (planes @ vb) >= 0
            bands_hit = any(
                (ba[k * fmm.MM_BITS_PER_BAND:(k + 1) * fmm.MM_BITS_PER_BAND]
                 == bb[k * fmm.MM_BITS_PER_BAND:(k + 1) * fmm.MM_BITS_PER_BAND]).all()
                for k in range(fmm.MM_BANDS))
            if bands_hit:
                want[(a, b)] = int(np.floor(sim * 1_000_000))
    assert got == want
