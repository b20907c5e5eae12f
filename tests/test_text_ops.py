"""Unit semantics for sequence packing and tf-idf top terms (oracle
parity at sf0.01 covers the bulk; these pin the cut-point math and the
rarity ranking on corpora small enough to check by hand)."""
from __future__ import annotations

from log_aggregator_spark.functions import text as ft


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0") for i, t in rows],
        schema="doc_id long, text string, lang string, source string",
    )


def test_pack_sequences_cut_points_single_bucket(spark):
    # 4 docs x 4 tokens, ctx=10, one bucket: cumulative starts 0,4,8,12
    docs = _docs(spark, [(i, "a b c d") for i in range(4)])
    got = {r["doc_id"]: r for r in
           ft.pack_sequences(docs, ctx_tokens=10, buckets=1).collect()}
    assert all(r["bucket"] == 0 for r in got.values())
    assert (got[0]["pack_id"], got[0]["offset_in_pack"]) == (0, 0)
    assert (got[1]["pack_id"], got[1]["offset_in_pack"]) == (0, 4)
    # doc 2 STARTS inside pack 0 (offset 8) and straddles into pack 1 —
    # concat-then-chunk semantics: the manifest records the start point
    assert (got[2]["pack_id"], got[2]["offset_in_pack"]) == (0, 8)
    assert (got[3]["pack_id"], got[3]["offset_in_pack"]) == (1, 2)


def test_pack_sequences_buckets_partition_independently(spark):
    docs = _docs(spark, [(i, "t1 t2 t3") for i in range(64)])
    rows = ft.pack_sequences(docs, ctx_tokens=7, buckets=4).collect()
    assert {r["bucket"] for r in rows} == {0, 1, 2, 3}
    # within every bucket the offsets replay the same running sum mod ctx
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rs in by_bucket.values():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["pack_id"] == cum // 7
            assert r["offset_in_pack"] == cum % 7
            cum += r["n_tok"]


def test_tfidf_rare_term_outranks_stopword(spark):
    # 'the' appears in every doc (df=4), 'zephyr' only in doc 0 (df=1):
    # same tf, but the rarity ratio puts zephyr first
    docs = _docs(
        spark,
        [
            (0, "the zephyr the zephyr"),
            (1, "the cat"),
            (2, "the dog"),
            (3, "the owl"),
        ],
    )
    got = {(r["doc_id"], r["rank"]): r for r in
           ft.tfidf_top_terms(docs, k=2).collect()}
    top0 = got[(0, 1)]
    assert top0["term"] == "zephyr"
    # exact integer score: tf(2) * 1e6 * N(4) div df(1)
    assert top0["score"] == 2 * 1_000_000 * 4
    assert got[(0, 2)]["term"] == "the"
    assert got[(0, 2)]["score"] == 2 * 1_000_000 * 4 // 4


def test_tfidf_tie_breaks_lexicographic_and_caps_k(spark):
    docs = _docs(spark, [(0, "b a c"), (1, "x y")])
    rows = [r for r in ft.tfidf_top_terms(docs, k=2).collect()
            if r["doc_id"] == 0]
    # all three terms tie (tf=1, df=1) — lexicographic order, capped at 2
    assert [(r["rank"], r["term"]) for r in sorted(rows, key=lambda r: r["rank"])] == [
        (1, "a"),
        (2, "b"),
    ]


def test_length_buckets_power_of_two_boundaries(spark):
    # 8 words sits in bucket_pow=3 (lo 8); 15 in 3; 16 opens bucket 4.
    docs = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 8)),
            (2, " ".join(["w"] * 15)),
            (3, " ".join(["w"] * 16)),
        ],
        schema="doc_id long, text string",
    )
    from log_aggregator_spark.functions.text import length_buckets

    got = {r["bucket_pow"]: r for r in length_buckets(docs).collect()}
    assert set(got) == {3, 4}
    assert got[3]["bucket_lo"] == 8 and got[3]["n_docs"] == 2
    assert got[3]["sum_tok"] == 23
    assert got[4]["bucket_lo"] == 16 and got[4]["sum_tok"] == 16
    # ppm shares: integer floor-div against the 39-token total
    assert got[3]["share_ppm"] == 23 * 1_000_000 // 39
    assert got[4]["share_ppm"] == 16 * 1_000_000 // 39


def test_split_assign_deterministic_and_total(spark):
    docs = spark.createDataFrame(
        [(i, "a b c", "src0") for i in range(300)],
        schema="doc_id long, text string, source string",
    )
    got = {r["split"]: r for r in ft.split_assign(docs).collect()}
    assert set(got) <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in got.values()) == 300
    assert got["train"]["n_docs"] > got.get("val", got["train"])["n_docs"]
    # deterministic: identical on re-run
    again = {r["split"]: r["n_docs"] for r in ft.split_assign(docs).collect()}
    assert again == {k: v["n_docs"] for k, v in got.items()}
