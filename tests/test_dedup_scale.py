"""Scale-safety properties of the dedup/similarity families:

* the shingle df cap actually bites on a skewed corpus (one stop-shingle in
  50% of docs) and the capped pair set matches a capped DuckDB oracle;
* the brute-force similarity baselines refuse to run past the sample bound;
* connected-components min-label propagation handles chains (the pointer-
  jumping case), cliques and singletons with a deterministic survivor.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from log_aggregator_spark.functions import dedup as fdedup
from log_aggregator_spark.functions import similarity as fsim


def _skewed_docs(spark):
    """40 docs. Docs 0..19 are pure stop-phrase docs — one shingle
    ('zz zz zz') with df=20, so uncapped they form a C(20,2)=190-pair
    clique from a single join key (the stop-shingle blowup in miniature).
    Docs 20..39 pair up (2i, 2i+1) on rare shared tails."""
    rows = []
    for i in range(40):
        if i < 20:
            rows.append((i, "zz zz zz zz zz"))
        else:
            k = i // 2
            rows.append((i, f"p{k} q{k} r{k} s{k} t{k} u{i}"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        schema="doc_id long, text string",
    )


def _oracle_jaccard(pdf: pd.DataFrame, df_cap: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", pdf)
    return con.sql(
        rf"""
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
           FROM documents),
sh3 AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, words,
               unnest(range(1, greatest(len(words)-2, 1) + 1)) AS i FROM w)
),
shc AS (
  SELECT doc_id, shingle FROM sh3
  WHERE shingle IN (SELECT shingle FROM sh3 GROUP BY 1 HAVING count(*) <= {df_cap})
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter, CAST(sa.n_sh + sb.n_sh - inter AS BIGINT) AS uni
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 2 * inter >= 1 * (sa.n_sh + sb.n_sh - inter)
ORDER BY doc_a, doc_b
"""
    ).df()


def test_df_cap_bites_and_matches_oracle(spark):
    docs = _skewed_docs(spark)
    sh = fdedup.shingles(docs)
    hot_df = (
        sh.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    )
    assert hot_df == 20  # the skew is real

    capped = (
        fdedup.jaccard_pairs(docs, df_cap=10)
        .orderBy("doc_a", "doc_b")
        .toPandas()
    )
    want = _oracle_jaccard(docs.toPandas(), df_cap=10)
    pd.testing.assert_frame_equal(
        capped.reset_index(drop=True).astype("int64"),
        want.reset_index(drop=True).astype("int64"),
    )

    # uncapped, the hot shingle alone links all C(20,2)=190 hot docs;
    # capped, candidate volume collapses to the 10 rare-tail pairs
    uncapped = fdedup.jaccard_pairs(docs, df_cap=10**9).count()
    assert uncapped == 190 + 10
    assert len(capped) == 10


def test_capped_minhash_drops_hot_shingle_only(spark):
    docs = _skewed_docs(spark)
    # cap above the skew → identical signatures with or without the cap
    sig_hi = fdedup.minhash_signatures(docs, df_cap=10**9).orderBy("doc_id").toPandas()
    sig_20 = fdedup.minhash_signatures(docs, df_cap=20).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(sig_hi, sig_20)
    # cap below the skew → the pure-stop-phrase docs have NO surviving
    # shingles and drop out of the signature table (nothing to LSH on —
    # identical docs are exact_groups' job); content docs all survive
    sig_lo = fdedup.minhash_signatures(docs, df_cap=10).orderBy("doc_id").toPandas()
    assert sorted(sig_lo["doc_id"]) == list(range(20, 40))


def test_quadratic_guard_trips(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="sample bound"):
        fsim.brute_topk(emb, max_rows=10)
    with pytest.raises(ValueError, match="sample bound"):
        fsim.cosine_near_dup(emb, max_rows=10)
    # explicit override still works
    assert fsim.brute_topk(emb, max_rows=10, allow_quadratic=True).count() > 0


def test_zero_norm_vectors_excluded_everywhere_but_norm_stats(spark):
    """Cosine is undefined for a zero-norm vector (0/0 = NaN, ordered
    differently by numpy / Spark / DuckDB), so the _vecs boundary excludes
    them from every similarity operator — verified against the DuckDB
    twin on a corpus CONTAINING a zero vector — while norm_stats (the QA
    query) still reports them."""
    import numpy as np

    dim = fsim.DIM
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=dim)]) for i in (1, 2, 4)]
    rows.append((3, [0.0] * dim))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    emb = spark.createDataFrame(pdf, schema="vec_id long, embedding array<double>")

    topk = fsim.brute_topk(emb, allow_quadratic=True).toPandas()
    near = fsim.cosine_near_dup(emb, tau=-2.0, allow_quadratic=True).toPandas()
    sig = fsim.lsh_signature(emb).toPandas()
    asg = fsim.ivf_assign(emb).toPandas()
    touched = (
        set(topk["vec_id"]) | set(topk["neighbor_id"]) | set(near["vec_a"])
        | set(near["vec_b"]) | set(sig["vec_id"]) | set(asg["vec_id"])
    )
    assert 3 not in touched and touched == {1, 2, 4}

    blk = fsim.ivf_topk(emb, impl="block").orderBy("vec_id", "rank").toPandas()
    jn = fsim.ivf_topk(emb, impl="join").orderBy("vec_id", "rank").toPandas()
    pd.testing.assert_frame_equal(blk, jn)
    assert 3 not in set(blk["vec_id"]) | set(blk["neighbor_id"])

    # the DuckDB twin agrees row-for-row ON THIS corpus (the gate fixture
    # has no zero vectors; this pins the edge the fixture can't reach)
    from log_aggregator_spark.oracle_sql import SIMILARITY_SQL

    con = duckdb.connect()
    con.register("embeddings", pdf)
    want = {
        tuple(r)
        for r in con.sql(SIMILARITY_SQL["sim_brute_topk"]).fetchall()
    }
    got = {
        (r["vec_id"], r["rank"], r["neighbor_id"], r["sim_x1m"])
        for r in fsim.brute_topk(emb, allow_quadratic=True).collect()
    }
    assert got == want

    # norm_stats is the ONE query that must still see the zero vector
    ns = fsim.norm_stats(emb).toPandas()
    assert int(ns["n_vecs"].sum()) == 4
    zero_bucket = ns[ns["norm_x10"] == 0]
    assert len(zero_bucket) == 1 and int(zero_bucket["min_norm_mill"].iloc[0]) == 0


def test_survivors_giant_cluster_no_rank_window(spark):
    """Survivor pick on the inherently-skewed key: one cluster holding 90%
    of the corpus must flow through a map-combinable aggregate, not a
    single-task rank-window sort (VERDICT r2 wrong #2). Checks both the
    semantics (most words, tie → min doc_id) and the physical plan (hash
    aggregate on cluster_id, zero Window nodes)."""
    n = 1000
    rows = [
        (i, ("w " * (3 + (i % 7))).strip(), 0 if i < 900 else i)
        for i in range(n)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "_c"]),
        schema="doc_id long, text string, _c long",
    )
    clusters = docs.select("doc_id", F.col("_c").alias("cluster_id"))
    surv = fdedup.survivors_by_quality(docs.select("doc_id", "text"), clusters=clusters)

    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "survivor pick must not use a rank window"
    # the property that defuses the skew: MAP-SIDE partial aggregation
    # (max(struct) plans as SortAggregate — struct max isn't Tungsten-hash-
    # aggregable — but partial_max collapses the giant cluster per task)
    assert "partial_max" in plan

    got = {r["cluster_id"]: r for r in surv.collect()}
    assert len(got) == 101
    big = got[0]
    # docs 0..899: word count 3 + (i % 7); max 9 words first hit at i=6
    assert big["n_docs"] == 900
    assert big["survivor_n_words"] == 9 and big["survivor_doc"] == 6
    assert got[950]["n_docs"] == 1 and got[950]["survivor_doc"] == 950


def test_jaccard_pairs_leaves_no_pinned_storage(spark):
    """Library functions must not pin executor memory for the session
    (VERDICT r2 wrong #5): after the pair query returns, no cached RDDs
    remain."""
    docs = _skewed_docs(spark)
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    fdedup.jaccard_pairs(docs, df_cap=10).count()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before, f"jaccard_pairs pinned {after - before} new RDDs"


def test_components_chain_clique_singleton(spark):
    # chain 1-2-3-4-5 (worst case for naive propagation), clique {10,11,12},
    # singleton 20
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)],
        schema="doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 20]], schema="doc_id long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in fdedup.components(pairs, nodes).collect()
    }
    assert got == {
        1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (1, 0), 5: (1, 0),
        10: (10, 1), 11: (10, 0), 12: (10, 0),
        20: (20, 1),
    }


def test_repetition_stats_flags_crafted_docs(spark):
    """Gopher rules on hand-computable docs: a one-phrase spam doc trips
    both thresholds; a diverse doc passes; a half-duplicated doc trips only
    the dup-word rule."""
    from log_aggregator_spark.functions import text as ftext

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),      # 1 distinct word
            (2, "one two three four five six seven"),  # all distinct
            (3, "a b c d a b c d"),                    # dup words, no dominant 2-gram? (a b) x2 of 7 grams
        ],
        schema="doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ftext.repetition_stats(docs).collect()}
    # doc 1: 5 bigrams all "spam spam" -> top=1000; dup = (6-1)/6 -> 833
    assert got[1]["top_ngram_x1000"] == 1000
    assert got[1]["dup_word_x1000"] == 833
    assert got[1]["keep"] == 0
    # doc 2: 6 distinct bigrams -> top=166; dup=0 -> keep
    assert got[2]["top_ngram_x1000"] == 166
    assert got[2]["dup_word_x1000"] == 0
    assert got[2]["keep"] == 1
    # doc 3: 7 bigrams, "a b"/"b c"/"c d" each x2 -> top=285 (<=200? no: 285>200)
    # dup = (8-4)/8 = 500 > 300 -> dropped either way
    assert got[3]["top_ngram_x1000"] == 285
    assert got[3]["dup_word_x1000"] == 500
    assert got[3]["keep"] == 0


def test_domain_quota_two_phase_equals_direct_rank(spark):
    """The salted two-phase top-k must equal a direct single-window rank on
    a skewed domain distribution (one source = 80% of docs) — the pre-prune
    loses nothing, it only bounds per-task sort input."""
    from pyspark.sql import Window

    from log_aggregator_spark.functions import text as ftext

    rows = []
    for i in range(500):
        src = "big.com" if i < 400 else f"s{i % 5}.org"
        rows.append((i, src, "w " * (1 + i % 37)))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]),
        schema="doc_id long, source string, text string",
    )
    got = ftext.domain_quota(docs, k=7, salt_buckets=4)

    w = Window.partitionBy("source").orderBy(F.desc("n_words"), "doc_id")
    direct = (
        docs.select(
            "doc_id", "source",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_words"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 7)
        .select("source", "rank", "doc_id", "n_words")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))
    # quota actually bites on the skewed domain
    assert got.where(F.col("source") == "big.com").count() == 7


def test_semantic_near_dup_is_same_cell_subset_of_brute(spark):
    """semantic_near_dup = brute near-dup pairs whose two vectors share an
    IVF cell: every returned pair is in the brute set with an identical
    sim_x1m, and the set equals the same-cell filter of the brute set."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sem = {
        (r["vec_a"], r["vec_b"]): r["sim_x1m"]
        for r in fsim.semantic_near_dup(emb).collect()
    }
    brute = {
        (r["vec_a"], r["vec_b"]): r["sim_x1m"]
        for r in fsim.cosine_near_dup(emb, allow_quadratic=True).collect()
    }
    cells = {r["vec_id"]: r["cell"] for r in fsim.ivf_assign(emb).collect()}
    want = {p: s for p, s in brute.items() if cells[p[0]] == cells[p[1]]}
    assert sem == want
    assert set(sem) <= set(brute)


def test_span_dedup_drops_repeated_blocks_keeps_tail(spark):
    """8-word blocks: doc 2 repeats doc 1's first block -> dropped from
    doc 2; a tail stub textually equal to a full block is never dropped."""
    from log_aggregator_spark.functions import dedup as fd

    b1 = "w1 w2 w3 w4 w5 w6 w7 w8"          # one full block
    b2 = "x1 x2 x3 x4 x5 x6 x7 x8"
    docs = spark.createDataFrame(
        [
            (1, f"{b1} {b2}"),       # doc 1: two full blocks, both first
            (2, f"{b1} tail words"), # doc 2: block b1 (dup) + 2-word tail
            (3, b1[:11]),            # doc 3: "w1 w2 w3 w4"[:11]="w1 w2 w3 w4"? tail-only doc
        ],
        schema="doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in fd.span_dedup(docs).collect()}
    assert got[1]["n_spans"] == 2 and got[1]["n_dropped"] == 0
    # doc 2: full block b1 lost to doc 1; tail kept
    assert got[2]["n_spans"] == 2 and got[2]["n_dropped"] == 1
    import hashlib
    assert got[2]["dedup_md5"] == hashlib.md5(b"tail words").hexdigest()
    # doc 3 is all tail (fewer than 8 words): untouched
    assert got[3]["n_dropped"] == 0


def test_span_dedup_first_occurrence_is_lexicographic_min(spark):
    """The survivor of a repeated block is min (doc_id, idx) — within one
    doc the earliest index wins, across docs the lowest doc_id."""
    from log_aggregator_spark.functions import dedup as fd

    blk = "a1 a2 a3 a4 a5 a6 a7 a8"
    other = "z1 z2 z3 z4 z5 z6 z7 z8"
    docs = spark.createDataFrame(
        [(5, f"{other} {blk}"), (9, f"{blk} {other}")],
        schema="doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in fd.span_dedup(docs).collect()}
    # doc 5 holds both blocks first (doc_id 5 < 9) -> doc 9 loses both
    assert got[5]["n_dropped"] == 0
    assert got[9]["n_dropped"] == 2
    import hashlib
    assert got[9]["dedup_md5"] == hashlib.md5(b"").hexdigest()


def test_incremental_exact_anti_join_and_intra_batch_pick(spark):
    """Echo of a corpus doc dies in the anti-join; intra-batch dups
    collapse to the min doc_id with the dup count; unique fresh docs
    survive with count 1."""
    from log_aggregator_spark.functions import dedup as fd

    corpus = spark.createDataFrame(
        [(1, "old news"), (2, "stale text")], schema="doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "Old News "),   # normalizes to corpus fp -> killed
            (11, "fresh alpha"),
            (12, "fresh alpha"), # intra-batch dup of 11
            (13, "fresh beta"),
        ],
        schema="doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_batch_dups"]
           for r in fd.incremental_exact(corpus, batch).collect()}
    assert got == {11: 2, 13: 1}


def test_incremental_near_lsh_collision_kills_unique_survives(spark):
    """A batch doc textually identical to a corpus doc collides in every
    band (same signature) -> suspect; a batch doc with disjoint shingles
    has zero collisions -> survivor. Index and batch keys are hashed with
    the same recipe over the union, as the entry query does."""
    from log_aggregator_spark.functions import dedup as fd
    import pyspark.sql.functions as F

    dup = "alpha beta gamma delta epsilon zeta"
    uniq = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(1, dup), (2, "totally different corpus text here"), (10, dup),
         (11, uniq)],
        schema="doc_id long, text string",
    )
    keys = fd.minhash_band_keys(fd.minhash_signatures(docs))
    index_keys = keys.where(F.col("doc_id") < 10)
    batch_keys = keys.where(F.col("doc_id") >= 10)
    batch_ids = docs.where("doc_id >= 10").select("doc_id")
    got = {r["doc_id"]: r for r in fd.incremental_near_lsh(
        index_keys, batch_keys, batch_ids).collect()}
    assert got[10]["survives"] == 0 and got[10]["n_corpus_hits"] == 1
    assert got[11]["survives"] == 1 and got[11]["n_corpus_hits"] == 0


def test_corpus_mix_weights_override_and_determinism(spark):
    """Explicit weights pin the rate (0 -> nothing kept, 16 -> all kept);
    two runs agree row-for-row (content-hash, no rand())."""
    from log_aggregator_spark.functions import text as ft

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = ft.corpus_mix(docs, weights={"src0": 16, "src1": 0})
    rows = {r["source"]: r for r in m.collect()}
    assert rows["src0"]["n_kept"] == rows["src0"]["n_total"]
    assert rows["src1"]["n_kept"] == 0
    again = {r["source"]: r for r in ft.corpus_mix(
        docs, weights={"src0": 16, "src1": 0}).collect()}
    assert {s: tuple(r) for s, r in rows.items()} == \
           {s: tuple(r) for s, r in again.items()}
    # default policy: every rate within 1..8 of 16
    for r in ft.corpus_mix(docs).collect():
        assert 1 <= r["rate_16ths"] <= 8


def test_containment_catches_snippet_jaccard_misses(spark):
    """A 12-word snippet inside a 120-word doc: containment flags it
    (a_in_b = 1); Jaccard at the same corpus scores it ~0.09 — the
    asymmetric case the operator exists for."""
    import log_aggregator_spark.functions.dedup as fd

    base_words = [f"w{i}" for i in range(120)]
    docs = spark.createDataFrame(
        [(1, " ".join(base_words)), (2, " ".join(base_words[:12]))],
        schema="doc_id long, text string",
    )
    got = fd.containment_pairs(docs).collect()
    assert len(got) == 1
    (r,) = got
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    # snippet fully contained: inter == nb (the snippet's shingle count)
    assert r["inter"] == r["nb"] and r["b_in_a"] == 1 and r["a_in_b"] == 0
    jac = fd.jaccard_pairs(docs).collect()
    assert jac == []  # 10/118 well under the 0.5 jaccard threshold


def test_cluster_size_histogram_accounts_every_doc(spark):
    import log_aggregator_spark.functions.dedup as fd
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ee"), (3, "zz yy xx ww vv")],
        schema="doc_id long, text string",
    )
    clusters = fd.duplicate_clusters(docs)
    hist = fd.cluster_size_histogram(docs, clusters=clusters).collect()
    assert sum(r["n_docs"] for r in hist) == 3
    by_size = {r["cluster_size"]: r["n_clusters"] for r in hist}
    assert by_size.get(2) == 1 and by_size.get(1) == 1


def test_edge_families_policy_knob(spark):
    """The deployment edge-set knob: ("exact","minhash") must drop the
    coarse simhash edges (the family that saturates past ~10^5 docs) while
    keeping exact+near clusters; bad family names fail loudly."""
    import pytest as _pytest

    import log_aggregator_spark.functions.dedup as fd

    # docs 1,2 byte-identical (exact edge); 3 shares no text with anyone.
    # All three share most vocabulary, so 16-bit simhash merges 1-2-3.
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh"),
         (2, "aa bb cc dd ee ff gg hh"),
         (3, "aa bb cc dd ee ff gg zz")],
        schema="doc_id long, text string",
    )
    full = {r["doc_id"]: r["cluster_id"]
            for r in fd.duplicate_clusters(docs).collect()}
    no_sim = {r["doc_id"]: r["cluster_id"]
              for r in fd.duplicate_clusters(
                  docs, edge_families=("exact", "minhash")).collect()}
    assert no_sim[1] == no_sim[2]  # exact edge survives
    assert len(set(no_sim.values())) >= len(set(full.values()))
    with _pytest.raises(ValueError):
        fd.all_near_dup_pairs(docs, edge_families=("exact", "phash"))
    with _pytest.raises(ValueError):
        fd.all_near_dup_pairs(docs, edge_families=())


def test_containment_fuzz_matches_set_arithmetic(spark):
    """Randomized corpora (disjoint vocab per corpus, one Spark job for
    all) vs a literal set-arithmetic oracle of Broder containment with the
    same tail-shingle rule. Exercises short docs (1-2 words -> one tail
    shingle), full-overlap, partial-overlap and disjoint pairs."""
    import numpy as np

    import log_aggregator_spark.functions.dedup as fd

    rng = np.random.default_rng(20260818)
    rows, expected = [], set()
    all_sets: dict[int, set] = {}
    for corpus in range(8):
        vocab = [f"c{corpus}w{k}" for k in range(8)]
        n_docs = int(rng.integers(2, 12))
        for i in range(n_docs):
            doc_id = corpus * 1000 + i
            n_words = int(rng.integers(1, 20))
            words = [vocab[int(j)] for j in rng.integers(0, len(vocab), n_words)]
            rows.append((doc_id, " ".join(words)))
            # same shingle rule as text.shingles(n=3): windows at 1..max(n-2,1)
            sh = {
                " ".join(words[j:j + 3])
                for j in range(max(len(words) - 2, 1))
            }
            all_sets[doc_id] = sh
    for a in all_sets:
        for b in all_sets:
            if a < b and (a // 1000) == (b // 1000):
                inter = len(all_sets[a] & all_sets[b])
                if 5 * inter >= 4 * len(all_sets[a]) or 5 * inter >= 4 * len(all_sets[b]):
                    expected.add((a, b, inter, len(all_sets[a]), len(all_sets[b])))

    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["inter"], r["na"], r["nb"])
        for r in fd.containment_pairs(docs).collect()
    }
    assert got == expected


def test_arrow_kernels_equal_jvm_twins(spark):
    """The vectorized Arrow kernels must compute the bitwise-identical
    results as their JVM higher-order-function twins — the exactness
    argument (integer-valued doubles < 2^53 sum exactly in any order)
    made falsifiable: signature buckets, IVF cell assignment, and the
    pair-dot column all cross-checked on real fixture data."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    sig_a = fsim.lsh_signature(emb, impl="arrow").orderBy("vec_id", "band")
    sig_j = fsim.lsh_signature(emb, impl="jvm").orderBy("vec_id", "band")
    pd.testing.assert_frame_equal(sig_a.toPandas(), sig_j.toPandas())

    asg_a = fsim.ivf_assign(emb, impl="arrow").orderBy("vec_id")
    asg_j = fsim.ivf_assign(emb, impl="jvm").orderBy("vec_id")
    pd.testing.assert_frame_equal(asg_a.toPandas(), asg_j.toPandas())

    # pair-dot kernel vs the sequential JVM fold on all same-cell pairs
    v = fsim._vecs(emb)
    a = v.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).limit(5000)
    both = pairs.select(
        fsim._pair_dot_pd(F.col("va"), F.col("vb")).alias("arrow_dot"),
        fsim._dot(F.col("va"), F.col("vb")).alias("jvm_dot"),
    ).where(F.col("arrow_dot") != F.col("jvm_dot"))
    assert both.count() == 0


def test_ivf_topk_block_equals_join(spark):
    """The per-cell block-matmul path (FAISS shape, default) must return
    row-identical results to the ids-only candidate-join twin — same exact
    IEEE op sequence, same (sim desc, nb_id asc) tie rule, self excluded,
    including with a separate query side."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = fsim.ivf_topk(emb, impl="block").orderBy("vec_id", "rank").toPandas()
    b = fsim.ivf_topk(emb, impl="join").orderBy("vec_id", "rank").toPandas()
    pd.testing.assert_frame_equal(a, b)
    q = emb.where(F.col("vec_id") % 7 == 0)
    aq = fsim.ivf_topk(emb, queries=q, k=3, impl="block").orderBy(
        "vec_id", "rank").toPandas()
    bq = fsim.ivf_topk(emb, queries=q, k=3, impl="join").orderBy(
        "vec_id", "rank").toPandas()
    pd.testing.assert_frame_equal(aq, bq)


def test_quantized_dots_are_integer_valued(spark):
    """Every quantized dot must be an exact integer (the precondition of
    the cross-engine exactness argument): n2 == floor(n2) for the whole
    fixture, and the worst-case bound stays far below 2^53."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    v = fsim._vecs(emb)
    frac = v.where(F.col("n2") != F.floor(F.col("n2")).cast("double"))
    assert frac.count() == 0
    mx = v.agg(F.max(F.aggregate(
        F.transform("v", lambda x: F.abs(x)), F.lit(0.0),
        lambda acc, x: F.greatest(acc, x)))).collect()[0][0]
    assert mx * fsim._PLANES_ABS_MAX * fsim.DIM < 2.0**53


def _df_pairs(spark, pairs):
    return spark.createDataFrame(pairs or [(0, 0)], "doc_a long, doc_b long").where(
        "doc_a != 0 or doc_b != 0" if not pairs else "true"
    )


def _df_nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_merge_clusters_equals_full_recompute(spark):
    """Incremental cluster maintenance ≡ full CC on a two-batch fixture,
    including the hard case: a batch doc BRIDGING two stored clusters.
    Corpus A: {1,2}, {3}, {4}, {5,6}. Batch B: 7 dups 3; 8 bridges the
    {1,2} and {5,6} clusters; 9 unique; 10 chains onto 7. The merge sees
    ONLY batch-touching edges — old pairs are never re-read."""
    edges_a = [(1, 2), (5, 6)]
    edges_b = [(3, 7), (1, 8), (6, 8), (7, 10)]
    stored = fdedup.components(_df_pairs(spark, edges_a), _df_nodes(spark, range(1, 7)))
    incr = fdedup.merge_clusters(
        stored, _df_nodes(spark, range(7, 11)), _df_pairs(spark, edges_b)
    )
    full = fdedup.components(
        _df_pairs(spark, edges_a + edges_b), _df_nodes(spark, range(1, 11))
    )
    assert sorted(map(tuple, incr.collect())) == sorted(map(tuple, full.collect()))
    got = {r["doc_id"]: r["cluster_id"] for r in incr.collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 1, 6: 1, 7: 3, 8: 1, 9: 9, 10: 3}


def test_merge_clusters_empty_batch_and_new_min_label(spark):
    """Edge cases: an edge-free batch appends singletons untouched; a new
    doc with a SMALLER id than its cluster's stored label becomes the new
    canonical (label = min over the merged component, same as full CC)."""
    stored = fdedup.components(_df_pairs(spark, [(20, 30)]), _df_nodes(spark, [20, 30, 40]))
    only_new = fdedup.merge_clusters(
        stored, _df_nodes(spark, [50]), _df_pairs(spark, []).limit(0)
    )
    assert sorted(map(tuple, only_new.collect())) == [
        (20, 20, 1), (30, 20, 0), (40, 40, 1), (50, 50, 1)]
    relabel = fdedup.merge_clusters(
        stored, _df_nodes(spark, [5]), _df_pairs(spark, [(5, 30)])
    )
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in relabel.collect()}
    assert got == {5: (5, 1), 20: (5, 0), 30: (5, 0), 40: (40, 1)}


def test_simhash_near_pairs_matches_bruteforce(spark):
    """The value-space candidate stage must reproduce EXACTLY the doc-level
    definition — all (doc_a < doc_b) with hamming(simhash) ≤ 3 — on a
    fixture with both same-fingerprint groups and cross-value neighbors."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    sh = {r["doc_id"]: r["simhash"] for r in fdedup.simhash(docs).collect()}
    want = {
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for a in sh for b in sh
        if a < b and bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in fdedup.simhash_near_pairs(docs).collect()
    }
    assert got == want
    assert any(h == 0 for *_, h in got) and any(h > 0 for *_, h in got)


def test_simhash_value_edges_connectivity_equivalent(spark):
    """Components over the O(n) star+rep edge graph must equal components
    over the full verified pair set (the clustering-correctness claim)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    nodes = docs.select("doc_id")
    via_edges = fdedup.components(fdedup.simhash_value_edges(docs), nodes)
    via_pairs = fdedup.components(
        fdedup.simhash_near_pairs(docs).select("doc_a", "doc_b"), nodes
    )
    assert sorted(map(tuple, via_edges.collect())) == \
           sorted(map(tuple, via_pairs.collect()))


def test_simhash_hot_fingerprint_edges_stay_linear(spark):
    """One hot template putting every doc on a single fingerprint: the
    clustering edge graph is exactly n-1 star edges, while the pair REPORT
    is the C(n,2) clique it inherently enumerates — the skew case the
    value-space split exists for."""
    n = 200
    docs = spark.createDataFrame(
        [(i, "same template text every time") for i in range(n)],
        schema="doc_id long, text string",
    )
    assert fdedup.simhash_value_edges(docs).count() == n - 1
    assert fdedup.simhash_near_pairs(docs).count() == n * (n - 1) // 2


def test_merge_clusters_remap_is_broadcast(spark):
    """The stored table must pass through a BROADCAST lookup of the
    batch-sized remap — never a corpus-wide shuffle join."""
    stored = fdedup.components(_df_pairs(spark, [(1, 2)]), _df_nodes(spark, [1, 2, 3]))
    out = fdedup.merge_clusters(
        stored, _df_nodes(spark, [9]), _df_pairs(spark, [(2, 9)])
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

def test_components_endgame_equals_iterative(spark):
    """The small-graph endgame (collect residual edges + driver union-find
    + one broadcast remap) must be label-identical to the pure iterative
    form (endgame_cap=0) — fuzzed over random graphs covering chains,
    cliques, forests and singletons, plus cap values that fire the endgame
    at round 0 and mid-loop."""
    import random

    rng = random.Random(42)
    for trial in range(6):
        n = rng.randint(5, 60)
        m = rng.randint(0, n * 2)
        edges = [
            (rng.randint(1, n), rng.randint(1, n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = _df_pairs(spark, edges)
        nodes = _df_nodes(spark, range(1, n + 1))
        pure = sorted(
            map(tuple, fdedup.components(pairs, nodes, endgame_cap=0).collect())
        )
        # caps 4/16/64 fire MID-LOOP (after ≥1 contraction, labels no longer
        # identity — the union-find runs over a non-trivially contracted
        # residual); 10**6 fires at round 0. Edge counts are bidirectional
        # and thus always even, so tiny odd caps degenerate to the n_edges==0
        # case — the mid-loop arms must be ≥4 to actually exercise the remap.
        for cap in (4, 16, 64, 10**6):
            got = sorted(
                map(tuple, fdedup.components(pairs, nodes, endgame_cap=cap).collect())
            )
            assert got == pure, f"trial={trial} cap={cap}"


def test_components_endgame_long_chain(spark):
    """A 1→2→…→40 chain — worst case for label propagation — through the
    round-0 endgame: one union-find, one broadcast remap, exact labels."""
    n = 40
    pairs = _df_pairs(spark, [(i, i + 1) for i in range(1, n)])
    nodes = _df_nodes(spark, range(1, n + 1))
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in fdedup.components(pairs, nodes).collect()
    }
    assert got == {i: (1, 1 if i == 1 else 0) for i in range(1, n + 1)}

def test_components_stray_pair_endpoints_are_inert(spark):
    """A pair endpoint absent from `nodes` must be ignored, never elected
    as a cluster label — on BOTH the endgame path (which union-finds raw
    round-0 edges and must scrub strays first) and the iterative path
    (whose inner joins drop them structurally)."""
    pairs = _df_pairs(spark, [(1, 2), (2, 3)])  # node 1 does not exist
    nodes = _df_nodes(spark, [2, 3])
    want = [(2, 2, 1), (3, 2, 0)]
    for cap in (0, 10**6):
        got = sorted(map(tuple, fdedup.components(pairs, nodes, endgame_cap=cap).collect()))
        assert got == want, f"cap={cap}: {got}"
