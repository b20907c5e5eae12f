"""Physical-plan audit — regenerates PLANS.md.

For each headline operator, capture `.explain("formatted")` and assert the
plan properties that matter at 100 TB:

* pipeline enrich join is BroadcastHashJoin (never a shuffle join),
* the chunks scan's ReadSchema carries only (envelope, chunk_tokens, source),
* exactly ONE Exchange feeds the reassembly (plus the tiny aggregate
  exchange) — the irreducible per-stream total order,
* sink_counts is a partial hash aggregate (map-side combine before its
  one-row-per-sink exchange),
* the documents scan under text/dedup queries prunes to the referenced
  columns only.

Run: python scripts/audit_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def exchange_inputs(plan: str) -> list[str]:
    """The ``Input [...]`` attribute list of every shuffle-Exchange detail
    block — the anchored way to assert what payload crosses a shuffle
    (substring windows around 'Exchange' drift with plan layout)."""
    out = []
    for block in re.split(r"\(\d+\) Exchange\b", plan)[1:]:
        out.append(block.split("Arguments:")[0])
    return out


def main() -> None:
    from log_aggregator_spark import chunker
    from log_aggregator_spark.entry_queries import QUERIES
    from log_aggregator_spark.plans.pipeline import run_pipeline
    from log_aggregator_spark.session import get_spark

    spark = get_spark("plan-audit", cores=8, shuffle_partitions=8)
    docs = chunker.load_documents(spark, SF)
    sections: list[tuple[str, str, list[str]]] = []
    checks: list[str] = []

    def check(name: str, ok: bool, detail: str) -> None:
        checks.append(f"- [{'x' if ok else ' '}] {name}: {detail}")
        if not ok:
            raise SystemExit(f"PLAN AUDIT FAILED: {name} — {detail}")

    # --- pipeline over stored chunks + routes tables (production shape) --
    tmp = "/tmp/plan_audit_chunks"
    chunker.chunks(docs).write.mode("overwrite").parquet(tmp)
    chunker.routes_table(docs).write.mode("overwrite").parquet(tmp + "_routes")
    chunks = spark.read.parquet(tmp)
    routes = spark.read.parquet(tmp + "_routes")
    res = run_pipeline(chunks, routes)
    plan = fmt_plan(res.enriched)
    check("broadcast enrich", "BroadcastHashJoin" in plan,
          "routes join must broadcast")
    # count shuffle exchanges only (BroadcastExchange moves the dim table,
    # not the fact data)
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    check("single heavy exchange", n_exchange == 1,
          f"{n_exchange} shuffle Exchange nodes in enriched plan "
          "(reassembly only)")
    m = re.search(r"ReadSchema: struct<(.*)$", plan, re.MULTILINE)
    line = m.group(1) if m else ""
    cols = sorted(re.findall(r"(?:^|,)(\w+):", line))
    check("chunk scan pruned", cols == ["chunk_tokens", "envelope", "source"],
          f"scan reads {cols}")
    sections.append((
        "pipeline_enriched (scan → parse → gate/reassemble → broadcast enrich)",
        plan,
        ["one Exchange on (doc_id, session) — the irreducible reassembly shuffle",
         "BroadcastHashJoin for routes — no join shuffle",
         "ReadSchema pruned to (envelope, chunk_tokens, source)"],
    ))

    cplan = fmt_plan(res.counts)
    check("partial aggregate", cplan.count("HashAggregate") >= 2,
          "sink_counts must partial-agg before its exchange")
    sections.append(("pipeline_sink_counts", cplan,
                     ["two HashAggregate nodes = map-side partial combine"]))

    # --- a text query: pruned scan + codegen -----------------------------
    tq = QUERIES["text_token_count"](spark, SF)
    tplan = fmt_plan(tq)
    check("codegen text", "codegen id" in tplan, "text ops stay JVM-side")
    sections.append(("text_token_count", tplan,
                     ["WholeStageCodegen span covers the whole query",
                      "documents scan pruned to referenced columns"]))

    # --- similarity LSH: equi-join not cross join ------------------------
    lq = QUERIES["sim_lsh_pairs"](spark, SF)
    lplan = fmt_plan(lq)
    check("lsh no cartesian", "CartesianProduct" not in lplan,
          "LSH candidate join must be an equi-join on (band, bucket)")
    sections.append(("sim_lsh_pairs", lplan,
                     ["equi-join on (band, bucket): the scale path — no cross join"]))

    # --- LSH signature: Arrow matmul kernel; zero-norm filter in codegen --
    sgq = QUERIES["sim_lsh_signature"](spark, SF)
    sgplan = fmt_plan(sgq)
    check("signature arrow kernel", "ArrowEvalPython" in sgplan,
          "the 96-plane projection must be the vectorized Arrow matmul")
    check(
        "signature single matmul",
        len(re.findall(r"\(\d+\) ArrowEvalPython", sgplan)) == 1,
        "exactly ONE ArrowEvalPython node (the nondeterministic guard "
        "keeps Catalyst from duplicating the matmul under the "
        "explode-inferred filter — review finding, r4)",
    )
    check("signature no interpreted fold", "aggregate(" not in sgplan,
          "the zero-norm exclusion must be the codegen array_remove "
          "predicate — filtering on n2 > 0 would force the interpreted "
          "HOF dot-product fold into the index build, the one full-corpus "
          "pass to keep cheap")
    sections.append(("sim_lsh_signature", sgplan,
                     ["ArrowEvalPython matmul kernel; zero-norm exclusion "
                      "via codegen size(array_remove) — the pruned n2 fold "
                      "never evaluates"]))

    # --- corpus-sized LSH (deployment index, bench --scaling-sim) ---------
    from log_aggregator_spark.functions import similarity as fsim

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    ssig = fsim.scaled_lsh_signature(emb, bits_per_band=20)
    ssplan = fmt_plan(ssig)
    check("scaled signature zero exchange", "Exchange" not in ssplan,
          "the corpus-sized index build must be embarrassingly parallel — "
          "scan → Arrow matmul → explode, no shuffle anywhere")
    check(
        "scaled signature single matmul",
        len(re.findall(r"\(\d+\) ArrowEvalPython", ssplan)) == 1,
        "exactly ONE ArrowEvalPython node: without the nondeterministic "
        "guard Catalyst plants the explode-inferred size/isnotnull filter "
        "UNDER a second copy of the UDF and the full matmul runs twice "
        "per row (review finding, r4)",
    )
    sections.append(("scaled_lsh_signature", ssplan,
                     ["ZERO Exchange: the one full-corpus pass shuffles "
                      "nothing", "ArrowEvalPython matmul kernel"]))
    spairs = fsim.scaled_lsh_pairs(emb, 0.99, bits_per_band=20)
    spplan = fmt_plan(spairs)
    check("scaled pairs no cartesian", "CartesianProduct" not in spplan,
          "the scaled candidate join must be an equi-join on (band, bucket)")
    # the real invariant, independent of Catalyst's broadcast-vs-shuffle
    # pick at this SF: NO shuffle exchange anywhere in the pair plan
    # carries a vector column — candidates and their dedup move ids only;
    # vectors re-attach once per deduped pair (broadcast here, a
    # co-partitioned join on vec_id at scale)
    shuffles = exchange_inputs(spplan)
    # match the aliased vector columns too (va#/vb# from _attach_vectors)
    # — a bare "v#" substring can never match "va#123", so the original
    # form of this check could not catch the exact regression it exists
    # for (review finding, r4); columns print after "[" or ", "
    _vec_col = re.compile(r"[\[, ](v|va|vb|embedding)#")
    check(
        "scaled pairs ids-only shuffle",
        bool(shuffles) and not any(_vec_col.search(x) for x in shuffles),
        "every shuffle exchange in the pair plan moves ids only — vector "
        "bytes re-attach once per deduped pair, never through a shuffle",
    )
    sections.append(("scaled_lsh_pairs", spplan,
                     ["equi-join on (band, bucket); candidate exchanges are "
                      "ids-only (24 B/row), vectors join once per deduped "
                      "pair"]))

    # --- top-k shapes: per-partition TakeOrdered, never a global window ---
    for qname in ("ev_topk_users", "text_vocab"):
        kq = QUERIES[qname](spark, SF)
        kplan = fmt_plan(kq)
        check(f"{qname} take-ordered", "TakeOrderedAndProject" in kplan,
              "top-k must plan TakeOrderedAndProject (per-partition top-k + "
              "driver merge), not a partition-less Window over all rows")
        sections.append((qname, kplan,
                         ["TakeOrderedAndProject: no single-partition window "
                          "over the full aggregate"]))

    # --- multimodal stats: payload bytes / Python must never appear ------
    mq = QUERIES["mm_format_stats"](spark, SF)
    mplan = fmt_plan(mq)
    check("mm stats pure JVM",
          "Python" not in mplan and "Arrow" not in mplan,
          "per-format media stats must not decode payloads (no Python/Arrow "
          "node in the plan)")
    sections.append(("mm_format_stats", mplan,
                     ["JVM-only projection + partial aggregate — payload "
                      "bytes never cross into Python"]))

    # --- dedup jaccard: equi-join on the (df-capped) shingle key ---------
    jq = QUERIES["dedup_ngram_jaccard"](spark, SF)
    jplan = fmt_plan(jq)
    check("jaccard no cartesian", "CartesianProduct" not in jplan,
          "shingle pair generation must be an equi-join, never a cross join")
    sections.append(("dedup_ngram_jaccard", jplan,
                     ["equi-join on the df-capped shingle key"]))

    # --- survivor pick: map-combinable aggregate, never a rank window ----
    sq = QUERIES["dedup_survivors"](spark, SF)
    splan = fmt_plan(sq)
    check("survivors no window", "Window" not in splan,
          "survivor pick must aggregate (max(struct)), not rank-window the "
          "inherently-skewed cluster key")
    check("survivors partial agg", "partial_max" in splan,
          "survivor aggregate must partial-combine map-side (giant-cluster "
          "skew defuser)")
    sections.append(("dedup_survivors", splan,
                     ["max(struct(n_words, -doc_id)) with map-side "
                      "partial_max — a giant duplicate cluster collapses "
                      "per task, no single-task rank sort"]))

    # --- repetition rules: per-doc Arrow kernel, zero shuffles ----------
    rq = QUERIES["text_repetition"](spark, SF)
    rplan = fmt_plan(rq)
    check("repetition no window", "Window" not in rplan,
          "Gopher repetition rules must be per-doc aggregation, not a window")
    check("repetition shuffle-free", "Exchange" not in rplan,
          "per-doc stats must be a narrow vectorized pass — the corpus's "
          "words must never cross an exchange (the JVM twin's "
          "(doc_id, ngram) shuffle exists only for the equality test)")
    sections.append(("text_repetition", rplan,
                     ["ZERO shuffles: one ArrowEvalPython projection "
                      "(Counter per doc per batch); no windows, no agg"]))

    # --- domain quota: salted two-phase top-k, phase-1 window is salted ---
    dq = QUERIES["text_domain_quota"](spark, SF)
    dplan = fmt_plan(dq)
    n_windows = dplan.count("(") and len(re.findall(r"\(\d+\) Window\b", dplan))
    check("domain quota two-phase", n_windows == 2,
          f"{n_windows} Window nodes — must be the salted pre-prune window "
          "plus the bounded final rank (≤ k·S rows per domain)")
    check("domain quota salted", "pmod(hash(doc_id" in dplan,
          "phase-1 window must partition by (source, pmod(hash(doc_id), S)) "
          "so no task ever sorts a whole crawl domain")
    sections.append(("text_domain_quota", dplan,
                     ["phase 1 ranks within (source, salt) — each task sorts "
                      "~1/S of a domain", "phase 2 ranks ≤ k·S survivors per "
                      "source — bounded regardless of domain size"]))

    # --- semantic near-dup: same-cell equi-join, never a cross join ------
    sn = QUERIES["sim_semantic_near_dup"](spark, SF)
    snplan = fmt_plan(sn)
    check("semantic near-dup no cartesian", "CartesianProduct" not in snplan,
          "SemDeDup candidate generation must equi-join on the IVF cell")
    sections.append(("sim_semantic_near_dup", snplan,
                     ["equi-join on cell bounds the per-cell block join; "
                      "ids-only through the join, vectors re-attached once"]))

    # --- span dedup: map-combinable winner pick, no cartesian ------------
    sp = QUERIES["dedup_span"](spark, SF)
    spplan = fmt_plan(sp)
    check("span dedup partial min", "partial_min" in spplan,
          "block winner pick must map-side combine (a boilerplate block "
          "repeated 10^9 times collapses to one row per task pre-shuffle)")
    check("span dedup no cartesian", "CartesianProduct" not in spplan,
          "winner re-join must be an equi-join on block")
    sections.append(("dedup_span", spplan,
                     ["min(struct(doc_id, idx)) partial-aggregates before "
                      "the block-key exchange; winners equi-join back"]))

    # --- incremental dedup: anti-join on fingerprints, text never shuffles
    iq = QUERIES["dedup_incremental"](spark, SF)
    iplan = fmt_plan(iq)
    check("incremental anti-join", "LeftAnti" in iplan,
          "corpus membership must be a LEFT ANTI join on the fingerprint")
    check("incremental fp-only shuffle",
          all("text#" not in x for x in exchange_inputs(iplan)),
          "raw text must not cross ANY shuffle — fingerprints only")
    sections.append(("dedup_incremental", iplan,
                     ["LEFT ANTI on md5 fingerprint; min/count partial-agg "
                      "for the intra-batch pick"]))

    # --- incremental LSH probe: banded equi-join, ids only ---------------
    ilq = QUERIES["dedup_incremental_lsh"](spark, SF)
    ilplan = fmt_plan(ilq)
    check("incr-lsh no cartesian", "CartesianProduct" not in ilplan,
          "the index probe must be an equi-join on (band, key)")
    check("incr-lsh ids-only probe",
          all("text#" not in x for x in exchange_inputs(ilplan)),
          "no text payload crosses any shuffle — band keys and ids only")
    sections.append(("dedup_incremental_lsh", ilplan,
                     ["batch band keys equi-join the stored index on "
                      "(band, key); countDistinct partial-aggregates"]))

    # --- corpus mix: literal CASE policy — no join anywhere --------------
    cq = QUERIES["text_corpus_mix"](spark, SF)
    cqplan = fmt_plan(cq)
    check("corpus mix joinless", "Join" not in cqplan,
          "the weights policy must ride the plan as a literal CASE, not a "
          "config-table join")
    sections.append(("text_corpus_mix", cqplan,
                     ["narrow projection + partial-agg groupBy(source) — "
                      "no join, no window"]))

    # --- sequence packing: one bucket shuffle, in-task running sum -------
    pq = QUERIES["text_pack_sequences"](spark, SF)
    pplan = fmt_plan(pq)
    check("pack single exchange", pplan.count(") Exchange") == 1,
          "one shuffle on the bucket key; cut points come from an in-task "
          "sort + running-sum window, never a global sort")
    check("pack joinless", "Join" not in pplan,
          "the pack manifest is a projection of the running sum — no join")
    sections.append(("text_pack_sequences", pplan,
                     ["Exchange(bucket) → Sort(doc_id) → running-sum "
                      "Window → integer div/mod projection"]))

    # --- tf-idf: equi-joins only; corpus size rides in as a broadcast ----
    tq = QUERIES["text_tfidf"](spark, SF)
    tplan = fmt_plan(tq)
    check("tfidf no cartesian", "CartesianProduct" not in tplan,
          "df re-join must be an equi-join on term; N joins as a "
          "broadcast single-row aggregate")
    check("tfidf broadcast corpus size", "BroadcastNestedLoopJoin" in tplan,
          "the 1-row n_docs aggregate must broadcast, not shuffle")
    sections.append(("text_tfidf", tplan,
                     ["partial-agg tf and df; term equi-join; 1-row "
                      "broadcast for N; per-doc bounded top-k window"]))

    # --- funnel: window chain, no per-step joins or scans ----------------
    fq = QUERIES["ev_funnel"](spark, SF)
    fplan = fmt_plan(fq)
    check("funnel joinless", "Join" not in fplan,
          "ordered funnel must be the window-chain form, not a k-way "
          "self-join (k shuffles of the full table)")
    check("funnel two exchanges max", fplan.count(") Exchange") <= 2,
          "one shuffle on user_id (windows + per-user agg share it) plus "
          "the single-row rollup")
    sections.append(("ev_funnel", fplan,
                     ["Exchange(user_id) → Sort → chained reach windows → "
                      "per-user agg reuses the partitioning → 1-row rollup"]))

    # --- column profile: one scan feeds every column's stats -------------
    prq = QUERIES["ev_profile"](spark, SF)
    prplan = fmt_plan(prq)
    check("profile single scan", prplan.count("Scan parquet") <= 2,
          "profiling unpivots via stack — one table scan, not one per "
          "column (plan shows the scan once in tree + once in detail)")
    check("profile no expand", ") Expand" not in prplan,
          "a single distinct aggregate must use the two-phase rewrite, "
          "not an Expand over the raw rows")
    sections.append(("ev_profile", prplan,
                     ["stack unpivot → groupBy(col, val) partial dedup → "
                      "groupBy(col) fold; exact distincts, one scan"]))

    # --- as-of enrich: one window pass, no join, no range explosion ------
    aq = QUERIES["ev_asof_enrich"](spark, SF)
    aplan = fmt_plan(aq)
    check("asof joinless", "Join" not in aplan,
          "as-of must be the single-pass window form — the range-join "
          "formulation explodes |errors|x|clicks| per user")
    check("asof single exchange", aplan.count(") Exchange") == 1,
          "one shuffle on user_id, then sort+window+filter in-task")
    sections.append(("ev_asof_enrich", aplan,
                     ["last(click, ignorenulls) over rows(-inf, -1) on the "
                      "(ts, event_id) order; one Exchange, zero joins"]))

    # --- retention: lead over user timeline, no self-join ----------------
    rq = QUERIES["ev_retention"](spark, SF)
    rplan = fmt_plan(rq)
    check("retention no self-join", "Join" not in rplan,
          "day-over-day retention must come from lead(day) over the user "
          "timeline, not a daily-actives self-join")
    sections.append(("ev_retention", rplan,
                     ["distinct (user, day) partial-agg; lead window on "
                      "user_id; per-day rollup partial-agg"]))

    # --- interval join: bucketed equi-join, never a nested-loop range join
    ivq = QUERIES["ev_interval_errors"](spark, SF)
    ivplan = fmt_plan(ivq)
    check("interval join bucketed",
          "CartesianProduct" not in ivplan
          and "BroadcastNestedLoopJoin" not in ivplan,
          "the range predicate must ride as a residual on a bucket "
          "equi-join — a nested-loop join is O(|sessions|·|errors|)")
    sections.append(("ev_interval_errors", ivplan,
                     ["intervals explode to covered hour buckets; join is "
                      "hash equi-join on bucket with the ts-range residual; "
                      "each error meets an interval at most once"]))

    # --- CDC merge: union + argmax aggregate, no join ---------------------
    mgq = QUERIES["tbl_merge_upsert"](spark, SF)
    mgplan = fmt_plan(mgq)
    check("merge joinless", "Join" not in mgplan,
          "MERGE must be union + max_by(payload, version), not a full "
          "outer join of base and batch")
    check("merge partial argmax", "partial_max_by" in mgplan,
          "the winner pick must map-side combine — each partition reduces "
          "to one candidate per local key before the single shuffle")
    sections.append(("tbl_merge_upsert", mgplan,
                     ["union is a plan concat (no movement); one Exchange "
                      "on doc_id with partial max_by; deletes filter after "
                      "the argmax (tombstones only win if newest)"]))

    # --- centroid update: partial-agg k-means reduce, no cartesian --------
    cuq = QUERIES["sim_centroid_update"](spark, SF)
    cuplan = fmt_plan(cuq)
    check("centroid update no cartesian", "CartesianProduct" not in cuplan,
          "the Lloyd reduce must be posexplode + partial-agg groupBy")
    check("centroid update partial agg", cuplan.count("HashAggregate") >= 2,
          "per-(cell, dim) sums must map-side combine — each task emits "
          "≤ K·DIM rows regardless of input size")
    sections.append(("sim_centroid_update", cuplan,
                     ["posexplode(×DIM) → one partial-agg shuffle with a "
                      "K_CELLS·DIM-row key space — the treeAggregate shape "
                      "of an MLlib k-means step"]))

    # --- kmeans iterate: K-row broadcast re-score, partial-max argmax -----
    kmq = QUERIES["sim_kmeans_iterate"](spark, SF)
    kmplan = fmt_plan(kmq)
    check("kmeans broadcast rescore",
          ("BroadcastNestedLoopJoin" in kmplan
           or "BroadcastHashJoin" in kmplan)
          and "SortMergeJoin" not in kmplan
          and "CartesianProduct" not in kmplan,
          "re-scoring must broadcast the K-row centroid table, never "
          "shuffle the vectors against it")
    check("kmeans partial argmax", "partial_max" in kmplan,
          "nearest-centroid argmax must be max(struct) — map-combinable, "
          "no per-vector rank window")
    sections.append(("sim_kmeans_iterate", kmplan,
                     ["centroid refit = one partial-agg shuffle (≤ K·DIM "
                      "rows); re-assign = K-row broadcast + partial_max "
                      "argmax — the gated Lloyd loop body"]))

    # --- throttle audit: two stacked partial aggs, no window, no join -----
    thq = QUERIES["ev_throttle_audit"](spark, SF)
    thplan = fmt_plan(thq)
    check("throttle audit agg-only",
          "Join" not in thplan and ") Window" not in thplan,
          "the per-user rollup must be stacked aggregates")
    check("throttle audit partial agg", thplan.count("HashAggregate") >= 4,
          "(user, minute) counts and the per-user rollup must both "
          "partial-combine map-side")
    sections.append(("ev_throttle_audit", thplan,
                     ["groupBy(user, minute) partial counts → per-user "
                      "rollup reusing the user prefix; no window, no join"]))

    # --- rolling actives: distinct-pairs explode, no sliding window -------
    raq = QUERIES["ev_rolling_active"](spark, SF)
    raplan = fmt_plan(raq)
    check("rolling active no window", ") Window" not in raplan,
          "sliding distinct must be the pairs-explode decomposition, not "
          "a range window (unbounded per-day sort)")
    check("rolling active pairs-first",
          raplan.count("HashAggregate") >= 4,
          "the (user, day) distinct must partial-agg BEFORE the 7× "
          "explode — shuffle volume is 7× the pairs, not 7× the events")
    sections.append(("ev_rolling_active", raplan,
                     ["distinct (user, day) partial-agg → ≤7 anchor rows "
                      "per pair → per-day countDistinct; no window"]))

    # --- IVF top-k: per-cell block matmul (FAISS shape), no cartesian -----
    ivq = QUERIES["sim_ivf_topk"](spark, SF)
    ivplan = fmt_plan(ivq)
    check("ivf topk block kernel", "FlatMapCoGroupsInPandas" in ivplan,
          "the probed-cell scan must be the cogrouped per-cell matmul — "
          "one Arrow crossing per (vector, cell), never a per-pair fold")
    check("ivf topk no cartesian", "CartesianProduct" not in ivplan,
          "candidates are confined to probed cells via the cogroup key")
    sections.append(("sim_ivf_topk", ivplan,
                     ["cogroup(queries-by-probed-cell, members-by-cell) → "
                      "block matmul partials (≤k rows per query·cell) → "
                      "global re-rank over ≤ nprobe·k rows per query"]))

    bq = QUERIES["sim_brute_topk"](spark, SF)
    bplan = fmt_plan(bq)
    check("brute matmul kernel", "MapInPandas" in bplan,
          "brute-force baseline ranks each query partition against the "
          "guarded corpus matrix in one Arrow matmul — no join in the plan")
    check("brute no join", "Join" not in bplan and "CartesianProduct" not in bplan,
          "the corpus sample is a broadcast numpy matrix, not a join side")
    sections.append(("sim_brute_topk", bplan,
                     ["mapInPandas matmul vs the id-sorted sample matrix: "
                      "exact O(n²) baseline, embarrassingly parallel, "
                      "guarded to sample size"]))

    # --- media dedup: digests shuffle, payloads never do ------------------
    mdq = QUERIES["mm_dedup_media"](spark, SF)
    mdplan = fmt_plan(mdq)
    check("media dedup digest-only shuffle",
          all("media#" not in x and "text#" not in x
              for x in exchange_inputs(mdplan)),
          "payload bytes must hash in the scan projection — only the "
          "64-char hex digest crosses the exchange")
    check("media dedup partial agg", mdplan.count("HashAggregate") >= 2,
          "count/min survivor pick must map-side combine")
    sections.append(("mm_dedup_media", mdplan,
                     ["sha2-256 computed pre-shuffle; the exchange carries "
                      "(digest, doc_id) — ~72 B/row at any object size"]))

    # --- media near-dup: banded equi-join, payload never shuffles ---------
    mnq = QUERIES["mm_near_dup"](spark, SF)
    mnplan = fmt_plan(mnq)
    check("media near-dup no cartesian", "CartesianProduct" not in mnplan,
          "perceptual candidates must come from an equi-join on the "
          "(band, bucket) sign-LSH keys")
    check("media near-dup payload never shuffles",
          all("media#" not in x and "body#" not in x and "text#" not in x
              for x in exchange_inputs(mnplan)),
          "the decode kernel reduces each object to an MM_FDIM feature "
          "vector in the scan stage — only ids/band keys/features cross "
          "an exchange, never payload bytes")
    sections.append(("mm_near_dup", mnplan,
                     ["codec kernel → banded sign-LSH equi-join → exact "
                      "integer-cosine verify on candidates; payload bytes "
                      "never reach an exchange"]))

    # --- distinct users: explicit two-stage, no Expand --------------------
    duq = QUERIES["ev_distinct_users"](spark, SF)
    duplan = fmt_plan(duq)
    check("distinct users no expand", ") Expand" not in duplan,
          "exact distinct must be the explicit pair-reduction, not an "
          "Expand doubling the scanned rows")
    check("distinct users stacked partial aggs",
          duplan.count("HashAggregate") >= 4,
          "(event_type, user_id) pairs and the per-type rollup must both "
          "partial-combine map-side")
    sections.append(("ev_distinct_users", duplan,
                     ["stage 1 shuffles on (event_type, user_id) — a hot "
                      "type spreads over all partitions; stage 2 rolls up "
                      "the bounded pair table"]))

    # --- length buckets: one scan, broadcast total, partial aggs ----------
    lbq = QUERIES["text_length_buckets"](spark, SF)
    lbplan = fmt_plan(lbq)
    check("length buckets single scan", lbplan.count("Scan parquet") <= 2,
          "the corpus total must come from the per-bucket aggregate, not "
          "a second scan (plan shows the scan once in tree + once in "
          "detail; a crossJoin-with-own-agg would re-scan)")
    check("length buckets joinless", "Join" not in lbplan,
          "the total rides a window over the ≤ ~40-row aggregate — no "
          "join, no second lineage")
    check("length buckets partial agg", lbplan.count("HashAggregate") >= 2,
          "bucket counts must map-side combine before the ≤ ~40-key "
          "exchange")
    sections.append(("text_length_buckets", lbplan,
                     ["≤ ~40 bucket keys → partial-agg collapses map-side; "
                      "the partition-less total window runs on the bounded "
                      "aggregate (≤ ~40 rows), never the corpus"]))

    # --- containment: equi-join candidates, never all-pairs ---------------
    cnq = QUERIES["dedup_containment"](spark, SF)
    cnplan = fmt_plan(cnq)
    check("containment no cartesian", "CartesianProduct" not in cnplan,
          "containment candidates must come from the df-capped shingle "
          "equi-join, never an all-pairs comparison")
    check("containment partial agg", cnplan.count("HashAggregate") >= 2,
          "pair intersections must map-side combine")
    sections.append(("dedup_containment", cnplan,
                     ["same candidate lattice as Jaccard (capped-shingle "
                      "equi-join); asymmetric verdicts via integer "
                      "cross-multiplication — no floats, no second join"]))

    # --- norm stats: codegen dot product, tiny partial agg, no Python ----
    nsq = QUERIES["sim_norm_stats"](spark, SF)
    nsplan = fmt_plan(nsq)
    check("norm stats pure JVM", "Python" not in nsplan,
          "the per-row dot product must run in codegen over the array "
          "column — no Python kernel for a norm")
    check("norm stats partial agg", nsplan.count("HashAggregate") >= 2,
          "bucket stats must map-side combine")
    sections.append(("sim_norm_stats", nsplan,
                     ["aggregate(zip_with) norm in codegen; ≤ a few "
                      "hundred bucket keys partial-agg map-side"]))

    # --- split assign: narrow hash projection + one small agg -------------
    saq = QUERIES["text_split_assign"](spark, SF)
    saplan = fmt_plan(saq)
    check("split assign joinless",
          "Join" not in saplan and ") Window" not in saplan,
          "split assignment is a per-row hash — any join/window would "
          "mean split state is stored instead of derived")
    check("split assign partial agg", saplan.count("HashAggregate") >= 2,
          "the (split, source) report must map-side combine")
    sections.append(("text_split_assign", saplan,
                     ["md5-cell projection in codegen; 3×|sources| key "
                      "space collapses map-side"]))

    # --- streaming dedup probe: ids-only band-key join, text never
    # shuffles (the foreachBatch fold's only corpus-sized work) ----------
    from pyspark.sql import functions as F

    from log_aggregator_spark.streaming.stream_dedup import batch_band_keys

    # narrow filter stands in for the micro-batch (a localCheckpointed
    # scan in production — no exchange either way; limit() would add a
    # whole-row single-partition shuffle that the real fold never has)
    sd_new = batch_band_keys(docs.where(F.col("doc_id") % 8 == 0))
    sd_idx = batch_band_keys(docs).select(
        F.col("doc_id").alias("c_doc"), "band", "key"
    )
    sd_probe = (
        sd_new.join(sd_idx, ["band", "key"])
        .select(F.col("doc_id").alias("doc_a"), F.col("c_doc").alias("doc_b"))
        .distinct()
    )
    sdplan = fmt_plan(sd_probe)
    check("stream-dedup probe equi-join", "CartesianProduct" not in sdplan,
          "the stored-index probe must be an equi-join on (band, key)")
    check("stream-dedup probe ids-only",
          all("text#" not in x for x in exchange_inputs(sdplan)),
          "document text must not cross ANY shuffle in the per-batch "
          "probe — band keys and ids only (the index table itself is "
          "append-only storage)")
    sections.append(("stream_dedup_probe", sdplan,
                     ["the streaming fold's corpus-sized join: batch band "
                      "keys vs the stored index, 24 B/row; cluster "
                      "maintenance after it is batch-sized CC + a "
                      "broadcast remap (asserted in tests/"
                      "test_dedup_scale.py::test_merge_clusters_remap_"
                      "is_broadcast)"]))

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("# Physical plan audit\n\n")
        f.write("Generated by `python scripts/audit_plans.py` — asserts the "
                "plan properties that matter at 100 TB, then records the "
                "plans for review.\n\n## Assertions\n\n")
        f.write("\n".join(checks) + "\n")
        for title, plan, notes in sections:
            f.write(f"\n## {title}\n\n")
            for n in notes:
                f.write(f"- {n}\n")
            f.write("\n```\n" + plan.strip()[:4000] + "\n```\n")
    print("PLANS.md written; all assertions passed")
    spark.stop()


if __name__ == "__main__":
    main()
