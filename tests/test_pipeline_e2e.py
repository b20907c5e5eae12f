"""E2E golden test (logCheck analog, SURVEY.md §5.2 item 4): derive chunks
from the shared documents parquet (with all perturbations), run the full
pipeline, and check per-stream token-array equality + per-sink counts against
the pure-pandas oracle.

Counter invariant: tokens are [1..n], so for an unperturbed stream
max(token) == n_tok — exactly the reference's `wc -l == last counter` check
(/root/reference/src/test/logCheck:6-14).
"""

from __future__ import annotations

import pandas as pd
import pytest

from log_aggregator_spark import chunker, spec
from log_aggregator_spark.operators.parse import parse_envelope
from log_aggregator_spark.oracle_pandas import reassemble_oracle
from log_aggregator_spark.plans.pipeline import run_pipeline

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return chunker.load_documents(spark, SF_DIR).cache()


@pytest.fixture(scope="module")
def oracle_frames(spark, docs):
    """Pandas-side chunks + checkpoint, derived via the Spark chunker (the
    chunker itself is validated structurally in test_chunker.py), then pushed
    through the independent pandas oracle."""
    chunks_pdf = parse_envelope(chunker.chunks(docs)).toPandas()
    ckpt_pdf = chunker.checkpoint_table(docs).toPandas()
    oracle = reassemble_oracle(chunks_pdf, ckpt_pdf)
    return chunks_pdf, ckpt_pdf, oracle


@pytest.mark.parametrize("strategy", ["pandas", "sql", "agg"])
def test_pipeline_matches_oracle(spark, docs, oracle_frames, strategy):
    _, _, oracle = oracle_frames
    res = run_pipeline(
        chunker.chunks(docs),
        chunker.routes_table(docs),
        chunker.checkpoint_table(docs),
        strategy=strategy,
    )
    got = res.reassembled.toPandas()
    got["tokens"] = got["tokens"].apply(lambda a: [int(x) for x in a])

    key = ["doc_id", "session"]
    got = got.sort_values(key).reset_index(drop=True)
    want = oracle.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["doc_id", "session", "tokens", "n_tok", "last_seq_out"]],
        want[["doc_id", "session", "tokens", "n_tok", "last_seq_out"]].astype(
            {"session": "int64", "n_tok": "int64", "last_seq_out": "int64"}
        ),
    )


def test_sink_counts_match_oracle(spark, docs, oracle_frames):
    _, _, oracle = oracle_frames
    res = run_pipeline(
        chunker.chunks(docs),
        chunker.routes_table(docs),
        chunker.checkpoint_table(docs),
    )
    got = res.counts.toPandas().set_index("sink").sort_index()

    routes = chunker.routes_table(docs).toPandas()
    want = (
        oracle.merge(routes, on="source")
        .groupby("sink")
        .agg(n_rows=("doc_id", "size"), sum_n_tok=("n_tok", "sum"), n_docs=("doc_id", "nunique"))
        .sort_index()
    )
    assert (got["n_rows"] == want["n_rows"]).all()
    assert (got["sum_n_tok"] == want["sum_n_tok"]).all()
    assert (got["n_docs"] == want["n_docs"]).all()
    # every sink present
    assert set(got.index) == {f"sink{i}" for i in range(spec.N_SINKS)}


def test_counter_invariant_unperturbed(spark, docs):
    """Docs untouched by any perturbation: single session, no gaps — the
    reassembled stream must be exactly [1..n_tok] (logCheck analog)."""
    res = run_pipeline(chunker.chunks(docs), chunker.routes_table(docs),
                       chunker.checkpoint_table(docs))
    got = res.reassembled.toPandas()
    seqs = chunker.sequences(docs).toPandas().set_index("doc_id")
    clean = seqs[
        (seqs.dnum % spec.MOD_MULTISESSION != 0)
        & (seqs.dnum % spec.MOD_DUP != 0)
        & (seqs.dnum % spec.MOD_CKPT != 0)
        & (seqs.dnum % spec.MOD_GAP != 0)
        & (seqs.dnum % spec.MOD_LOST_PREFIX != 0)
    ]
    assert len(clean) > 0
    got_clean = got[got.doc_id.isin(clean.index)]
    assert len(got_clean) == len(clean)
    for r in got_clean.itertuples(index=False):
        n = clean.loc[r.doc_id, "n_tok"]
        toks = [int(x) for x in r.tokens]
        assert toks == list(range(1, n + 1))
        assert toks[-1] == len(toks)  # wc -l == last counter


def test_gap_docs_hold_suffix(spark, docs, oracle_frames):
    """GAP docs (not multisession, not lost-prefix, no checkpoint): output is
    tokens of seqs 1..2 only; seq ≥ 4 held back."""
    chunks_pdf, _, _ = oracle_frames
    res = run_pipeline(chunker.chunks(docs), chunker.routes_table(docs),
                       chunker.checkpoint_table(docs))
    held = res.held.toPandas()
    seqs = chunker.sequences(docs).toPandas()
    pure_gap = seqs[
        (seqs.dnum % spec.MOD_GAP == 0)
        & (seqs.dnum % spec.MOD_MULTISESSION != 0)
        & (seqs.dnum % spec.MOD_CKPT != 0)
        & (seqs.dnum % spec.MOD_LOST_PREFIX != 0)
        & (seqs.n_tok > 3 * spec.CHUNK)  # has a seq-4 chunk to hold
    ]
    assert len(pure_gap) > 0
    for doc in pure_gap.doc_id:
        h = held[held.doc_id == doc]
        n_chunks = spec.expected_chunk_count(int(pure_gap.set_index("doc_id").loc[doc, "n_tok"]))
        assert sorted(h.seq) == list(range(4, n_chunks + 1))


def test_resume_second_run_emits_suffix(spark, docs):
    """Resume (SequenceTracker analog, SURVEY.md §5.2 item 5): run 1 on the
    perturbed chunks, then run 2 on the complete chunk set with run 1's
    checkpoint state. Run 2's output must equal a two-run pandas-oracle chain
    exactly — gap-filling emits held suffixes exactly once, streams whose
    init rule skipped a lost prefix stay skipped (last_seq > gap)."""
    all_chunks = chunker.chunks(docs, perturb=False)
    run1_chunks = chunker.chunks(docs)  # with dup/gap/lost-prefix
    routes = chunker.routes_table(docs)
    ckpt0 = chunker.checkpoint_table(docs)
    run1 = run_pipeline(run1_chunks, routes, ckpt0)

    # next-run checkpoint = run-1 output state ∪ old entries for blocked streams
    ckpt1 = (
        ckpt0.join(run1.checkpoint_out, ["doc_id", "session"], "left_anti")
        .unionByName(run1.checkpoint_out)
    )
    run2 = run_pipeline(all_chunks, routes, ckpt1)
    out2 = run2.reassembled.toPandas()
    out2["tokens"] = out2["tokens"].apply(lambda a: [int(x) for x in a])
    assert len(out2) > 0  # gap/blocked streams emit on run 2

    # independent oracle chain
    run1_pdf = parse_envelope(run1_chunks).toPandas()
    all_pdf = parse_envelope(all_chunks).toPandas()
    ckpt0_pdf = ckpt0.toPandas()
    o1 = reassemble_oracle(run1_pdf, ckpt0_pdf)
    o_ckpt1 = pd.concat(
        [
            o1[["doc_id", "session", "last_seq_out"]].rename(
                columns={"last_seq_out": "last_seq"}
            ),
            ckpt0_pdf.merge(
                o1[["doc_id", "session"]], on=["doc_id", "session"], how="left",
                indicator=True,
            ).query("_merge == 'left_only'")[["doc_id", "session", "last_seq"]],
        ]
    )
    o2 = reassemble_oracle(all_pdf, o_ckpt1)

    key = ["doc_id", "session"]
    got = out2.sort_values(key).reset_index(drop=True)
    want = o2.sort_values(key).reset_index(drop=True).astype(
        {"session": "int64", "n_tok": "int64", "last_seq_out": "int64"}
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["doc_id", "session", "tokens", "n_tok", "last_seq_out"]],
        want[["doc_id", "session", "tokens", "n_tok", "last_seq_out"]],
    )


def test_split_rejects_both_variants_agree(spark):
    """Dead-letter split: the Arrow-RE2 and JVM-regexp variants must make
    identical accept/reject decisions, legit chunks never reject, corrupt
    envelopes never leak into the ok stream."""
    from pyspark.sql import functions as F

    from log_aggregator_spark.operators.parse import split_rejects

    docs = chunker.load_documents(spark, SF_DIR).limit(20)
    chunks = chunker.chunks(docs)
    corrupt = spark.createDataFrame(
        [("garbage-1", [0], "srcX"), ("doc_1_nosuffix", [1], "srcY"),
         ("a_2_3.pbData.bak", [2], "srcZ")],
        schema="envelope string, chunk_tokens array<int>, source string",
    )
    # valid envelope whose doc_id group legitimately matches EMPTY — both
    # variants must accept it (the JVM path once keyed non-match detection
    # on the doc_id group and rejected this shape; ADVICE r2)
    empty_doc = spark.createDataFrame(
        [("_3_7.pbData", [9], "srcE")],
        schema="envelope string, chunk_tokens array<int>, source string",
    )
    unioned = chunks.unionByName(corrupt).unionByName(empty_doc)
    n_chunks = chunks.count()
    for jvm in (False, True):
        ok, rejects = split_rejects(unioned, jvm=jvm)
        assert ok.count() == n_chunks + 1
        assert ok.where(F.col("doc_id") == "").count() == 1
        got = sorted(r["envelope"] for r in rejects.collect())
        assert got == ["a_2_3.pbData.bak", "doc_1_nosuffix", "garbage-1"]
