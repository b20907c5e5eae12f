"""The end-to-end batch DAG — the Spark restatement of the reference's three
processes (SURVEY.md §3.4):

    chunks → parse(envelope) → [dedupe+gate+reassemble] → enrich(broadcast)
           → per-sink fan-out → sink aggregates (+ new checkpoint state)

Shuffle inventory (the thing that matters at 10^12 rows):
  1. ONE wide shuffle on (doc_id, session) for reassembly — irreducible: the
     operator is a per-stream total order.
  2. The enrich join is broadcast — no shuffle.
  3. sink_counts is a partial-agg hash aggregate — shuffles one row per
     (task × sink).
  4. The fan-out write adds one salted repartition, only when writing.
Everything before the reassembly shuffle (parse, projections) is narrow and
pipelined into the shuffle-map stage; Catalyst prunes chunk columns read from
parquet down to (envelope, chunk_tokens, source).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators.aggregate import sink_counts
from ..operators.enrich import enrich
from ..operators.parse import split_rejects
from ..operators.reassemble import held_back, reassemble, reassemble_agg, reassemble_sql
from ..operators.route import route_write


@dataclass
class PipelineResult:
    reassembled: DataFrame  # (doc_id, session, tokens, n_tok, source, last_seq_out)
    enriched: DataFrame     # + (sink, priority)
    counts: DataFrame       # per-sink aggregates
    checkpoint_out: DataFrame  # (doc_id, session, last_seq) for the next run
    held: DataFrame         # chunks not consumed this run
    rejects: DataFrame      # dead-letter: envelopes that failed the parse


def run_pipeline(
    chunks: DataFrame,
    routes: DataFrame,
    checkpoint: DataFrame | None = None,
    strategy: str = "sql",
    out_dir: str | None = None,
) -> PipelineResult:
    """strategy: 'sql' (pure built-in window/agg plan, default) or 'pandas'
    (applyInPandas kernel) — identical semantics, see reassemble.py.

    Malformed envelopes go to ``result.rejects`` (dead-letter), never into
    the gate: a null doc_id/seq row would silently evaluate false in the
    gate predicates and vanish — at 100 TB, silent drop of corrupt input is
    the one failure mode a pipeline cannot have."""
    parsed, rejects = split_rejects(chunks)
    if strategy == "pandas":
        reassembled = reassemble(parsed, checkpoint)
    elif strategy == "sql":
        reassembled = reassemble_sql(parsed, checkpoint)
    elif strategy == "agg":
        reassembled = reassemble_agg(parsed, checkpoint)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    enriched = enrich(reassembled, routes)
    counts = sink_counts(enriched)
    ckpt_out = reassembled.selectExpr(
        "doc_id", "session", "last_seq_out as last_seq"
    )
    held = held_back(parsed, checkpoint)

    if out_dir is not None:
        route_write(enriched, out_dir)

    return PipelineResult(
        reassembled=reassembled,
        enriched=enriched,
        counts=counts,
        checkpoint_out=ckpt_out,
        held=held,
        rejects=rejects,
    )
