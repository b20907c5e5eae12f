"""DuckDB oracle SQL for the driver's correctness gate.

Every query in ``__spark_entry__.queries()`` has a DuckDB twin here, built on
one shared CTE prelude that re-derives the chunk table + decoder-gate
semantics with engine-portable constructs only (integer arithmetic, regexp,
list functions — both engines produce bit-identical values). The prelude is
the SQL statement of the same spec as ``chunker.py`` +
``operators/reassemble.py``; spec constants are interpolated from ``spec.py``
so the two cannot drift apart silently.

Portability rules used throughout this repo's oracles:
* token arrays → CSV strings (``concat_ws`` / ``array_to_string``) so the
  driver's value-hash sees identical scalars;
* every integer aggregate CAST to BIGINT (DuckDB sums to HUGEINT);
* no floats in compared columns unless integerized (×1000, floor);
* no engine hash functions except md5 (hex string, identical everywhere).
"""

from __future__ import annotations

from . import spec

C = spec.CHUNK
SB = spec.SESSION_BASE
SS = spec.SESSION_STEP

_ENV_RE = r"(.*)_(\d+)_(\d+)\.pbData"

# ---------------------------------------------------------------- prelude
# Mirrors chunker.chunks(perturb=True) + checkpoint_table + routes_table +
# operators.reassemble (gate flags) + enrich.
PRELUDE = f"""
WITH seqs AS (
  SELECT printf('doc%08d', doc_id) AS doc_id,
         doc_id AS dnum,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
         source
  FROM documents
),
halved AS (
  SELECT *,
         CASE WHEN dnum % {spec.MOD_MULTISESSION} = 0 AND n_chunks >= 2
              THEN CAST(ceil(n_chunks / 2.0) AS BIGINT) ELSE n_chunks END AS half
  FROM (SELECT *, CAST(ceil(n_tok / {C}.0) AS BIGINT) AS n_chunks FROM seqs)
),
keyed AS (
  SELECT doc_id, dnum, source,
         CAST({SB} + CASE WHEN k <= half THEN 0 ELSE {SS} END AS BIGINT) AS session,
         CAST(CASE WHEN k <= half THEN k ELSE k - half END AS BIGINT) AS seq,
         list_filter(range(1, n_tok + 1), t -> t > (k-1)*{C} AND t <= k*{C}) AS chunk_tokens
  FROM (SELECT *, unnest(range(1, n_chunks + 1)) AS k FROM halved)
),
chunks AS (
  SELECT printf('%s_%d_%d.pbData', doc_id, session, seq) AS envelope,
         chunk_tokens, source
  FROM (
    SELECT * FROM keyed
    UNION ALL
    SELECT * FROM keyed
    WHERE dnum % {spec.MOD_DUP} = 0 AND session = {SB} AND seq = 2
  ) u
  WHERE NOT (session = {SB} AND dnum % {spec.MOD_GAP} = 0 AND seq = 3)
    AND NOT (session = {SB} AND dnum % {spec.MOD_LOST_PREFIX} = 0 AND seq <= 2)
),
parsed AS (
  SELECT regexp_extract(envelope, '{_ENV_RE}', 1) AS doc_id,
         CAST(regexp_extract(envelope, '{_ENV_RE}', 2) AS BIGINT) AS session,
         CAST(regexp_extract(envelope, '{_ENV_RE}', 3) AS BIGINT) AS seq,
         chunk_tokens, source
  FROM chunks
),
ckpt AS (
  SELECT doc_id, CAST({SB} AS BIGINT) AS session, CAST(1 AS BIGINT) AS last_seq
  FROM seqs WHERE dnum % {spec.MOD_CKPT} = 0
),
dedup AS (
  SELECT DISTINCT doc_id, session, seq, chunk_tokens, source FROM parsed
),
live AS (
  SELECT d.*, coalesce(c.last_seq, 0) AS last_seq
  FROM dedup d LEFT JOIN ckpt c USING (doc_id, session)
),
pos AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id, session ORDER BY seq) AS rn,
         min(seq) OVER (PARTITION BY doc_id, session) AS first_seq
  FROM live
  WHERE seq > greatest(last_seq, 0)
),
flagged AS (
  SELECT doc_id, session, seq, chunk_tokens, source,
         (seq - rn = first_seq - 1 AND (last_seq = 0 OR first_seq = last_seq + 1)) AS accepted
  FROM pos
  UNION ALL
  SELECT doc_id, session, seq, chunk_tokens, source, TRUE AS accepted
  FROM live WHERE seq = 0 AND last_seq = 0
),
reassembled AS (
  SELECT doc_id, session,
         flatten(list(chunk_tokens ORDER BY seq)) AS tokens,
         CAST(sum(len(chunk_tokens)) AS BIGINT) AS n_tok,
         min(source) AS source,
         CAST(greatest(max(seq), 0) AS BIGINT) AS last_seq_out
  FROM flagged WHERE accepted
  GROUP BY doc_id, session
),
routes AS (
  SELECT DISTINCT source,
         'sink' || CAST(CAST(substr(source, 4, 10) AS INTEGER) % {spec.N_SINKS} AS VARCHAR) AS sink,
         CAST(CAST(substr(source, 4, 10) AS INTEGER) % {spec.N_PRIORITIES} AS BIGINT) AS priority
  FROM documents
),
enriched AS (
  SELECT r.doc_id, r.session, r.tokens, r.n_tok, r.source, t.sink, t.priority
  FROM reassembled r JOIN routes t USING (source)
)
"""

# ---------------------------------------------------------------- queries
PIPELINE_SQL: dict[str, str] = {
    "pipeline_parse": PRELUDE
    + """
SELECT doc_id, session, seq,
       array_to_string(chunk_tokens, ',') AS chunk_csv,
       CAST(len(chunk_tokens) AS BIGINT) AS n_chunk_tok,
       source
FROM parsed
""",
    "pipeline_reassemble": PRELUDE
    + """
SELECT doc_id, session, array_to_string(tokens, ',') AS tokens_csv,
       n_tok, source, last_seq_out
FROM reassembled
""",
    "pipeline_enriched": PRELUDE
    + """
SELECT doc_id, session, array_to_string(tokens, ',') AS tokens_csv,
       n_tok, source, sink, priority
FROM enriched
""",
    "pipeline_sink_counts": PRELUDE
    + """
SELECT sink, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_tok) AS BIGINT) AS sum_n_tok,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM enriched GROUP BY sink
""",
    "pipeline_source_counts": PRELUDE
    + """
SELECT source, sink, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_tok) AS BIGINT) AS sum_n_tok
FROM enriched GROUP BY source, sink
""",
    "pipeline_held_back": PRELUDE
    + """
SELECT doc_id, session, seq FROM flagged WHERE NOT accepted
""",
    "pipeline_checkpoint_out": PRELUDE
    + """
SELECT doc_id, session, last_seq_out AS last_seq FROM reassembled
""",
}
