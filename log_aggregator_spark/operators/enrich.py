"""Broadcast hash-join enrich — source → (sink, priority) lookup.

The reference has no joins; its implicit routing is name concatenation, one
output file per id (``/root/reference/datadecoder/.../DataPumpDecoderSort.java:93-97``).
The north star makes the lookup explicit: a small routes dimension joined to
every row. The routes table is tiny (one row per source) so the join MUST be a
``BroadcastHashJoin`` — at 10^12 rows a shuffle join on `source` would move the
entire fact table for nothing. ``F.broadcast`` forces it regardless of stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(rows: DataFrame, routes: DataFrame) -> DataFrame:
    """rows must carry ``source``; adds ``sink`` and ``priority``.

    Inner join: a row whose source has no route is dropped (reference analog:
    a chunk for an unknown log id would have no output file — cannot happen in
    practice since routes are derived from sources, but inner keeps the
    semantics honest)."""
    return rows.join(F.broadcast(routes), "source", "inner")
