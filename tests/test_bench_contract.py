"""The driver json-parses only the LAST 2000 chars of bench.py stdout
(round 2 lost its per-query record when the line outgrew that window).
Guard: the full-detail compact line for the CURRENT query suite must fit
with margin, so adding queries fails here before it fails in the driver.
"""
from __future__ import annotations

import json

from log_aggregator_spark.entry_queries import QUERIES


def test_compact_line_fits_driver_window():
    # worst-case realistic timings: every query at 100+ seconds, rounded
    # to the 0.1 s resolution bench.py prints (5 chars each)
    queries = {name: 123.5 for name in QUERIES}
    queries["pipeline_e2e"] = 123.5
    compact = {
        "metric": "pipeline_e2e_sec",
        "value": 123.456,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "streams": 599895,
        "seq_per_sec": 123456.7,
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= 1950, (
        f"compact bench line is {len(line)} chars with {len(queries)} "
        "queries — trim keys or accept the headline-only fallback"
    )
