"""The driver json-parses only the LAST 2000 chars of bench.py stdout
(round 2 lost its per-query record when the line outgrew that window).
Guard: the full-detail compact line for the CURRENT query suite must fit
with margin, so adding queries fails here before it fails in the driver.
"""
from __future__ import annotations

import json

from log_aggregator_spark.entry_queries import QUERIES


def test_compact_line_fits_driver_window():
    # worst-case realistic timings via bench.py's own compactor: every
    # query at 10-99 s renders as whole seconds ("12", 2 chars); sub-10 s
    # values keep 0.1 s resolution; a pathological suite beyond this is
    # absorbed by the top-40+_other_sum fallback, which degrades the
    # record gracefully instead of overflowing the window
    from bench import _compact_t

    # the compactor's widest rendering is 3 chars ("9.9"): model every
    # query at that width, and pin the rounding edge that could emit a
    # 4-char float ("10.0")
    assert json.dumps(_compact_t(9.94)) == "9.9"
    assert json.dumps(_compact_t(9.97)) == "10"
    assert json.dumps(_compact_t(12.3)) == "12"
    queries = {name: _compact_t(9.94) for name in QUERIES}
    queries["pipeline_e2e"] = _compact_t(9.94)
    compact = {
        "metric": "pipeline_e2e_sec",
        "value": 123.456,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "seq_per_sec": 123456.7,
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= 1950, (
        f"compact bench line is {len(line)} chars with {len(queries)} "
        "queries — trim keys or accept the headline-only fallback"
    )
