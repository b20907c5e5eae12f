"""Boundary semantics of the bucketed interval join
(events.session_error_impact): intervals that span multiple hour buckets
must count each overlapping error exactly once, pad edges are inclusive,
and zero-overlap sessions survive with n_errors = 0."""

from __future__ import annotations

from datetime import datetime

from log_aggregator_spark.functions.events import session_error_impact


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime(2024, 1, 1, h, m, s), uid, et, 1.0, "{}")
            for i, (h, m, s, uid, et) in enumerate(rows)
        ],
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )


def _result(df):
    return {
        (r["user_id"], r["session_start_epoch"]): r["n_errors"]
        for r in df.collect()
    }


def test_interval_spans_buckets_counts_once(spark):
    # user 1's session runs 00:50 → 01:10 (+15 min pad → 00:35 → 01:25),
    # crossing the hour-bucket boundary; both errors fall inside and each
    # is counted exactly once even though the interval explodes to two
    # bucket rows
    ev = _events(
        spark,
        [
            (0, 50, 0, 1, "view"),
            (1, 10, 0, 1, "click"),
            (0, 55, 0, 9, "error"),   # bucket 0, inside
            (1, 5, 0, 9, "error"),    # bucket 1, inside
            (3, 0, 0, 9, "error"),    # far outside
        ],
    )
    res = _result(session_error_impact(ev))
    start = int(datetime(2024, 1, 1, 0, 50).timestamp())
    assert res[(1, start)] == 2


def test_pad_edges_inclusive(spark):
    # session is the single event at 02:00:00; pad ±900 s → [01:45, 02:15]
    # exactly; errors at both edges count, one second beyond does not
    ev = _events(
        spark,
        [
            (2, 0, 0, 1, "view"),
            (1, 45, 0, 9, "error"),   # == lo
            (2, 15, 0, 9, "error"),   # == hi
            (1, 44, 59, 9, "error"),  # lo - 1s
            (2, 15, 1, 9, "error"),   # hi + 1s
        ],
    )
    res = session_error_impact(ev)
    start = int(datetime(2024, 1, 1, 2, 0).timestamp())
    got = _result(res)
    assert got[(1, start)] == 2


def test_zero_overlap_session_kept(spark):
    ev = _events(
        spark,
        [
            (0, 0, 0, 1, "view"),
            (12, 0, 0, 2, "view"),  # user 2's session, no errors anywhere
        ],
    )
    got = _result(session_error_impact(ev))
    assert got[(2, int(datetime(2024, 1, 1, 12, 0).timestamp()))] == 0
    assert all(v == 0 for v in got.values())
