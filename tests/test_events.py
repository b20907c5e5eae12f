"""Edge semantics for the event-analytics operators that rely on window
total order (the oracle-parity test covers the bulk behaviour at sf0.01;
these pin the corner cases a hash compare can silently agree on only by
luck: strictness of the as-of frame, sentinel rows, retention gaps)."""
from __future__ import annotations

from datetime import datetime

from log_aggregator_spark.functions import events as fev


def _ev(spark, rows):
    """rows: (event_id, iso_ts, user_id, event_type, value)."""
    data = [
        (i, datetime.fromisoformat(ts), u, t, v, "{}")
        for i, ts, u, t, v in rows
    ]
    return spark.createDataFrame(
        data,
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )


def test_asof_enrich_strictly_prior_click_latest_wins(spark):
    ev = _ev(
        spark,
        [
            (1, "2024-01-01 10:00:00", 7, "click", 1.00),
            (2, "2024-01-01 10:05:00", 7, "click", 2.00),
            (3, "2024-01-01 10:10:00", 7, "error", 9.99),
            (4, "2024-01-01 10:20:00", 7, "error", 9.99),
        ],
    )
    got = {r["event_id"]: r for r in fev.asof_enrich(ev).collect()}
    # both errors see the LATEST prior click (id 2), not the first
    assert got[3]["click_value_x100"] == 200
    assert got[3]["lag_sec"] == 300
    assert got[4]["click_value_x100"] == 200
    assert got[4]["lag_sec"] == 900


def test_asof_enrich_no_prior_click_gets_sentinels(spark):
    ev = _ev(
        spark,
        [
            (1, "2024-01-01 10:00:00", 7, "error", 9.99),
            (2, "2024-01-01 10:05:00", 7, "click", 3.00),
            (3, "2024-01-01 10:06:00", 8, "view", 0.50),
            (4, "2024-01-01 10:07:00", 8, "error", 9.99),
        ],
    )
    got = {r["event_id"]: r for r in fev.asof_enrich(ev).collect()}
    # error before any click, and a user whose history has no click at all
    for eid in (1, 4):
        assert got[eid]["click_epoch"] == -1
        assert got[eid]["click_value_x100"] == -1
        assert got[eid]["lag_sec"] == -1


def test_asof_enrich_same_timestamp_is_strict_by_event_id(spark):
    """A click sharing the error's exact timestamp counts only when its
    event_id orders BEFORE the error — the (ts, event_id) total order."""
    ev = _ev(
        spark,
        [
            (5, "2024-01-01 10:00:00", 7, "click", 4.00),
            (6, "2024-01-01 10:00:00", 7, "error", 9.99),
            (8, "2024-01-01 11:00:00", 9, "error", 9.99),
            (9, "2024-01-01 11:00:00", 9, "click", 5.00),
        ],
    )
    got = {r["event_id"]: r for r in fev.asof_enrich(ev).collect()}
    assert got[6]["click_value_x100"] == 400 and got[6]["lag_sec"] == 0
    assert got[8]["click_value_x100"] == -1  # click id 9 orders after


def test_funnel_requires_steps_in_order(spark):
    ev = _ev(
        spark,
        [
            # user 1: view -> click -> error (full funnel)
            (1, "2024-01-01 10:00:00", 1, "view", 0.0),
            (2, "2024-01-01 10:01:00", 1, "click", 0.0),
            (3, "2024-01-01 10:02:00", 1, "error", 0.0),
            # user 2: click BEFORE view -> click must not count (step 2
            # unreached) even though a later error follows the view
            (4, "2024-01-01 10:00:00", 2, "click", 0.0),
            (5, "2024-01-01 10:01:00", 2, "view", 0.0),
            (6, "2024-01-01 10:02:00", 2, "error", 0.0),
            # user 3: view only
            (7, "2024-01-01 10:00:00", 3, "view", 0.0),
            # user 4: error only -> counts for nothing
            (8, "2024-01-01 10:00:00", 4, "error", 0.0),
        ],
    )
    got = {r["step_idx"]: r for r in fev.funnel_steps(ev).collect()}
    assert (got[1]["step"], got[1]["n_users"]) == ("view", 3)
    assert (got[2]["step"], got[2]["n_users"]) == ("click", 1)
    assert (got[3]["step"], got[3]["n_users"]) == ("error", 1)
    assert got[2]["permille_of_first"] == 333
    assert got[1]["permille_of_first"] == 1000


def test_funnel_empty_first_step_gives_sentinel_not_ansi_error(spark):
    """No step-1 events at all: n_0 = 0. Spark 4 is ANSI by default, so a
    plain division would THROW here — the op must emit the -1 sentinel."""
    ev = _ev(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0),
            (2, "2024-01-01 10:01:00", 1, "error", 0.0),
        ],
    )
    got = {r["step_idx"]: r for r in fev.funnel_steps(ev).collect()}
    assert all(r["permille_of_first"] == -1 for r in got.values())
    assert got[1]["n_users"] == 0


def test_funnel_click_after_view_then_error_before_click(spark):
    """view -> error -> click: step 3 unreached (no error AFTER click)."""
    ev = _ev(
        spark,
        [
            (1, "2024-01-01 10:00:00", 9, "view", 0.0),
            (2, "2024-01-01 10:01:00", 9, "error", 0.0),
            (3, "2024-01-01 10:02:00", 9, "click", 0.0),
        ],
    )
    got = {r["step_idx"]: r["n_users"] for r in fev.funnel_steps(ev).collect()}
    assert got == {1: 1, 2: 1, 3: 0}


def test_profile_columns_nulls_distincts_minmax(spark):
    rows = [
        (1, datetime.fromisoformat("2024-01-01 10:00:00"), 7, "click", 1.5, '{"k": 1}'),
        (2, datetime.fromisoformat("2024-01-01 10:01:00"), 7, "view", None, '{"k": 1}'),
        (3, datetime.fromisoformat("2024-01-01 10:02:00"), 8, None, 2.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    got = {r["col"]: r for r in fev.profile_columns(ev).collect()}
    assert got["event_type"]["n_rows"] == 3  # count(*) includes nulls
    assert got["event_type"]["n_nulls"] == 1
    assert got["event_type"]["n_distinct"] == 2  # nulls excluded
    assert got["value"]["n_nulls"] == 1
    # canonical doubles: round(x*100) as string; min is lexicographic on
    # the canonical form ("150" < "200")
    assert (got["value"]["min_val"], got["value"]["max_val"]) == ("150", "200")
    assert got["props"]["n_distinct"] == 1
    assert got["user_id"]["n_distinct"] == 2


def test_retention_gap_breaks_streak_and_permille(spark):
    d1, d2, d3 = "2024-01-01", "2024-01-02", "2024-01-03"
    rows, eid = [], 0
    # user 1: active d1,d2 (retained on d1); user 2: d1,d3 (gap — NOT
    # retained on d1); user 3: d1 only; user 4: d2,d3
    for u, days in [(1, (d1, d2)), (2, (d1, d3)), (3, (d1,)), (4, (d2, d3))]:
        for d in days:
            rows.append((eid, f"{d} 12:00:00", u, "view", 1.0))
            rows.append((eid + 1, f"{d} 13:00:00", u, "view", 1.0))  # dup day
            eid += 2
    got = {r["day_epoch"]: r for r in fev.retention(_ev(spark, rows)).collect()}
    e1 = int(datetime.fromisoformat(f"{d1} 00:00:00").timestamp())
    assert got[e1]["n_active"] == 3 and got[e1]["n_retained"] == 1
    assert got[e1]["retained_permille"] == 333
    e2 = e1 + 86400
    assert got[e2]["n_active"] == 2 and got[e2]["n_retained"] == 1
    e3 = e2 + 86400
    assert got[e3]["n_active"] == 2 and got[e3]["n_retained"] == 0


def test_distinct_users_exact_counts(spark):
    ev = _ev(
        spark,
        [
            (1, "2024-01-01 10:00:00", 7, "click", 1.0),
            (2, "2024-01-01 10:01:00", 7, "click", 1.0),
            (3, "2024-01-01 10:02:00", 8, "click", 1.0),
            (4, "2024-01-01 10:03:00", 9, "view", 1.0),
        ],
    )
    got = {r["event_type"]: r for r in fev.distinct_users(ev).collect()}
    assert got["click"]["n_users"] == 2 and got["click"]["n_events"] == 3
    assert got["view"]["n_users"] == 1 and got["view"]["n_events"] == 1


def test_hll_distinct_within_tolerance_and_deterministic(spark):
    ev = _ev(
        spark,
        [
            (i, "2024-01-01 10:00:00", i % 37, "click", 1.0)
            for i in range(200)
        ],
    )
    a = fev.hll_distinct(ev).collect()
    b = fev.hll_distinct(ev).collect()
    assert a == b  # HLL++ registers are hash-deterministic
    (row,) = a
    assert row["n_users_exact"] == 37
    assert row["hll_within_tol"] == 1


def test_event_transitions_follow_timeline_order(spark):
    ev = _ev(
        spark,
        [
            (1, "2024-01-01 10:00:00", 7, "view", 1.0),
            (2, "2024-01-01 10:01:00", 7, "click", 1.0),
            (3, "2024-01-01 10:02:00", 7, "click", 1.0),
            (4, "2024-01-01 10:00:30", 8, "view", 1.0),  # other user: no cross-talk
        ],
    )
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in fev.event_transitions(ev).collect()
    }
    assert got == {("view", "click"): 1, ("click", "click"): 1}


def test_event_transitions_tie_break_on_event_id(spark):
    # same timestamp: event_id orders the pair deterministically
    ev = _ev(
        spark,
        [
            (5, "2024-01-01 10:00:00", 9, "signup", 1.0),
            (6, "2024-01-01 10:00:00", 9, "purchase", 1.0),
        ],
    )
    (r,) = fev.event_transitions(ev).collect()
    assert (r["from_type"], r["to_type"]) == ("signup", "purchase")
