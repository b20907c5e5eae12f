"""Telemetry analytics over the ``events`` table
(event_id, ts timestamp, user_id, event_type, value double, props json-str).

The reference's only aggregate is a running chunk count
(``/root/reference/server/.../LogServerController.java:156-188``); this
family is the log/telemetry analytics surface a from-scratch pipeline owes
its users (north rule: "log/telemetry parse → enrich → route → aggregate"):
event-time tumbling windows, gap-based sessionization, top-k, conditional
rates, and regex field extraction from semi-structured props.

All plain built-ins (whole-stage codegen): tumbling windows are
``date_trunc`` groupBys (shuffle on (window, type) — partial-agg, tiny
output), sessionization is one window pass per user (shuffle on user_id —
the reference's per-key single-writer discipline again), top-k is a partial
TakeOrdered. Every query carries its DuckDB twin (oracle_sql.EVENTS_SQL);
floats are integerized (floor ×100/×1000), timestamps compared as epoch
seconds.

Streaming note: the tumbling/session shapes map 1:1 onto
``F.window``/``F.session_window`` with watermarks under readStream; batch
form kept here for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SEC = 1800  # 30 min inactivity starts a new session
TOPK_USERS = 10


def _events(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Per (hour, event_type): events, distinct users, floor(100*sum(value)).
    (hour_epoch, event_type, n_events, n_users, sum_value_x100)."""
    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            # round, not floor: values have 2 decimals, so the true ×100 sum
            # is an integer — round absorbs the engines' different double
            # summation orders (floor flips on the ±1ulp boundary)
            F.round(F.sum("value") * 100, 0).cast("long").alias("sum_value_x100"),
        )
    )


def sessionize(events: DataFrame) -> DataFrame:
    """Gap-based sessions per user (new session when >30 min idle).
    (user_id, session_idx, n_events, start_epoch, end_epoch)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet yields TIMESTAMP_NTZ; route through TIMESTAMP (session tz is
    # UTC) to get fractional epoch seconds — matches DuckDB's epoch(ts)
    sec = F.col("ts").cast("timestamp").cast("double")
    new_sess = (
        (sec - F.lag(sec).over(w)).isNull()
        | ((sec - F.lag(sec).over(w)) > SESSION_GAP_SEC)
    ).cast("long")
    with_idx = events.withColumn(
        "session_idx", F.sum(new_sess).over(w).cast("long")
    )
    return with_idx.groupBy("user_id", "session_idx").agg(
        F.count("*").cast("long").alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("start_epoch"),
        F.unix_timestamp(F.max("ts")).alias("end_epoch"),
    )


def topk_users(events: DataFrame, k: int = TOPK_USERS) -> DataFrame:
    """Top-k users by total value; deterministic tie-break on user_id.
    (rank, user_id, n_events, total_value_x100).

    Physical shape: ``orderBy(...).limit(k)`` plans TakeOrderedAndProject —
    each partition keeps its own top-k and the driver merges k·p rows — so
    at 10^9 users no partition ever holds the full totals table (the global
    ``Window.orderBy`` alternative moves ALL rows to one task). The rank
    column is then assigned over the k-row result, where a single-partition
    window costs exactly k rows."""
    totals = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value") * 100, 0).cast("long").alias("total_value_x100"),
    )
    top = totals.orderBy(F.desc("total_value_x100"), F.col("user_id")).limit(k)
    w = Window.orderBy(F.desc("total_value_x100"), F.col("user_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "user_id",
        "n_events",
        "total_value_x100",
    )


def error_rate(events: DataFrame) -> DataFrame:
    """Per hour: error events per 1000 events.
    (hour_epoch, n_events, n_errors, error_permille)."""
    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long"))
            .cast("long")
            .alias("n_errors"),
        )
        .withColumn(
            "error_permille",
            F.floor(F.col("n_errors") * 1000 / F.col("n_events")).cast("long"),
        )
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact p50/p95 of value per event_type — the latency-percentile
    query of a telemetry pipeline. Values are integerized (×100) BEFORE
    the percentile so both engines interpolate over exact integers (linear
    interpolation on the same (n-1)·p rank formula); results ×10 so the
    midpoint .5 cases stay exact.
    (event_type, n_events, p50_x1000, p95_x1000).

    Scale: percentile is an exact aggregate over the per-type group — one
    shuffle on event_type (tiny cardinality), each group sorted within its
    task; for extreme-cardinality groups a production pipeline would swap
    approx_percentile (t-digest, map-combinable) at the cost of leaving
    the oracle gate."""
    v100 = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.select("event_type", v100.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.floor(F.percentile("v", F.lit(0.5)) * 10).cast("long").alias("p50_x1000"),
            F.floor(F.percentile("v", F.lit(0.95)) * 10).cast("long").alias("p95_x1000"),
        )
    )


def value_percentiles_approx(events: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """p50/p95 per event_type via ``approx_percentile`` (Greenwald-Khanna
    sketch) — the 100 TB path ``value_percentiles``' docstring promises:
    the sketch is MAP-COMBINABLE (partial aggregation before the shuffle),
    so an extreme-cardinality event type never funnels its values through
    one task's sort; rank error is bounded by 1/accuracy.

    Gate trick: for groups smaller than ``accuracy`` the sketch retains
    every value and returns the EXACT discrete percentile (the smallest
    element with cumulative rank ≥ ⌈p·n⌉ — verified to match DuckDB's
    ``quantile_disc`` convention on odd/even/singleton groups), so the
    oracle compares hash-exact at test scale while the SAME code degrades
    gracefully to bounded-error at production scale.
    (event_type, n_events, p50_x100, p95_x100)."""
    v100 = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.select("event_type", v100.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.expr(
                f"approx_percentile(v, array(0.5, 0.95), {accuracy})"
            ).alias("_ap"),
        )
        .select(
            "event_type",
            "n_events",
            F.col("_ap")[0].cast("long").alias("p50_x100"),
            F.col("_ap")[1].cast("long").alias("p95_x100"),
        )
    )


WINDOWED_TOPK = 3


def windowed_topk_types(events: DataFrame, k: int = WINDOWED_TOPK) -> DataFrame:
    """Top-k event types per hour — the partitioned-window top-k shape
    (contrast ``topk_users``): the rank window partitions on hour_epoch,
    so work scatters across partitions and no task ever sees more than one
    hour's type counts (bounded by the type cardinality).
    (hour_epoch, rank, event_type, n_events)."""
    counts = events.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
        "event_type",
    ).agg(F.count("*").cast("long").alias("n_events"))
    w = Window.partitionBy("hour_epoch").orderBy(
        F.desc("n_events"), F.col("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("hour_epoch", "rank", "event_type", "n_events")
    )


def hourly_spikes(events: DataFrame, factor: int = 2) -> DataFrame:
    """Volume-anomaly detection: flag (event_type, hour) buckets whose
    count exceeds ``factor``× the type's average hourly volume. The
    comparison is pure integer cross-multiplication
    (n_events · n_hours > factor · total_events) — no float mean, exact in
    every engine. Two aggregations over the same (type, hour) grouping:
    partial-agg counts, then a broadcast-size per-type totals join.
    (event_type, hour_epoch, n_events, is_spike)."""
    hourly = events.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
    ).agg(F.count("*").cast("long").alias("n_events"))
    totals = hourly.groupBy("event_type").agg(
        F.sum("n_events").alias("total_events"),
        F.count("*").alias("n_hours"),
    )
    return (
        hourly.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "hour_epoch",
            "n_events",
            (
                F.col("n_events") * F.col("n_hours")
                > F.lit(factor) * F.col("total_events")
            )
            .cast("long")
            .alias("is_spike"),
        )
    )


def asof_enrich(events: DataFrame) -> DataFrame:
    """As-of join, the time-series enrichment Spark has no built-in for:
    attach to every ``error`` event the user's most recent strictly-prior
    ``click`` (state-at-time-of-event — last config change, last page
    interaction before the failure). Expressed as ONE pass: events are
    their own anchor stream, and ``last(click_value, ignorenulls)`` over
    ``rowsBetween(unboundedPreceding, -1)`` ordered by (ts, event_id)
    resolves "latest anchor before me" without any join. Strictness and
    tie-breaks are total: the (ts, event_id) order makes the result
    deterministic even under equal timestamps.
    (event_id, user_id, err_epoch, click_epoch, click_value_x100, lag_sec;
    -1 sentinels when the user has no prior click).

    Scale shape: one shuffle on user_id (high-cardinality, unskewed — the
    same per-key discipline as ``sessionize``), per-user sort, no join at
    all — contrast the naive range-join formulation, which explodes to
    |errors|·|clicks| per user before taking the max. At 10^12 events this
    is a single Exchange + Sort + Window, all codegen'd."""
    sec = F.col("ts").cast("timestamp").cast("double")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    click_sec = F.last(F.when(is_click, sec), ignorenulls=True).over(w)
    click_val = F.last(
        F.when(is_click, F.round(F.col("value") * 100, 0).cast("long")),
        ignorenulls=True,
    ).over(w)
    return (
        events.select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            click_sec.alias("_csec"),
            click_val.alias("_cval"),
        )
        .where(F.col("event_type") == "error")
        .select(
            "event_id",
            "user_id",
            F.floor(sec).cast("long").alias("err_epoch"),
            F.coalesce(F.floor("_csec"), F.lit(-1)).cast("long").alias("click_epoch"),
            F.coalesce(F.col("_cval"), F.lit(-1)).cast("long").alias("click_value_x100"),
            F.coalesce(F.floor(sec - F.col("_csec")), F.lit(-1))
            .cast("long")
            .alias("lag_sec"),
        )
    )


def retention(events: DataFrame) -> DataFrame:
    """Day-over-day user retention: of the users active on day d, how many
    are also active on day d+1? The cohort question every telemetry stack
    answers.
    (day_epoch, n_active, n_retained, retained_permille).

    Scale shape: distinct (user, day) is one partial-agg shuffle; the
    "active tomorrow?" flag is ``lead(day)`` over the user timeline — a
    second shuffle on user_id, no self-join (the textbook formulation
    joins daily-actives to itself on day+1, shuffling the table twice and
    building a join hash; lead gets the same bit for a sort). The final
    per-day rollup is partial-agg over ~day-cardinality groups."""
    daily = events.select(
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch"),
        "user_id",
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_epoch")
    flagged = daily.withColumn(
        "retained",
        (F.lead("day_epoch").over(w) == F.col("day_epoch") + 86400)
        .cast("long"),
    )
    return flagged.groupBy("day_epoch").agg(
        F.count("*").cast("long").alias("n_active"),
        F.coalesce(F.sum("retained"), F.lit(0)).cast("long").alias("n_retained"),
        F.floor(
            F.coalesce(F.sum("retained"), F.lit(0)) * 1000 / F.count("*")
        )
        .cast("long")
        .alias("retained_permille"),
    )


ROLLING_DAYS = 7


def rolling_active_users(events: DataFrame, days: int = ROLLING_DAYS) -> DataFrame:
    """Trailing-N-day distinct active users per day (the DAU/WAU board
    metric). (day_epoch, n_active_7d) for every day with ≥1 event in its
    trailing window.

    Scale shape: sliding-window DISTINCT does not decompose into per-day
    partials (a user active on 3 of the 7 days must count once), and the
    window-function form needs an unbounded per-day sort. The distributive
    formulation: collapse to distinct (user, day) first (one partial-agg
    shuffle — the big reduction), then explode each surviving pair to the
    ≤N window-anchor days it participates in, and count-distinct per
    anchor (second shuffle, keyed by day — bounded cardinality). Shuffle
    volume is N× the DISTINCT PAIRS, not N× the raw events; at 10^12
    events with ~10^7 (user, day) pairs that is the difference between
    re-shuffling the corpus 7× and re-shuffling a rounding error 7×."""
    day = F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch")
    pairs = events.select(day, "user_id").distinct()
    anchors = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day_epoch"),
                F.col("day_epoch") + (days - 1) * 86400,
                F.lit(86400),
            )
        ).alias("day_epoch"),
    )
    # only anchor days that themselves have activity (engine-portable
    # boundary: no trailing ghost days after the last event)
    real_days = pairs.select("day_epoch").distinct()
    return (
        anchors.join(real_days, "day_epoch")
        .groupBy("day_epoch")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active_7d"))
    )


def new_users_daily(events: DataFrame) -> DataFrame:
    """Per day: first-ever-seen users vs returning actives (acquisition
    vs engagement split). (day_epoch, n_new, n_returning).

    Scale shape: both sides reduce BEFORE they meet — per-day actives is
    one partial-agg over distinct (user, day); first-seen is ``min(day)``
    per user (partial-agg) rolled up per first-day. The join then touches
    two day-cardinality aggregates (a few thousand rows at any data
    size), never re-shuffling the pairs table against itself."""
    day = F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch")
    pairs = events.select(day, "user_id").distinct()
    actives = pairs.groupBy("day_epoch").agg(
        F.count("*").cast("long").alias("n_active")
    )
    news = (
        pairs.groupBy("user_id")
        .agg(F.min("day_epoch").alias("day_epoch"))
        .groupBy("day_epoch")
        .agg(F.count("*").cast("long").alias("n_new"))
    )
    return actives.join(F.broadcast(news), "day_epoch", "left").select(
        "day_epoch",
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        (F.col("n_active") - F.coalesce("n_new", F.lit(0)))
        .cast("long")
        .alias("n_returning"),
    )


FUNNEL_STEPS = ("view", "click", "error")


def funnel_steps(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered funnel conversion: how many users reach step k having
    passed steps 1..k-1 IN ORDER (a 'click' before any 'view' does not
    count toward step 2). Emits one row per step with the user count and
    conversion permille vs step 1.
    (step_idx, step, n_users, permille_of_first; -1 sentinel when step 1
    has no users).

    Single-pass shape: one shuffle on user_id, one in-task sort, then a
    running-window chain — reach_1 = min ts of step1 so far, reach_2 =
    min ts of step2 at-or-after reach_1, … — each step's reach time is a
    windowed min over rows where the PREVIOUS step's reach is already
    set and strictly earlier-or-equal. The per-user funnel collapses to
    one row via max(flags) and the final rollup is a tiny partial-agg —
    no self-joins, no per-step scans (the textbook k-way join
    formulation shuffles the table k times)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sec = F.col("ts").cast("timestamp").cast("double")
    df = events.select("user_id", "event_id", "event_type", "ts")
    reach_prev = None
    reach_cols = []
    for i, step in enumerate(steps):
        if reach_prev is None:
            hit = F.when(F.col("event_type") == step, sec)
        else:
            hit = F.when(
                (F.col("event_type") == step) & (reach_prev <= sec), sec
            )
        reach = F.min(hit).over(w)
        name = f"_reach_{i}"
        df = df.withColumn(name, reach)
        reach_prev = F.col(name)
        reach_cols.append(name)
    per_user = df.groupBy("user_id").agg(
        *[
            F.max(F.col(c).isNotNull().cast("long")).alias(f"_hit_{i}")
            for i, c in enumerate(reach_cols)
        ]
    )
    counts = per_user.agg(
        *[F.sum(f"_hit_{i}").cast("long").alias(f"n_{i}") for i in range(len(steps))]
    )
    # one row per step via explode — a per-step union would re-execute
    # the whole aggregation chain once per step
    entries = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"n_{i}").alias("n_users"),
                # -1 sentinel when step 1 is empty (module contract:
                # integerized non-null outputs; see asof_enrich).
                # try_divide, not `/`: Spark 4 is ANSI by default, so a
                # plain division THROWS on the zero — coalesce alone
                # never sees the null
                F.coalesce(
                    F.floor(
                        F.try_divide(F.col(f"n_{i}") * 1000, F.col("n_0"))
                    ),
                    F.lit(-1),
                )
                .cast("long")
                .alias("permille_of_first"),
            )
            for i, step in enumerate(steps)
        ]
    )
    return counts.select(F.explode(entries).alias("e")).select("e.*")


def profile_columns(events: DataFrame) -> DataFrame:
    """ANALYZE-style table profiling — the data-quality pass every
    ingest pipeline runs before trusting a new partition: per column,
    row/null counts, EXACT distinct cardinality, and canonical min/max.
    Values are canonicalized to engine-identical strings first
    (integers/epochs verbatim, doubles as round(×100) integers) so both
    the distinct count and the lexicographic min/max compare hash-exact
    across engines. (col, n_rows, n_nulls, n_distinct, min_val, max_val).

    Scale shape: ONE scan — the profiled columns unpivot via ``stack``
    into (col, val) rows, and Spark's distinct-aggregate rewrite makes
    the rest two partial-agg shuffles: groupBy(col, val) collapses
    duplicates map-side (the heavy reduction), then groupBy(col) folds
    the survivors. No per-column scan loop, no expand over the raw table.
    At 10^12 rows the exact distinct would swap to
    ``approx_count_distinct`` (HLL++, map-combinable) at the cost of
    leaving the exact-hash gate — same trade ``value_percentiles``
    documents."""
    canon = {
        "event_type": F.col("event_type"),
        "user_id": F.col("user_id").cast("string"),
        "value": F.round(F.col("value") * 100, 0).cast("long").cast("string"),
        "props": F.col("props"),
    }
    stack_args = ", ".join(f"'{c}', `_p_{c}`" for c in canon)
    unpivoted = events.select(
        *[v.alias(f"_p_{c}") for c, v in canon.items()]
    ).select(
        F.expr(f"stack({len(canon)}, {stack_args}) as (col, val)")
    )
    return unpivoted.groupBy("col").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("val").isNull().cast("long")).cast("long").alias("n_nulls"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


INTERVAL_PAD_SEC = 900  # impact window: session padded ±15 min
INTERVAL_BUCKET_SEC = 3600  # interval-join bin width (1 h)


def session_error_impact(
    events: DataFrame,
    pad_sec: int = INTERVAL_PAD_SEC,
    bucket_sec: int = INTERVAL_BUCKET_SEC,
) -> DataFrame:
    """Bucketed interval join — the range-predicate join Spark has no
    shuffle strategy for: count system-wide ``error`` events (from ANY
    user) falling inside each user session's padded impact window
    ``[start−pad, end+pad]`` — "how many global incidents overlapped this
    session". (user_id, session_start_epoch, n_errors; sessions with zero
    overlapping errors retained at 0).

    Scale shape: a naive ``ON e.ts BETWEEN iv.lo AND iv.hi`` plans
    BroadcastNestedLoopJoin — O(|sessions|·|errors|), a non-starter when
    both sides are large. Instead both sides are binned to fixed-width
    time buckets: every error belongs to exactly ONE bucket
    (``floor(sec/W)``), every interval explodes to the few buckets it
    covers (``sequence(floor(lo/W), floor(hi/W))``), and the join becomes
    a plain shuffled equi-join on the bucket key with the range predicate
    left as a residual filter. Each (interval, error) pair meets at most
    once — the error's bucket is unique — so no post-join dedup. Bucket
    keys are time: uniform by construction, no skew salt needed; the
    explode factor is interval_span/W (~1–2 here). This is the same
    binning Spark's own range-join optimization (and every interval-join
    paper) uses. Intervals derive from ``sessionize``'s window pass —
    one shuffle on user_id — and the join is the second, irreducible
    shuffle."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("double")
    new_sess = (
        (sec - F.lag(sec).over(w)).isNull()
        | ((sec - F.lag(sec).over(w)) > SESSION_GAP_SEC)
    ).cast("long")
    intervals = (
        events.withColumn("session_idx", F.sum(new_sess).over(w).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(
            (F.min(sec) - pad_sec).alias("lo"),
            (F.max(sec) + pad_sec).alias("hi"),
            F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("lo") / bucket_sec).cast("long"),
                    F.floor(F.col("hi") / bucket_sec).cast("long"),
                )
            ),
        )
    )
    errors = events.where(F.col("event_type") == "error").select(
        sec.alias("err_sec"),
        F.floor(sec / bucket_sec).cast("long").alias("bucket"),
    )
    cond = (
        (intervals["bucket"] == errors["bucket"])
        & (errors["err_sec"] >= intervals["lo"])
        & (errors["err_sec"] <= intervals["hi"])
    )
    return (
        intervals.join(errors, cond, "left")
        .groupBy("user_id", "session_idx", "session_start_epoch")
        .agg(F.count("err_sec").cast("long").alias("n_errors"))
        .select("user_id", "session_start_epoch", "n_errors")
    )


PER_MINUTE_LIMIT = 2  # S16 throttle threshold (events/user/minute)


def throttle_audit(events: DataFrame, limit_per_min: int = PER_MINUTE_LIMIT) -> DataFrame:
    """Batch audit of the reference's throttle rule (S16 — the server's
    ``Throttle: N`` backpressure reply,
    ``/root/reference/server/.../LogServerController.java:170-174``): for
    each user, peak events-per-minute and how many minutes breached the
    limit — who WOULD have been throttled, over historical data.
    (user_id, peak_per_min, n_active_minutes, n_throttled_minutes,
    throttled).

    Scale shape: two stacked partial aggs — groupBy(user, minute) counts
    collapse map-side before the one shuffle on (user, minute) (near-unique
    key, no skew), then the per-user rollup reuses the user prefix. No
    window, no join."""
    per_min = events.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count("*").alias("n"))
    return per_min.groupBy("user_id").agg(
        F.max("n").cast("long").alias("peak_per_min"),
        F.count("*").cast("long").alias("n_active_minutes"),
        F.sum((F.col("n") >= limit_per_min).cast("long"))
        .cast("long")
        .alias("n_throttled_minutes"),
        (F.max("n") >= limit_per_min).cast("long").alias("throttled"),
    )


def distinct_users(events: DataFrame) -> DataFrame:
    """Exact COUNT(DISTINCT user_id) per event_type in the explicit
    two-stage skew-safe form: stage 1 reduces to distinct
    (event_type, user_id) pairs — the shuffle key carries user_id, so a hot
    event_type (one type = half of 10^12 rows) spreads across every
    partition instead of landing on one task — and stage 2 is an ordinary
    map-combinable count/sum on the now-bounded pair table. This is the
    rewrite Spark applies internally for a single DISTINCT aggregate, made
    explicit so the intermediate pair frequencies are reusable (n_events
    comes for free) and so the shape survives when combined with other
    aggregates (where Spark would fall back to Expand and double the scan).
    (event_type, n_users, n_events)."""
    pairs = events.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n")
    )
    return pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("n_events"),
    )


def hll_distinct(events: DataFrame, rsd: float = 0.02, tol_ppm: int = 80_000) -> DataFrame:
    """Approximate distinct users per event_type via HyperLogLog++
    (``approx_count_distinct``) — the only affordable distinct at 10^12
    rows (constant memory per group, one pass, fully map-combinable, no
    pair blowup) — gated like ``lsh_recall``: the query computes BOTH the
    sketch and the exact count and emits ``hll_within_tol`` = 1 iff the
    sketch lands within ``tol_ppm`` of exact, so the driver's hash gate
    certifies measured sketch accuracy (HLL++ is deterministic — same
    xxhash64 inputs, same registers — so this is stable across runs).
    The exact side exists only for the gate; production reads the sketch.
    (event_type, n_users_exact, hll_within_tol)."""
    exact = distinct_users(events).select("event_type", "n_users")
    approx = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("n_approx")
    )
    err_ppm = (
        F.abs(F.col("n_approx") - F.col("n_users")) * 1_000_000
    )
    return exact.join(approx, "event_type").select(
        "event_type",
        F.col("n_users").alias("n_users_exact"),
        (err_ppm <= F.col("n_users") * tol_ppm).cast("long").alias("hll_within_tol"),
    )


def props_extract(events: DataFrame) -> DataFrame:
    """Regex field extraction from the semi-structured props column (the
    grok moment applied to telemetry payloads; engine-portable regexp so
    the DuckDB twin needs no JSON extension).
    (event_type, n_events, sum_k, max_k)."""
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition counts — the Markov/flow-mining view
    of a telemetry stream (which screens lead where): ``lead(event_type)``
    over each user's (ts, event_id) timeline, then count per
    (from_type, to_type) pair.

    Scale shape: ONE shuffle on user_id (the window), in-task sort, then a
    partial-agg groupBy over the tiny |types|² key space — no self-join
    (the naive formulation joins the table against itself on
    user+adjacent-ts, shuffling everything twice).
    (from_type, to_type, n_transitions)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    return (
        events.withColumn("to_type", nxt)
        .where(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count("*").cast("long").alias("n_transitions"))
    )
