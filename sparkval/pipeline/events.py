"""Event-stream operators over a timestamped event table: tumbling
windows, gap-based sessionization, dedup-to-latest, JSON prop
extraction.

These are the batch twins of the Structured Streaming operators in
``sparkval.streaming`` — identical logical plans, so a pipeline can be
developed in batch and flipped to ``readStream`` unchanged.

Scale notes:
- tumbling window agg: one shuffle on (window, event_type) with
  map-side partial aggregation; window key is derived, never stored.
- sessionization: one shuffle on user_id, then lag/cumsum window
  functions inside each partition — no second shuffle because the
  session aggregation reuses the user_id partitioning.
- dedup-to-latest: row_number over (user_id ORDER BY ts DESC) —
  AQE handles per-user skew; for truly hot users, max_by semantics
  (one agg, no full sort) are the fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tumbling_window_counts(
    events: DataFrame, duration: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Per (tumbling window, event_type): count + value stats.

    F.window() is epoch-aligned for whole-hour durations, so results
    agree with date_trunc-based oracles.
    """
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str | None = "event_id",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the user has been
    idle longer than ``gap_minutes``. Returns one row per session.

    ``id_col`` breaks ordering ties at equal timestamps; pass None for
    event tables without a usable id column (results are then
    plan-dependent only when duplicate (user, ts) rows exist).

    Plan: single shuffle on user_id; lag + running-sum window
    functions share the same partitioning (one Window spec family),
    so Catalyst plans them in one Exchange.
    """
    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    # microsecond-exact gap: truncating to seconds would misclassify
    # gaps in (30min, 30min+1s) vs an interval-exact oracle
    # cast handles TIMESTAMP_NTZ sources (session TZ is UTC, lossless)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = micros - F.lag(micros).over(w)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    with_sid = with_flag.withColumn("session_seq", F.sum("new_session").over(w))
    return (
        with_sid.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .withColumn(
            "duration_s",
            F.col("session_end").cast("timestamp").cast("long")
            - F.col("session_start").cast("timestamp").cast("long"),
        )
    )


def session_stats_per_user(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user rollup of gap-based sessions (n_sessions, n_events)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("duration_s").alias("max_session_s"),
    )


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """Dedup-to-latest: the most recent event per user (deterministic
    tie-break on event_id)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-time (as-of) join: each left row gets the latest right
    row with ``right.ts <= left.ts`` for the same key. Spark has no
    native ASOF JOIN; the naive range-join is O(|L|·|R|) per key.

    Scalable formulation — ONE shuffle on the key, no range explosion:
    union both sides tagged, sort within key by (ts, side), and carry
    the right side's values forward with last(..., ignorenulls) over an
    unbounded-preceding window; keep left rows. Right side sorts before
    left at equal timestamps, so ties are inclusive (ts_right == ts_left
    matches), mirroring ASOF semantics with >=.

    Cost at scale: |L|+|R| rows shuffle once on the key; the window is
    a single pass per key partition. Hot keys → AQE skew handling.

    Right rows sharing (key, ts) are deduped deterministically inside
    the operator (max struct of the carried columns wins), so the
    output never depends on physical plan ordering.
    """
    right_cols = right_cols or [c for c in right.columns if c not in key_cols + [ts_col]]
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{ts_col}{suffix}"]
    tie = F.struct(*right_cols).desc() if right_cols else F.lit(1).asc()
    dw = Window.partitionBy(*key_cols, ts_col).orderBy(tie)
    right = (
        right.withColumn("_rn", F.row_number().over(dw))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        *key_cols,
        F.col(ts_col),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        F.lit(0).alias("_side"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).drop("_side")


def extract_props(events: DataFrame, keys: tuple[str, ...] = ("k",)) -> DataFrame:
    """Typed extraction from the JSON props column — pure expression
    (get_json_object runs in codegen; no UDF, no shuffle)."""
    out = events
    for key in keys:
        out = out.withColumn(
            f"prop_{key}", F.get_json_object("props", f"$.{key}").cast("long")
        )
    return out


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: per user, how many of ``steps`` were
    completed IN ORDER with STRICTLY increasing timestamps (the classic
    product-analytics funnel; a later step at the same instant as its
    predecessor does not count, which also makes the result independent
    of tie order among equal timestamps).

    Shape: filter to relevant event types (scan-level pushdown), ONE
    shuffle grouping per user, then a pure-expression fold
    (array_sort + aggregate HOF with a (step, last_ts) accumulator) —
    equivalent to the chained min-timestamp SQL formulation
    (oracle-checked) but one pass and no self-joins, so k funnel steps
    cost the same single shuffle as k=1. Per-user state is the user's
    relevant events only; AQE splits skewed users. Users with no
    relevant events are absent from the result (a funnel over people
    who never entered it is not 0, it is undefined)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    relevant = events.filter(F.col(type_col).isin(list(steps)))
    ev_sorted = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("y")))
    )
    steps_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).alias("step"),
        F.lit("1000-01-01 00:00:00").cast("timestamp").alias("t"),
    )

    def advance(acc, e):
        hit = (
            (acc["step"] < len(steps))
            & (e["y"] == F.element_at(steps_arr, acc["step"] + 1))
            & (e["t"] > acc["t"])
        )
        return F.when(
            hit,
            F.struct((acc["step"] + 1).alias("step"), e["t"].alias("t")),
        ).otherwise(acc)

    return (
        relevant.groupBy(user_col)
        .agg(F.aggregate(ev_sorted, init, advance).alias("_f"))
        .select(
            user_col,
            F.col("_f.step").cast("long").alias("steps_completed"),
            F.when(F.col("_f.step") == len(steps), F.col("_f.t")).alias(
                "completed_at"
            ),
        )
    )


def retention_cohorts(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Weekly cohort retention: each user joins the cohort of their
    first event's ISO week (date_trunc 'week' = Monday on both Spark
    and the SQL oracle); for every (cohort_week, week_offset) the
    report counts distinct active users and the retention fraction of
    the cohort — the standard activation/stickiness table of product
    analytics, and for a training pipeline the freshness profile of a
    rolling crawl (how much of week-0's producer population is still
    emitting at week N).

    Plan shape: first-event and distinct-activity tables both hash on
    the user key, so the activity->cohort join reuses one exchange;
    the final aggregates are O(weeks^2) rows and cohort sizes
    broadcast back. countDistinct is exact (the row space is already
    (user, week) distinct, so the final agg counts pre-deduped rows).
    """
    week = F.date_trunc("week", F.col(ts_col))
    firsts = events.groupBy(user_col).agg(F.min(week).alias("cohort_week"))
    active = events.select(F.col(user_col), week.alias("_week")).distinct()
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    offset = (F.datediff(F.col("_week"), F.col("cohort_week")) / 7).cast("int")
    return (
        active.join(firsts, user_col)
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .withColumn(
            "retention",
            F.round(F.col("n_active") / F.col("cohort_size"), 6),
        )
    )


def seasonal_anomaly(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    z_threshold: float = 2.5,
) -> DataFrame:
    """Seasonal-naive anomaly detection on event volume: hourly counts
    per group, scored against the mean/stddev of the SAME
    hour-of-day across all days (the seasonal baseline), flagging
    |z| > ``z_threshold`` — the standard ops-health check for an
    ingest feed with a daily cycle ("is 3am Tuesday's volume weird
    for a 3am?").

    Plan shape: one scan collapses to O(groups x hours) hourly
    counts (map-side partials); the baseline is a window over
    (group, hour-of-day) on that tiny table — parallelism scales
    with groups x 24, never with raw events. Hours with ZERO events
    produce no row and are therefore not scored; densify upstream
    with a sequence() calendar join if silence itself must alarm.

    Output: ``group, hour_ts, n_events, expected, z, is_anomaly``;
    z is NULL (and is_anomaly false) when a group-hour's baseline
    has zero variance.
    """
    hourly = (
        events.groupBy(
            group_col, F.date_trunc("hour", F.col(ts_col)).alias("hour_ts")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    season = Window.partitionBy(group_col, F.hour("hour_ts"))
    mu = F.avg("n_events").over(season)
    sd = F.stddev_samp("n_events").over(season)
    z = F.when(sd > 0, (F.col("n_events") - mu) / sd)
    return hourly.select(
        group_col,
        "hour_ts",
        "n_events",
        F.round(mu, 6).alias("expected"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > F.lit(z_threshold), F.lit(False)).alias(
            "is_anomaly"
        ),
    )


def coverage_gaps(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    unit_seconds: int = 3600,
    max_units_per_group: int = 1_000_000,
) -> DataFrame:
    """Feed-completeness check — the complement of
    ``seasonal_anomaly``'s observed-hours-only scoring: which whole
    time units (hours by default) inside a group's [first, last]
    activity span produced ZERO events? Silence is often the worst
    failure an ingest validator can miss.

    Plan shape: one scan collapses to per-(group, unit) counts and a
    per-group min/max span (both map-side partial aggs); the dense
    calendar is sequence()-generated per GROUP (O(groups x units)
    rows, data-independent) and anti-joined against observed units.
    Nothing row-level survives the first aggregate. Output:
    ``group, missing_ts`` — one row per silent unit.
    """
    unit = F.lit(unit_seconds * 1_000_000)
    bucket = (F.unix_micros(F.col(ts_col).cast("timestamp")) / unit).cast(
        "long"
    )
    observed = (
        events.filter(F.col(ts_col).isNotNull())
        .select(F.col(group_col), bucket.alias("u"))
        .groupBy(group_col, "u")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    span = observed.groupBy(group_col).agg(
        F.min("u").alias("lo"), F.max("u").alias("hi")
    )
    # the dense calendar is one sequence() ARRAY per group before the
    # explode — a decade-long span at unit_seconds=1 would build a
    # ~10^8-element array in a single row and blow the task. Fail
    # loudly at the guard instead of OOMing an executor; callers with
    # genuinely huge spans should raise the unit or shard the span.
    guard = F.when(
        F.col("hi") - F.col("lo") >= max_units_per_group,
        F.raise_error(
            F.concat(
                F.lit(
                    f"coverage_gaps: span exceeds {max_units_per_group} "
                    "units for group "
                ),
                F.col(group_col).cast("string"),
            )
        ),
    ).otherwise(F.col("lo"))
    dense = span.select(
        group_col, F.explode(F.sequence(guard, F.col("hi"))).alias("u")
    )
    missing = dense.join(observed, [group_col, "u"], "left_anti")
    return missing.select(
        group_col,
        F.timestamp_micros(F.col("u") * unit).alias("missing_ts"),
    )


def trend_fit(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    origin_us: int = 1704067200000000,
) -> DataFrame:
    """Per-key OLS trend of a metric over time: slope per day,
    intercept at ``origin_us`` (epoch microseconds; default
    2024-01-01T00:00Z), fit quality (r^2), and point count — the
    monitoring primitive behind "is this metric drifting up?" gates.

    x is integer epoch-microseconds minus the origin, divided by a
    day — integer arithmetic then one double division, so every
    engine computes bit-identical regressors (no tz or float-epoch
    ambiguity). regr_* are single-pass mergeable aggregates: one
    shuffle of O(keys) partial moment rows, nothing else moves.
    """
    x = (
        (F.unix_micros(F.col(ts_col).cast("timestamp")) - F.lit(origin_us))
        / F.lit(86400.0 * 1e6)
    )
    y = F.col(value_col).cast("double")
    return (
        events.groupBy(key_col)
        .agg(
            F.regr_count(y, x).alias("n_points"),
            F.round(F.regr_slope(y, x), 6).alias("slope_per_day"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.avg(y), 6).alias("mean_value"),
        )
        .orderBy(key_col)
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition profile of the event stream: for
    every (previous type -> next type) pair within a user's timeline,
    the transition count and conditional probability P(next | prev).
    The behavioral fingerprint behind bot detection and funnel-shape
    drift (compare two snapshots' transition tables with any of the
    drift gates).

    One shuffle on the user (the lag window), one hash agg on the
    pair, then a probability window over the O(types^2) pair table —
    nothing user-sized survives past the first aggregation. Ordering
    ties at equal timestamps break on ``id_col``, keeping the pairs
    engine-replayable.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        # a NULL-ts event has no defined timeline position (and Spark
        # and SQL engines disagree on NULLS FIRST/LAST): exclude it
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("prob"),
    ).orderBy("prev_type", "next_type")


def change_attribution(
    events: DataFrame,
    split_ts: str,
    segment_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Period-over-period change attribution: which segments drove the
    metric's move between the window before ``split_ts`` and the
    window after it. Per segment: both period sums, the delta, the
    percent change, and the segment's share of the total delta — the
    first question after any volume-anomaly alert fires.

    One scan, conditional sums (map-side partials, one shuffle of
    O(segments) rows); the total-delta share is a window over the
    collapsed segment table. Rows with a NULL timestamp belong to
    neither period and are excluded outright (they'd otherwise fall
    into whichever branch an engine's NULL-comparison default picks).
    """
    after = F.col(ts_col) >= F.lit(split_ts).cast("timestamp_ntz")
    v = F.col(value_col).cast("double")
    seg = events.filter(F.col(ts_col).isNotNull()).groupBy(segment_col).agg(
        F.sum(F.when(~after, v).otherwise(F.lit(0.0))).alias("sum_before"),
        F.sum(F.when(after, v).otherwise(F.lit(0.0))).alias("sum_after"),
    )
    delta = F.col("sum_after") - F.col("sum_before")
    tot = Window.partitionBy()
    return seg.select(
        segment_col,
        F.round("sum_before", 6).alias("sum_before"),
        F.round("sum_after", 6).alias("sum_after"),
        F.round(delta, 6).alias("delta"),
        F.round(
            F.when(F.abs(F.col("sum_before")) > 0, delta / F.abs(F.col("sum_before"))),
            6,
        ).alias("pct_change"),
        F.round(
            F.when(
                F.abs(F.sum(delta).over(tot)) > 1e-12,
                delta / F.sum(delta).over(tot),
            ),
            6,
        ).alias("share_of_total_delta"),
    ).orderBy(segment_col)


def gap_fill(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    unit_seconds: int = 3600,
    max_units_per_group: int = 1_000_000,
) -> DataFrame:
    """Dense time series with last-observation-carried-forward: the
    REPAIR step for the holes coverage_gaps detects. Per group, every
    unit in [first observation, last observation] gets a row; units
    with no events inherit the most recent observed per-unit mean and
    an ``is_filled`` flag (leading units are never invented — the
    span starts at the group's first observation, so filled values
    always have a real ancestor).

    Observed values collapse to per-(group, unit) means at the scan
    (one shuffle); the dense calendar is sequence()-generated per
    group under the same span guard as coverage_gaps, and the
    carried-forward value is one ignoreNulls last() window per group
    — O(span units) rows, never O(events).
    """
    unit = int(unit_seconds) * 1_000_000
    u = (F.unix_micros(F.col(ts_col).cast("timestamp")) / unit).cast("long")
    observed = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(group_col), u.alias("u"))
        .agg(F.avg(F.col(value_col).cast("double")).alias("obs"))
    )
    span = observed.groupBy(group_col).agg(
        F.min("u").alias("lo"), F.max("u").alias("hi")
    )
    guard = F.when(
        F.col("hi") - F.col("lo") >= max_units_per_group,
        F.raise_error(
            F.concat(
                F.lit(
                    f"gap_fill: span exceeds {max_units_per_group} "
                    "units for group "
                ),
                F.col(group_col).cast("string"),
            )
        ),
    ).otherwise(F.col("lo"))
    dense = span.select(
        group_col, F.explode(F.sequence(guard, F.col("hi"))).alias("u")
    )
    joined = dense.join(observed, [group_col, "u"], "left")
    w = (
        Window.partitionBy(group_col)
        .orderBy("u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        group_col,
        F.timestamp_micros(F.col("u") * unit).alias("bucket_ts"),
        F.round(F.last("obs", ignorenulls=True).over(w), 6).alias("value"),
        F.col("obs").isNull().alias("is_filled"),
    ).orderBy(group_col, "bucket_ts")


def freshness_report(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    max_lag_minutes: float = 120.0,
    as_of_us: int | None = None,
) -> DataFrame:
    """Data-freshness gate — the first page of every observability
    tool: per group, when did we last hear from it, how far behind
    the reference instant is that, and is it stale? ``as_of_us``
    (epoch microseconds) is the evaluation instant; when None it
    defaults to the table's own max timestamp, which keeps the report
    deterministic and replayable (a wall-clock default would make
    identical inputs produce different verdicts).

    One aggregate over the scan (O(groups) rows shuffle), a 1-row
    broadcast of the reference instant when it is derived — computed
    from the per-group maxes (groups partition the rows, so their max
    IS the table max), never a second table scan. Groups with only
    NULL timestamps report NULL last_ts and stale = true — "never
    heard from it" is the stalest state there is.

    The verdict exprs are shared with the streaming monitor
    (streaming.stream_freshness state finalized by
    freshness_verdicts), so batch and streaming freshness can never
    disagree on what "stale" means.
    """
    u = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per = events.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(u).alias("last_us"),
    )
    return freshness_verdicts(
        per, group_col=group_col, max_lag_minutes=max_lag_minutes,
        as_of_us=as_of_us,
    )


def freshness_verdicts(
    per: DataFrame,
    group_col: str = "event_type",
    max_lag_minutes: float = 120.0,
    as_of_us: int | None = None,
) -> DataFrame:
    """Finalize freshness verdicts from per-group state rows
    ``(group, n_events, last_us)`` — the shape both the batch
    aggregate and the streaming monitor's complete-mode state table
    produce. ONE definition of lag and staleness for both paths."""
    if as_of_us is None:
        ref = per.agg(F.max("last_us").alias("__as_of_us"))
        per = per.join(F.broadcast(ref))
    else:
        per = per.withColumn("__as_of_us", F.lit(int(as_of_us)))
    lag_min = (F.col("__as_of_us") - F.col("last_us")) / F.lit(60e6)
    return per.select(
        group_col,
        "n_events",
        F.timestamp_micros(F.col("last_us")).alias("last_ts"),
        F.round(lag_min, 6).alias("lag_minutes"),
        F.coalesce(lag_min > max_lag_minutes, F.lit(True)).alias("is_stale"),
    ).orderBy(group_col)
