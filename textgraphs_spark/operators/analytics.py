"""Event-stream analytics operators: sessionization, as-of join, range join.

These extend the engine beyond the reference's graph operators with the
time-series primitives a large-scale behavioural/training-data pipeline
needs. All three are pure DataFrame compositions — no Python UDFs — so
they stay inside whole-stage codegen and scale with executor count.

Scale notes
-----------
* ``sessionize`` costs exactly ONE shuffle (hash on the user key for the
  window); the gap-flag cumulative sum rides the same sort. At 100 TB the
  per-user partition is bounded by the busiest single user, not the table.
* ``asof_join`` uses the union-and-window formulation instead of
  ``join + filter + row_number``: a naive inequality join explodes to
  |left| x |right-per-key| rows before pruning, while the union form is
  a single shuffle on the key and a linear scan per key — the standard
  scalable as-of strategy (same plan shape Flink/kdb use).
* ``range_bucket_join`` broadcasts the (tiny) bucket dimension so the
  inequality predicate is evaluated map-side with no shuffle of the fact
  table at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MINUTES = 30


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> DataFrame:
    """Assign a per-user ``session_seq`` (1-based) using an inactivity gap.

    A new session starts at the first event and whenever the gap to the
    previous event of the same user exceeds ``gap_minutes``. Implemented
    as lag + cumulative sum over one window, so the whole operator is a
    single hash shuffle on ``user_col``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    gap_us = F.lit(int(gap_minutes) * 60 * 1_000_000)
    prev_us = F.lag(F.unix_micros(F.col(ts_col).cast("timestamp"))).over(w)
    is_new = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col(ts_col).cast("timestamp")) - prev_us > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_seq", F.sum(is_new).over(running))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> DataFrame:
    """Per-session rollup: event count, bounds (epoch micros), duration."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    s = sessionize(events, user_col, ts_col, order_col, gap_minutes)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_us).alias("start_us"),
            F.max(ts_us).alias("end_us"),
        )
        # exact integer micros, not round(double, 4): a duration landing on
        # a .xxxx5 double boundary rounds differently across engines, and
        # the exact value is strictly more information anyway
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
        .orderBy(user_col, "session_seq")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Backward as-of LEFT join: each left row gets the latest right row
    with ``right_ts <= left_ts`` for the same ``key``.

    Columns of ``right`` (minus key/ts) come back prefixed ``asof_``,
    plus ``asof_ts_us``; unmatched left rows keep them NULL.

    Formulation: tag both sides, union, and take ``last_value(...,
    ignorenulls)`` over a window ordered by (ts, side) — right rows sort
    before left rows at equal timestamps so "at or before" includes ties.
    One shuffle on ``key``; no candidate-pair explosion.
    """
    r_payload = [c for c in right.columns if c not in (key, right_ts)]
    r_ts_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    l_ts_us = F.unix_micros(F.col(left_ts).cast("timestamp"))

    # right rows whose timestamp casts to NULL would sort nulls-first and
    # become a bogus "match" for left rows that should be unmatched —
    # as-of semantics only defines matches for timestamped right rows
    right = right.filter(F.col(right_ts).cast("timestamp").isNotNull())
    r = right.select(
        F.col(key).alias("__k"),
        r_ts_us.alias("__ts_us"),
        F.lit(0).alias("__side"),
        F.struct(
            r_ts_us.alias("asof_ts_us"),
            *[F.col(c).alias(f"asof_{c}") for c in r_payload],
        ).alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(key).alias("__k"),
        l_ts_us.alias("__ts_us"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *left.columns,
    )
    # __r as the final sort key: among right rows tied on (ts), the window
    # picks the lexicographically-largest payload struct — deterministic
    # across partitionings (left rows carry NULL __r; nulls sort first
    # within their (ts, side) group, which never spans sides)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts_us", "__side", F.col("__r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        r.unionByName(l)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = list(left.columns) + [
        F.col("__match.asof_ts_us").alias("asof_ts_us")
    ] + [F.col(f"__match.asof_{c}").alias(f"asof_{c}") for c in r_payload]
    return joined.select(*out_cols)


def range_bucket_join(
    df: DataFrame,
    buckets: DataFrame,
    value_col: str = "value",
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Inequality (band) join of a fact table onto a small bucket dim:
    rows where ``lo <= value < hi``. The dim is broadcast so the fact
    side never shuffles — the predicate runs map-side in codegen.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return df.join(F.broadcast(buckets), cond, "inner")


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered multi-step funnel with first-qualifying-chain semantics:
    a user reaches step i+1 when they have a step-i+1 event STRICTLY
    AFTER their earliest qualifying step-i time. One row per step:
    (step, event_type, n_users, conv_from_first, conv_from_prev) —
    conv_from_prev is NULL on step 1.

    Scale shape: one conditional min-agg per step, each a keyed shuffle
    on the user column joined against the (user-cardinality) previous
    frontier — never a per-user event-sequence sort or a window over
    the raw event stream, so a hot user costs one min, not a sort. The
    per-step counts are 1-row aggregates stitched with a broadcast
    cross join + a |steps|-row self-join; timestamps compare as exact
    unix micros (the events_asof_attribution convention — no double
    rounding at engine boundaries).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs >= 2 steps")
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    ).localCheckpoint()  # read once per step
    frontier = (
        ev.filter(F.col("et") == steps[0]).groupBy("u").agg(F.min("us").alias("t"))
    )
    rows = [
        frontier.agg(F.count("*").alias("n_users")).select(
            F.lit(1).alias("step"), F.lit(steps[0]).alias("event_type"), "n_users"
        )
    ]
    for i, st in enumerate(steps[1:], start=2):
        frontier = (
            ev.filter(F.col("et") == st)
            .join(frontier, "u")
            .filter(F.col("us") > F.col("t"))
            .groupBy("u")
            .agg(F.min("us").alias("t"))
        ).localCheckpoint()  # feeds its count AND the next step's join
        rows.append(
            frontier.agg(F.count("*").alias("n_users")).select(
                F.lit(i).alias("step"), F.lit(st).alias("event_type"), "n_users"
            )
        )
    counts = rows[0]
    for r in rows[1:]:
        counts = counts.unionAll(r)
    counts = counts.localCheckpoint()  # 3 tiny branches below
    first = counts.filter(F.col("step") == 1).select(
        F.col("n_users").alias("n_first")
    )
    prev = counts.select(
        (F.col("step") + 1).alias("step"), F.col("n_users").alias("n_prev")
    )
    return (
        counts.crossJoin(F.broadcast(first))
        .join(F.broadcast(prev), "step", "left")
        .select(
            "step", "event_type", "n_users",
            F.round(F.col("n_users") / F.col("n_first"), 6).alias("conv_from_first"),
            F.round(F.col("n_users") / F.col("n_prev"), 6).alias("conv_from_prev"),
        )
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    FIRST event; one row per (cohort_week, week_offset) with the count
    of cohort members active that week — the triangular matrix every
    growth/engagement dashboard draws, and for a training-data
    pipeline the freshness-mix diagnostic per crawl cohort.

    Scale shape: one min-agg per user (keyed shuffle), one distinct
    over (user, week) — vocabulary-sized output — and one join back on
    the user key; the offset is exact integer arithmetic on unix
    micros of Monday-truncated weeks (both engines truncate to Monday,
    and 7-day alignment makes the integer division exact), so the
    DuckDB twin is bit-equal with no date-function drift.

    Returns (cohort_us, week_offset, n_users): cohort week start as
    unix micros, offset in whole weeks >= 0.
    """
    wk = F.unix_micros(F.date_trunc("week", F.col(ts_col).cast("timestamp")))
    uw = events.select(
        F.col(user_col).alias("u"), wk.alias("wus")
    ).localCheckpoint()  # feeds the cohort agg AND the activity set
    cohort = uw.groupBy("u").agg(F.min("wus").alias("cus"))
    active = uw.distinct()
    return (
        active.join(cohort, "u")
        .groupBy(
            F.col("cus").alias("cohort_us"),
            F.expr("(wus - cus) DIV 604800000000").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
