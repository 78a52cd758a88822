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
