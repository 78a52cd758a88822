"""Stateful streaming sessionization via ``applyInPandasWithState``.

The batch twin lives in ``operators/analytics.py::sessionize`` (lag +
cumulative sum). A stream cannot use that formulation — a session is
unbounded state that spans micro-batches — so this module keeps one open
session per user in the state store and closes it either when a larger
gap arrives in-stream or when the event-time watermark passes
``last_seen + gap`` (state timeout).

Scale notes: state is keyed by user and O(1) per user (four longs), so
the state store grows with |active users|, not |events|. Each micro-batch
shuffles once on the grouping key — the same single-shuffle shape as the
batch operator.

Semantics under late data: ``session_seq`` is monotone per user while the
user's state lives (closed-session counters are retained dormant for 10
gap windows before GC). Events arriving late-but-within-watermark that
precede the open session's frontier are counted into it without moving
its boundaries; exact parity with the batch operator therefore holds
when the watermark delay is <= the session gap.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType,
)

SESSION_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("n_events", LongType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
])

# (session_seq, n_events, start_us, last_us)
_STATE = StructType([
    StructField("session_seq", LongType()),
    StructField("n_events", LongType()),
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
])


def _make_update_fn(gap_us: int):
    # dormant state (counter only, no open session) is kept for GC_FACTOR
    # more gaps so session_seq stays monotone per user across a closed
    # session; beyond that horizon state is removed and numbering restarts
    # (bounded state requires forgetting eventually)
    GC_FACTOR = 10

    def update(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int, int]] = []

        if state.hasTimedOut:
            seq, n, start, last = state.get
            if n > 0:
                closed.append((user_id, seq, n, start, last))
                # keep the counter dormant so the next session is seq+1;
                # clamp past the current watermark (the timeout may fire
                # long after last + gap if the stream idled)
                state.update((seq, 0, None, last))
                horizon_ms = (last + GC_FACTOR * gap_us) // 1000
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(horizon_ms, wm_ms + 1000))
            else:
                state.remove()
        else:
            seq, n, start, last = (
                state.get if state.exists else (0, 0, None, None)
            )
            ts_us = (
                pd.concat([p["ts"] for p in pdfs])
                .astype("datetime64[us]").astype("int64").sort_values()
            )
            for t_ in ts_us:
                t = int(t_)
                if start is None:          # no open session: start seq+1
                    seq, n, start, last = seq + 1, 1, t, t
                elif t <= last:
                    # late straggler (allowed when watermark > gap): count
                    # it into the open session but never regress the
                    # boundaries — keeps last monotone and end >= start
                    n += 1
                elif t - last > gap_us:    # gap observed in-stream: close
                    closed.append((user_id, seq, n, start, last))
                    seq, n, start, last = seq + 1, 1, t, t
                else:
                    n, last = n + 1, t
            state.update((seq, n, start, last))
            # close via timeout when the watermark passes last_seen + gap
            state.setTimeoutTimestamp((last + gap_us) // 1000)

        yield pd.DataFrame(
            closed, columns=[f.name for f in SESSION_OUTPUT.fields]
        )

    return update


def stream_sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Emit one row per CLOSED session on a streaming events DataFrame."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events
        .withColumn(ts_col, events[ts_col].cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            _make_update_fn(gap_us),
            outputStructType=SESSION_OUTPUT,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
