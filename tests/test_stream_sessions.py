"""Stateful streaming sessionization (applyInPandasWithState)."""

import time
from datetime import datetime, timedelta

from textgraphs_spark.streaming.events import read_events_stream, run_available_now
from textgraphs_spark.streaming.sessions import stream_sessionize

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1) \
        .write.mode("append").parquet(path)


def test_stream_sessionize_closes_on_gap_and_timeout(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # user 1: two sessions split by a 2h in-stream gap; the second session
    # is later closed by the watermark timeout once user 2's far-future
    # event advances event time.
    _write(spark, src, [
        (1, T0),
        (1, T0 + timedelta(minutes=5)),
        (1, T0 + timedelta(hours=2)),
    ])
    time.sleep(1.1)  # distinct mtime => deterministic file order
    _write(spark, src, [(2, T0 + timedelta(hours=12))])

    stream = read_events_stream(
        spark, src, max_files_per_trigger=1
    ).select("user_id", "ts")
    out = stream_sessionize(
        stream, gap_minutes=30, watermark="10 minutes"
    )
    run_available_now(
        out, checkpoint=ckpt, table_name="sessions_out", output_mode="append"
    )
    rows = {
        (r.user_id, r.session_seq): r
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # session 1 closed in-stream by the 2h gap
    s1 = rows[(1, 1)]
    assert s1.n_events == 2
    assert (s1.end_us - s1.start_us) == 5 * 60 * 1_000_000
    # session 2 closed by event-time timeout when the watermark advanced
    s2 = rows[(1, 2)]
    assert s2.n_events == 1
    # user 2's open session is still in state — not emitted
    assert (2, 1) not in rows


def test_stream_dedup_within_watermark(spark, tmp_path):
    from textgraphs_spark.streaming.events import stream_dedup

    src = str(tmp_path / "dups")
    ckpt = str(tmp_path / "dck")
    rows = [(1, T0), (1, T0), (2, T0 + timedelta(minutes=1)), (1, T0)]
    spark.createDataFrame(rows, "event_id long, ts timestamp").coalesce(1) \
        .write.parquet(src)
    stream = read_events_stream(spark, src)
    out = stream_dedup(stream, keys=["event_id"], watermark="10 minutes")
    run_available_now(out, checkpoint=ckpt, table_name="dedup_out")
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r.event_id for r in got) == [1, 2]
