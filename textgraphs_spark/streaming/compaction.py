"""Streaming SCD-1 compaction: the latest-capture table maintained
incrementally as captures arrive.

Batch twin: ``operators/webdata.latest_captures`` (one struct-argmax
hash agg). The streaming form keeps ONE state row per url — the state
IS the table being maintained, which is exactly the footprint a
production SCD-1 maintainer has — and emits the url's new current row
whenever a batch improves its (ts, doc_id, text) argmax. No timeout:
a url's latest row must never be forgotten (unbounded-state is the
SEMANTICS here, unlike the watermark-bounded dedup/session operators
whose state tracks an arrival window).

Ordering contract: the argmax tuple is (ts, doc_id, text), compared in
Python inside the state function vs Spark struct comparison in the
batch twin — identical for the ts/long fields; the text tie-breaker is
only reached when (ts, doc_id) collide, which the capture schema rules
out (doc_id is unique). tests/test_stream_compaction.py asserts the
stream's final emission per url is bit-equal to the batch operator
across multi-file micro-batches.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

SCD1_OUTPUT = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])

_STATE = StructType([
    StructField("ts_us", LongType()),
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])


def _update(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (url,) = key
    best = tuple(state.get) if state.exists else None
    for p in pdfs:
        ts_us = p["warc_ts"].astype("datetime64[us]").astype("int64")
        for t, d, x in zip(ts_us, p["doc_id"], p["text"]):
            cand = (int(t), int(d), x)
            if best is None or cand > best:
                best = cand
    if best is not None:
        state.update(best)
        yield pd.DataFrame({
            "url": [url],
            "warc_ts": [pd.Timestamp(best[0], unit="us")],
            "doc_id": [best[1]],
            "text": [best[2]],
        })


def stream_latest_captures(captures: DataFrame) -> DataFrame:
    """Maintain the SCD-1 latest-capture row per url on a capture
    stream; emits a url's current row whenever a micro-batch improves
    its argmax (outputMode must be "update")."""
    return captures.groupBy("url").applyInPandasWithState(
        _update,
        outputStructType=SCD1_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
