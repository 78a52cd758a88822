"""Streaming entity resolution: continuous incremental clustering of an
arriving document stream.

The north rule's corpus is a continuously-crawled web archive; batch
re-clustering per crawl wastes a full corpus pass on every arrival. This
module folds micro-batches of new documents into the persisted clustering
with ``ERPipeline.update`` (only pairs touching a previously-unseen
surface form are scored; CC merges old assignment edges with new match
edges), via Structured Streaming's ``foreachBatch`` — the idiomatic
bridge for sinks/updates that need full batch-DataFrame semantics.

Design points:

* **One codepath.** The fold calls the SAME ``run()``/``update()`` the
  batch and incremental CLI paths use — streaming adds arrival handling,
  never a second clustering implementation (the stream==batch pytest pins
  final assignments bit-equal to a one-shot batch run over the union).
* **Restart-safe.** ``foreachBatch`` can REPLAY a micro-batch after a
  failure (at-least-once semantics per epoch). ``update()`` is not
  idempotent — re-folding a batch would double mention counts — so the
  fold persists a batch-id high-water mark in the workdir and skips any
  batch id at-or-below it, restoring effectively-once folding.
* **Work per trigger scales with the batch + vocabulary**, never the
  accumulated corpus (update()'s contract) — the property that keeps a
  long-running stream viable at crawl scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables as TBL
from ..plans.er_pipeline import ERPipeline

_MARK = "stream_mark"


def _high_water(spark: SparkSession, workdir: str) -> int:
    """Last successfully folded micro-batch id, -1 if none."""
    path = os.path.join(workdir, _MARK)
    if not TBL.stage_exists(spark, path):
        return -1
    return TBL.read_table(spark, path).agg(F.max("batch_id")).collect()[0][0]


def _set_high_water(spark: SparkSession, workdir: str, batch_id: int) -> None:
    mark = spark.createDataFrame([(int(batch_id),)], "batch_id long")
    TBL.write_table(mark, os.path.join(workdir, _MARK))


def er_fold_batch(
    docs: DataFrame,
    batch_id: int,
    workdir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    **pipeline_kw,
) -> bool:
    """Fold ONE batch of documents into the persisted clustering.

    First-ever batch bootstraps with ``ERPipeline.run`` (writes every
    stage + lineage); later batches take ``update()``. Returns False when
    the batch was skipped (already folded — replay after restart).
    Usable directly for non-streaming callers that receive arrivals from
    an external scheduler.
    """
    spark = docs.sparkSession
    seen = _high_water(spark, workdir)
    if batch_id <= seen:
        return False
    pipe = ERPipeline(spark, workdir=workdir, **pipeline_kw)
    bootstrapped = TBL.stage_exists(
        spark, os.path.join(workdir, "entities")
    ) and TBL.stage_exists(spark, os.path.join(workdir, "assignments"))
    if bootstrapped:
        pipe.update(docs, id_col, text_col)
    else:
        pipe.run(docs, id_col, text_col)
    _set_high_water(spark, workdir, batch_id)
    return True


def stream_er_updates(
    docs_stream: DataFrame,
    workdir: str,
    *,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    **pipeline_kw,
):
    """Start the incremental-ER stream over ``docs_stream``.

    Each micro-batch is folded into ``workdir``'s persisted clustering;
    read the live result back anytime with
    ``tables.read_table(spark, workdir + "/assignments")``.

    ``available_now=True`` (default) drains the currently-available input
    and terminates — the backfill/test trigger; pass False for a
    long-running continuous query. Returns the started StreamingQuery
    (callers own ``awaitTermination``).
    """

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        er_fold_batch(
            batch_df, batch_id, workdir,
            id_col=id_col, text_col=text_col, **pipeline_kw,
        )

    writer = (
        docs_stream.writeStream
        .foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
