"""Streaming SCD-1 compaction: stream == batch parity across
multi-file micro-batches."""

from pyspark.sql import functions as F

from textgraphs_spark.operators.webdata import latest_captures
from textgraphs_spark.sources.pages import capture_pages
from textgraphs_spark.streaming.compaction import stream_latest_captures
from textgraphs_spark.streaming.events import run_available_now


def test_stream_latest_matches_batch(spark, tmp_path):
    src = str(tmp_path / "caps")
    caps = capture_pages(spark, 60, 5)
    # spread each url's captures across files so the argmax must merge
    # across micro-batches (maxFilesPerTrigger=1 -> one file per batch)
    caps.repartition(6).write.parquet(src)
    stream = (
        spark.readStream.schema(caps.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    run_available_now(
        stream_latest_captures(stream),
        checkpoint=str(tmp_path / "ck"),
        table_name="scd1_out",
        output_mode="update",
    )
    emitted = spark.table("scd1_out")
    # updates are monotone in (ts, doc_id, text), so the final emission
    # per url is the max emitted tuple
    final = (
        emitted.groupBy("url")
        .agg(F.max(F.struct("warc_ts", "doc_id", "text")).alias("b"))
        .select("url", "b.warc_ts", "b.doc_id", "b.text")
    )
    want = latest_captures(caps).select("url", "warc_ts", "doc_id", "text")
    got = {tuple(r) for r in final.collect()}
    exp = {tuple(r) for r in want.collect()}
    assert got == exp
    # the multi-batch path actually ran: some url was updated more than
    # once (6 random file splits over 5 captures/url make this certain
    # for at least one of 60 urls)
    assert emitted.count() > final.count()
