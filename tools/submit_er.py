#!/usr/bin/env python
"""spark-submit entry point for the entity-resolution pipeline.

    zip -qr /tmp/tgs.zip textgraphs_spark
    spark-submit --py-files /tmp/tgs.zip tools/submit_er.py \
        --input <pages parquet/iceberg path> \
        --workdir <checkpoint root> \
        [--text-col text] [--id-col url] [--synthetic N]

The session comes from the cluster (spark-submit provides master/executors);
re-running with the same --workdir resumes from the last completed stage.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# allow running from the repo without --py-files (local dev)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (parquet/iceberg)")
    ap.add_argument("--workdir", required=True, help="checkpoint + output root")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of reading --input")
    ap.add_argument("--include-lemmas", action="store_true")
    ap.add_argument("--update", action="store_true",
                    help="treat the input as a NEW batch and fold it into "
                         "the existing clustering in --workdir")
    ap.add_argument("--shuffle-partitions", type=int, default=0,
                    help="spark.sql.shuffle.partitions (0 = cluster default; "
                         "size to ~2-3x total executor cores at the target SF)")
    args = ap.parse_args()
    if not args.input and not args.synthetic:
        ap.error("either --input <pages path> or --synthetic N is required")

    builder = (
        SparkSession.builder.appName("textgraphs_spark_er")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from textgraphs_spark.plans.er_pipeline import ERPipeline, cluster_summary

    if args.synthetic:
        from textgraphs_spark.sources.pages import synth_pages

        pages = synth_pages(spark, args.synthetic).drop("truth")
    else:
        pages = spark.read.parquet(args.input)

    docs = pages.select(
        F.xxhash64(args.id_col).alias("doc_id"), F.col(args.text_col).alias("text")
    )
    pipe = ERPipeline(spark, workdir=args.workdir, include_lemmas=args.include_lemmas)
    if args.update:
        # incremental: fold this batch into the clustering already in the
        # workdir (only pairs touching new surface forms are scored)
        assignments = pipe.update(docs)
    else:
        assignments = pipe.run(docs)["clusters"]
    summary = cluster_summary(assignments)
    summary.write.mode("overwrite").parquet(f"{args.workdir}/cluster_summary")
    print(f"clusters: {assignments.count()} entities; "
          f"summary at {args.workdir}/cluster_summary")


if __name__ == "__main__":
    main()
