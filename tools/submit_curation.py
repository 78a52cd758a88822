#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation pipeline.

    zip -qr /tmp/tgs.zip textgraphs_spark
    spark-submit --py-files /tmp/tgs.zip tools/submit_curation.py \
        --input <documents parquet/iceberg path> \
        --workdir <checkpoint root> \
        [--sample-fraction 0.1] [--threshold 0.7] [--langs en,de]

The session comes from the cluster (spark-submit provides master/
executors); re-running with the same --workdir resumes from the last
completed stage (near_dups → verdicts → kept_docs → shard).
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
    ap.add_argument("--input", help="documents table path (parquet/iceberg)")
    ap.add_argument("--workdir", required=True, help="checkpoint + output root")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of reading --input")
    ap.add_argument("--langs", default="en",
                    help="comma-separated keep languages (default: en)")
    ap.add_argument("--quality-min", type=float, default=0.76)
    ap.add_argument("--threshold", type=float, default=0.7,
                    help="MinHash Jaccard threshold for the near-dup gate")
    ap.add_argument("--sample-fraction", type=float, default=None,
                    help="also emit a reproducible training shard of the keeps")
    ap.add_argument("--boilerplate-min-df", type=int, default=None,
                    help="also emit clean_docs: strip exact lines shared "
                         "by >= this many kept docs (C4-style)")
    ap.add_argument("--max-pii-per-10k", type=float, default=None,
                    help="drop docs whose PII density (hits per 10k chars) "
                         "exceeds this bound (extra 'pii' verdict gate)")
    ap.add_argument("--redact-pii", action="store_true",
                    help="also emit redacted_docs: typed-placeholder PII "
                         "redaction over the final curated text")
    ap.add_argument("--shuffle-partitions", type=int, default=0,
                    help="spark.sql.shuffle.partitions (0 = cluster default)")
    args = ap.parse_args()
    if not args.input and not args.synthetic:
        ap.error("either --input <documents path> or --synthetic N is required")

    builder = (
        SparkSession.builder.appName("textgraphs_spark_curation")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from textgraphs_spark.plans.curation_pipeline import CurationPipeline

    if args.synthetic:
        from textgraphs_spark.sources.pages import synth_pages

        docs = synth_pages(spark, args.synthetic).select(
            F.xxhash64("url").alias(args.id_col),
            F.col("text").alias(args.text_col),
        )
    else:
        docs = spark.read.parquet(args.input)

    pipe = CurationPipeline(
        spark, workdir=args.workdir,
        langs=tuple(args.langs.split(",")),
        quality_min=args.quality_min,
        sample_fraction=args.sample_fraction,
        boilerplate_min_df=args.boilerplate_min_df,
        max_pii_per_10k=args.max_pii_per_10k,
        redact_pii=args.redact_pii,
        threshold=args.threshold,
    )
    out = pipe.run(docs, id_col=args.id_col, text_col=args.text_col)
    reasons = {
        r["reason"]: r["n"]
        for r in out["verdicts"].groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    kept = out["kept_docs"].count()
    shard = out["shard"].count() if "shard" in out else None
    line = f"curated: kept {kept} docs; drops by reason: " + ", ".join(
        f"{k}={v}" for k, v in sorted(reasons.items()) if k != "keep"
    )
    if "clean_docs" in out:
        n_rm = out["clean_docs"].agg(F.sum("n_removed")).collect()[0][0] or 0
        line += f"; stripped {n_rm} boilerplate lines"
    if "redacted_docs" in out:
        n_red = out["redacted_docs"].agg(F.sum("n_redacted")).collect()[0][0] or 0
        line += f"; redacted {n_red} PII spans"
    if shard is not None:
        line += f"; shard {shard} docs"
    print(line + f"; stages at {args.workdir}")


if __name__ == "__main__":
    main()
