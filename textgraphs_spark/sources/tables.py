"""Table-format abstraction: Iceberg when available, parquet otherwise.

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar, so every reader/writer in the engine goes through this seam. On a
real cluster set SPARK_GRAFT_TABLE_FORMAT=iceberg (and configure the
catalog in the session) and all stage checkpoints, lineage tables, and
inputs become Iceberg tables with no code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_FORMAT = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def read_table(spark: SparkSession, path_or_name: str) -> DataFrame:
    if TABLE_FORMAT == "iceberg":
        return spark.read.format("iceberg").load(path_or_name)
    return spark.read.parquet(path_or_name)


def write_table(df: DataFrame, path_or_name: str, *, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if TABLE_FORMAT == "iceberg":
        writer.format("iceberg").save(path_or_name)
    else:
        writer.parquet(path_or_name)
