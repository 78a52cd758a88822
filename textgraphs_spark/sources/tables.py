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


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    *,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed on its join key.

    Two tables bucketed on the same key with the same bucket count join
    with NO Exchange on either side — the scan itself satisfies the hash
    distribution requirement. This is the pre-shuffle pattern for fact
    tables that are joined repeatedly on one key at 100 TB: pay the
    shuffle once at write time, never again at read time.
    """
    if TABLE_FORMAT == "iceberg":
        # v1 bucketBy would map to an Iceberg bucket TRANSFORM (different
        # hash function, no reported hash distribution), so the join
        # would still shuffle; Iceberg's shuffle-free path is a
        # storage-partitioned join, which needs catalog + SPJ session
        # configs this seam does not manage. Refuse loudly rather than
        # silently losing the property this function promises.
        raise NotImplementedError(
            "write_bucketed guarantees a shuffle-free co-located join only "
            "for the parquet/Hive bucketing format; for Iceberg use a "
            "bucket partition transform + storage-partitioned-join configs"
        )
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)
