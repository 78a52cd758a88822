"""Table-format abstraction: Iceberg when available, parquet otherwise.

The north rule targets Iceberg tables. This sandbox ships NO Iceberg
runtime jar (and has no network to fetch one), so parquet is the
declared sandbox substitute — see SURVEY §1.4/§7.1. Every stage
checkpoint, lineage/metrics write, and resume read in the engine goes
through THIS seam (plans/er_pipeline.py uses read_table/write_table/
stage_exists exclusively): on a real cluster set
``SPARK_GRAFT_TABLE_FORMAT=iceberg`` and configure an Iceberg catalog in
the session, and the whole pipeline's storage layer switches with no
code changes. When the env var requests Iceberg but the runtime is
absent, the seam fails LOUDLY at first use with a setup message instead
of a ClassNotFound stack five stages deep.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_format() -> str:
    """Current format, read dynamically so tests/jobs can switch it."""
    return os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


# kept for callers that imported the old constant
TABLE_FORMAT = table_format()


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def _require_iceberg(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "SPARK_GRAFT_TABLE_FORMAT=iceberg but no Iceberg runtime is on "
            "the classpath — add the iceberg-spark-runtime jar and an "
            "Iceberg catalog config to the session, or unset the env var "
            "to use the parquet substitute"
        )


def read_table(spark: SparkSession, path_or_name: str) -> DataFrame:
    if table_format() == "iceberg":
        _require_iceberg(spark)
        return spark.read.format("iceberg").load(path_or_name)
    return spark.read.parquet(path_or_name)


def write_table(df: DataFrame, path_or_name: str, *, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if table_format() == "iceberg":
        _require_iceberg(df.sparkSession)
        writer.format("iceberg").save(path_or_name)
    else:
        writer.parquet(path_or_name)


def stage_exists(spark: SparkSession, path_or_name: str) -> bool:
    """Has a prior run completed this stage? (the resume probe)

    parquet: the _SUCCESS marker (local paths via os, DFS paths via the
    Hadoop FS API). Iceberg: the table loads — Iceberg commits are
    atomic, so a loadable table IS a completed write.
    """
    if table_format() == "iceberg":
        _require_iceberg(spark)
        try:
            spark.read.format("iceberg").load(path_or_name).schema
            return True
        except Exception:
            return False
    marker = os.path.join(path_or_name, "_SUCCESS")
    if "://" not in path_or_name:
        return os.path.exists(marker)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(marker)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def drop_stage(spark: SparkSession, path_or_name: str) -> None:
    """Remove a stale stage output (any Hadoop filesystem)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_or_name)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        fs.delete(p, True)


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
    if table_format() == "iceberg":
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
