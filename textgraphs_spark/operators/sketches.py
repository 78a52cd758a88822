"""Mergeable sketches: the at-scale pattern for distinct counts.

At 100 TB you never compute ``countDistinct`` across the whole table in
one shot — you aggregate a mergeable sketch per partition/day/segment
(Datasketches HLL, built into Spark >= 3.5 as ``hll_sketch_agg``) and
union the sketches at rollup time. The sketch column is a few KB
regardless of cardinality, so daily sketches can be stored alongside the
data and re-aggregated over arbitrary date ranges without rescanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_distinct_sketches(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 14,
) -> DataFrame:
    """Per-day HLL sketch + estimate of distinct ``key_col`` values.

    The ``sketch`` column is reusable state: persist it and later ranges
    roll up via ``rollup_distinct`` with no rescan of the raw events.

    lg_k=14 (16 KB dense): the Datasketches sparse mode keeps estimates
    EXACT well past the per-day cardinalities of the test corpus at both
    sf0.01 and sf0.1 (lg_k=12 already drifted by ~0.15% at ~1.3k distinct
    keys/day); at real scale the estimate is approximate by design and
    the relative error is ~1.04/sqrt(2^lg_k) ≈ 0.8%.
    """
    return (
        events.groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(
            F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
            F.count("*").alias("n_events"),
        )
        .withColumn("distinct_est", F.hll_sketch_estimate("sketch"))
    )


def rollup_distinct(daily: DataFrame) -> DataFrame:
    """Union daily sketches → one distinct-count estimate for the range."""
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_est"),
        F.sum("n_events").alias("n_events"),
        F.count("*").alias("n_days"),
    )
