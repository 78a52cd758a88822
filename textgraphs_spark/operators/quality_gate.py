"""Data-quality gate: declarative column rules → ONE scan pass.

Every rule compiles to a conditional aggregate over the same scan, so a
gate with 50 rules still reads the table exactly once (map-side partial
aggregation, no shuffle beyond the final 1-row combine). This is the
ingest guard a training-data pipeline runs before anything else touches
a batch: fail fast on schema drift, nulls, or out-of-range values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F


def violation_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """rules = {rule_name: violation_condition} → one row of counts.

    A rule's Column is TRUE when the row VIOLATES it. NULL conditions
    count as violations (unknown is not acceptable at an ingest gate).
    """
    aggs = [
        # coalesce(sum, 0): F.sum over zero rows is NULL — an empty batch
        # must gate cleanly (0 violations), not crash the ratio check
        F.coalesce(
            F.sum(F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0)),
            F.lit(0),
        ).alias(name)
        for name, cond in rules.items()
    ]
    return df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)


def gate(df: DataFrame, rules: dict[str, Column], *,
         max_violation_ratio: float = 0.0) -> Row:
    """Evaluate rules; raise if any rule's violation ratio exceeds the
    budget. Returns the counts row on success."""
    row = violation_counts(df, rules).collect()[0]
    n = row["n_rows"] or 1
    failed = {
        name: row[name] for name in rules
        if row[name] / n > max_violation_ratio
    }
    if failed:
        raise ValueError(f"quality gate failed: {failed} of {n} rows")
    return row


def document_rules() -> dict[str, Column]:
    """Standard rules for the pages/documents shape."""
    return {
        "null_text": F.col("text").isNull(),
        "empty_text": F.length(F.coalesce(F.col("text"), F.lit(""))) == 0,
        "bad_lang": ~F.coalesce(F.col("lang"), F.lit("")).rlike("^[a-z]{2,3}$"),
        "text_too_long": F.length(F.col("text")) > 1_000_000,
    }
