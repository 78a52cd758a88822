"""InGram-format JSON graph source.

Mirrors the reference loader (reference: textgraphs/gor.py:125-194): the
file carries an ordered relation list, per-source-entity (rel, dst) link
lists, and published expected pair scores. Loaded into a triples DataFrame
plus an expected-scores DataFrame.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def load_ingram(spark: SparkSession, json_path: str) -> dict:
    with open(json_path, "r", encoding="utf-8") as fp:
        dat = json.load(fp)
    rels: list[str] = dat["rels"]
    triples = [
        (src, rel_name, dst)
        for src, links in dat["ents"].items()
        for rel_name, dst in links
    ]
    triples_df = spark.createDataFrame(triples, ["src", "rel", "dst"])
    scores_df: DataFrame | None = None
    if "scores" in dat:
        scores_df = spark.createDataFrame(
            [(int(a), int(b), float(s)) for a, b, s in dat["scores"]],
            ["rel_a_id", "rel_b_id", "expected"],
        )
    return {"rels": rels, "triples": triples_df, "expected": scores_df}
