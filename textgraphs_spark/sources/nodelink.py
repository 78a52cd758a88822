"""Node-link JSON dump/load for lemma-graph tables.

Mirrors the reference's serialization contract (reference:
textgraphs/graph.py:236-296 dump, 299-392 load): the node-link property
names (``lemma, count, weight, kind, label, name, subobj, pos, loc,
length, hood, anno, iri``; links: ``kind, title, lemma, weight, prob,
count, source, target``) are the de-facto schema. The reference uses this
round-trip as its own checkpoint/resume mechanism (tests/test_load.py) —
here it doubles as the interchange format with the reference ecosystem,
while parquet checkpoints remain the at-scale resume path.

Two modes:
* ``dump_node_link`` / ``load_node_link`` — distributed: one JSON *line*
  per node/edge (spark.read.json-able), for corpus-level tables.
* ``dump_node_link_doc`` — single self-contained document (sorted keys),
  byte-stable, for small graphs / parity tests with the reference format.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _node_props(nodes: DataFrame) -> DataFrame:
    """Project the corpus node table into node-link property names."""
    iri = (
        F.when(F.col("kind") == "iri", F.col("node_key"))
        .when(F.col("label").startswith("http"), F.col("label"))
        .otherwise(F.lit(None))
    )
    label = (
        F.when(F.col("kind") == "dep", F.lit(""))
        .otherwise(F.coalesce("surface", F.lit("")))
    )
    return nodes.select(
        F.col("node_id").alias("id"),
        F.col("node_key").alias("lemma"),
        F.col("surface").alias("name"),
        "kind",
        label.alias("label"),
        F.col("pos"),
        F.col("count"),
        F.coalesce(F.col("weight"), F.lit(0.0)).alias("weight"),
        F.col("length"),
        F.coalesce(F.col("neighbors"), F.lit(0)).alias("hood"),
        F.col("sub_obj").alias("subobj"),
        F.coalesce(F.col("annotated"), F.lit(False)).alias("anno"),
        F.coalesce(F.col("loc_str"), F.lit("[]")).alias("loc") if "loc_str" in nodes.columns else F.lit("[]").alias("loc"),
        iri.alias("iri"),
    )


def _edge_props(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.col("src_id").alias("source"),
        F.col("dst_id").alias("target"),
        "kind",
        F.col("rel").alias("title"),
        F.concat_ws(
            ".", F.col("src_id"), F.col("dst_id"),
            F.regexp_replace("rel", " ", "_"), F.col("kind"),
        ).alias("lemma"),
        F.col("count").cast("double").alias("weight"),
        "prob",
        "count",
    )


def dump_node_link(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """Distributed dump: <path>/nodes and <path>/links as JSON lines."""
    _node_props(nodes).write.mode("overwrite").json(f"{path}/nodes")
    _edge_props(edges).write.mode("overwrite").json(f"{path}/links")


def load_node_link(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    return spark.read.json(f"{path}/nodes"), spark.read.json(f"{path}/links")


def dump_node_link_doc(nodes_rows: list[dict], edges_rows: list[dict]) -> str:
    """Single node-link JSON document, key-sorted and byte-stable
    (graph.py:280-296 formatting: sort_keys, indent=2, separators)."""
    doc = {
        "directed": True,
        "multigraph": True,
        "nodes": nodes_rows,
        "links": edges_rows,
        "graph": {},
    }
    return json.dumps(doc, sort_keys=True, indent=2, separators=(",", ":"))


def load_node_link_doc(json_str: str) -> tuple[list[dict], list[dict]]:
    dat = json.loads(json_str)
    return dat.get("nodes", []), dat.get("links", [])
