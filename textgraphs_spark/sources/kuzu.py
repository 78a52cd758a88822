"""KuzuDB CSV sink.

Mirrors the reference's Kùzu export (reference: textgraphs/doc.py:1215-1353):
nodes.csv with (id, iri, label, kind) for non-verb ENT/LEM + IRI nodes, and
edges.csv with (src, dst, rel, prob, count). The reference zips driver-side;
at scale we write partitioned CSV directories plus a small DDL file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DDL = """CREATE NODE TABLE Entity(id STRING, iri STRING, label STRING, kind STRING, PRIMARY KEY (id));
CREATE REL TABLE Relation(FROM Entity TO Entity, rel STRING, prob DOUBLE, count INT64);
"""


def export_kuzu(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    node_sel = (
        nodes.filter(
            (F.col("kind") == "iri")
            | (F.col("kind").isin("ent", "lem") & (F.col("pos") != "VERB"))
        )
        .select(
            F.col("node_key").alias("id"),
            F.when(F.col("kind") == "iri", F.col("node_key"))
            .when(F.col("label").startswith("http"), F.col("label"))
            .otherwise(F.lit(None)).alias("iri"),
            F.coalesce("surface", F.col("node_key")).alias("label"),
            "kind",
        )
    )
    edge_sel = edges.select(
        F.col("src_key").alias("src"),
        F.col("dst_key").alias("dst"),
        "rel",
        "prob",
        "count",
    )
    node_sel.write.mode("overwrite").option("header", True).csv(os.path.join(path, "nodes"))
    edge_sel.write.mode("overwrite").option("header", True).csv(os.path.join(path, "edges"))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "schema.ddl"), "w", encoding="utf-8") as fp:
        fp.write(DDL)
