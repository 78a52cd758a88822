"""Graph operators beyond PageRank/CC: distance-gated entity pairs and
community detection.

* ``entity_pairs_within_distance`` — the reference's relation-extraction
  candidate gate: entity pairs whose undirected shortest-path distance in
  the doc's lemma graph is <= max_skip (reference: textgraphs/pipe.py:
  379-431, defaults.py:22 max_skip=11). Per-doc graphs are tiny, so the
  BFS runs inside the extraction UDF batch — no corpus-level shuffle at
  all, mirroring the reference's own per-chunk scoping.
* ``label_propagation`` — community detection stand-in for the
  reference's Girvan-Newman visualization clustering (textgraphs/vis.py:
  189-204), as iterative joins: each round every node adopts the most
  common label among its neighbors (ties -> smaller label; deterministic).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAIR_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("src_key", T.StringType()),
    T.StructField("dst_key", T.StringType()),
    T.StructField("distance", T.IntegerType()),
])

MAX_SKIP = 11  # reference defaults.py:22


def entity_pairs_within_distance(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    *, max_skip: int = MAX_SKIP,
) -> DataFrame:
    """Per-doc entity pairs with lemma-graph distance <= max_skip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import deque

        from ..doclevel.build import build_doc_graph

        for pdf in batches:
            out = []
            for r_id, r_text in zip(pdf[id_col], pdf[text_col]):
                g = build_doc_graph(r_text if r_text is not None else "")
                ents = [nd for nd in g.nodes.values() if nd.kind == "ent"]
                if len(ents) < 2:
                    continue
                adj: dict[int, set[int]] = {}
                for e in g.edges.values():
                    adj.setdefault(e.src, set()).add(e.dst)
                    adj.setdefault(e.dst, set()).add(e.src)
                # BFS from each entity (graphs are tens of nodes)
                for a in ents:
                    dist = {a.node_id: 0}
                    q = deque([a.node_id])
                    while q:
                        u = q.popleft()
                        if dist[u] >= max_skip:
                            continue
                        for v in adj.get(u, ()):
                            if v not in dist:
                                dist[v] = dist[u] + 1
                                q.append(v)
                    for b in ents:
                        if b.node_id != a.node_id and b.node_id in dist:
                            # path length in nodes (reference counts path
                            # nodes, pipe.py:412-425) = edges + 1
                            if dist[b.node_id] + 1 <= max_skip:
                                out.append({
                                    "doc_id": int(r_id),
                                    "src_key": a.key,
                                    "dst_key": b.key,
                                    "distance": dist[b.node_id],
                                })
            yield pd.DataFrame(out, columns=[f.name for f in PAIR_SCHEMA.fields])

    return docs.select(id_col, text_col).mapInPandas(run, schema=PAIR_SCHEMA)


def label_propagation(
    edges: DataFrame, *, src: str = "src", dst: str = "dst",
    max_iter: int = 5,
) -> DataFrame:
    """Community labels via synchronous label propagation (iterative joins).

    Deterministic: tie-break on (count desc, label asc). Each round is one
    groupBy over the undirected adjacency — the same shuffle shape as
    PageRank, safe at any scale.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = und.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()
    for _ in range(max_iter):
        neigh = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy("a", "label")
            .agg(F.count("*").alias("n"))
        )
        best = (
            neigh.groupBy("a")
            .agg(F.max_by(F.struct("label", "n"), F.struct(F.col("n"), -F.col("label"))).alias("bl"))
            .select(F.col("a").alias("node"), F.col("bl.label").alias("label"))
        )
        labels = best.localCheckpoint()
    return labels
