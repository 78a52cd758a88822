"""Graph-of-relations (InGram) topological transform + affinity scores.

Distributed reimplementation of the reference's GraphOfRelations
(reference: textgraphs/gor.py:93-451), which reproduces the affinity-score
example from "INGRAM: Inductive Knowledge Graph Embedding via Relation
Graphs" (arXiv:2305.19987). The reference builds nested Counter objects in
memory; here the same quantities are plain aggregations:

1. **seeds** (gor.py:197-238): every edge decomposes into two sheaf seeds —
   (dst, rel, HEAD) and (src, rel, TAIL). A DataFrame union of two
   projections.
2. **transformed arcs** (gor.py:275-308): unordered pairs of distinct seed
   instances at the same node. As ordered pairs (each unordered pair seen
   from both sides — exactly the two Counter increments per combination in
   gor.py:332-345), this is a self-join on node_id.
3. **tallies** (gor.py:348-398): tally(dir_a, rel_a, rel_b) =
   count(pairs) + countDistinct(node) — "how frequently they share" plus
   "how many entities are shared".
4. **affinity** (gor.py:401-451): for a <= b,
       score(a,b) = ( (T(HEAD,b,a) + T(TAIL,b,a)) / S(a)
                    + (T(TAIL,a,b) + T(HEAD,a,b)) / S(b) ) / 2
   where S(r) = total tally of relation r over both directions.

Every step is a builtin join/agg — Catalyst plans partial aggregation and
broadcast joins (the relation-totals side is tiny) without help.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seeds(triples: DataFrame, *, src: str = "src", rel: str = "rel", dst: str = "dst") -> DataFrame:
    """triples → sheaf seeds (node_id, rel, dir), one row per edge endpoint."""
    head = triples.select(
        F.col(dst).alias("node_id"), F.col(rel).alias("rel"),
        F.lit("head").alias("dir"),
    )
    tail = triples.select(
        F.col(src).alias("node_id"), F.col(rel).alias("rel"),
        F.lit("tail").alias("dir"),
    )
    return head.unionByName(tail)


def pair_tallies(seed_df: DataFrame) -> DataFrame:
    """tally(dir_a, rel_a, rel_b) = pair count + distinct shared nodes.

    The reference enumerates seed-instance pairs per node
    (itertools.combinations, gor.py:289-308) — a self-join that
    materializes degree² rows per node and melts on hub nodes (a nation
    with 10k incident edges would emit 10^8 pairs). Equivalent closed
    form on per-node counts instead: with c_a = |seeds(n, rel_a, dir_a)|
    and c_b = |seeds(n, rel_b, *)|, the pair count at n is
    ``c_a * (c_b - [rel_a = rel_b])`` (each a-instance excludes exactly
    itself from b's pool when the relations coincide). The join is then
    (#distinct (rel, dir) per node)² — relation-schema-sized, not
    degree-sized.
    """
    c = seed_df.groupBy("node_id", "rel", "dir").agg(F.count("*").alias("c"))
    a = c.select(
        "node_id", F.col("rel").alias("rel_a"),
        F.col("dir").alias("dir_a"), F.col("c").alias("c_a"),
    )
    b = c.groupBy("node_id", F.col("rel").alias("rel_b")).agg(
        F.sum("c").alias("c_b")
    )
    pc = F.col("c_a") * (
        F.col("c_b")
        - F.when(F.col("rel_a") == F.col("rel_b"), F.lit(1)).otherwise(F.lit(0))
    )
    per_node = a.join(b, "node_id").withColumn("pc", pc).filter(F.col("pc") > 0)
    # rows are unique per (node, rel_a, dir_a, rel_b) => count(*) is the
    # distinct-shared-nodes term
    return per_node.groupBy("dir_a", "rel_a", "rel_b").agg(
        (F.sum("pc") + F.count("*")).alias("tally")
    )


def affinity_scores(triples: DataFrame, *, src: str = "src", rel: str = "rel", dst: str = "dst") -> DataFrame:
    """→ (rel_a, rel_b, affinity) for rel_a <= rel_b, affinity > 0."""
    t = pair_tallies(seeds(triples, src=src, rel=rel, dst=dst))

    totals = t.groupBy(F.col("rel_a").alias("rel")).agg(F.sum("tally").alias("s"))

    # T(r1, r2) = head + tail tallies per ordered relation pair
    tt = t.groupBy("rel_a", "rel_b").agg(F.sum("tally").alias("t"))

    # score(a,b) uses T(b, a) / S(a) + T(a, b) / S(b)
    ab = tt.select(F.col("rel_b").alias("ra"), F.col("rel_a").alias("rb"), F.col("t").alias("t_b_a"))
    ba = tt.select(F.col("rel_a").alias("ra"), F.col("rel_b").alias("rb"), F.col("t").alias("t_a_b"))
    joined = (
        ab.join(ba, ["ra", "rb"], "outer")
        .na.fill(0, ["t_b_a", "t_a_b"])
        .join(F.broadcast(totals.withColumnRenamed("rel", "ra").withColumnRenamed("s", "s_a")), "ra")
        .join(F.broadcast(totals.withColumnRenamed("rel", "rb").withColumnRenamed("s", "s_b")), "rb")
        .withColumn("affin", (F.col("t_b_a") / F.col("s_a") + F.col("t_a_b") / F.col("s_b")) / 2.0)
    )
    return (
        joined.filter(F.col("ra") <= F.col("rb"))
        .filter(F.col("affin") > 0)
        .select(
            F.col("ra").alias("rel_a"), F.col("rb").alias("rel_b"),
            F.col("affin").alias("affinity"),
        )
        .orderBy("rel_a", "rel_b")
    )


def affinity_oracle_sql(triples_sql: str) -> str:
    """ANSI-SQL equivalent (DuckDB-ready) of ``affinity_scores`` over a
    triples relation given by ``triples_sql`` (src, rel, dst columns)."""
    return f"""
WITH triples AS ({triples_sql}),
numbered AS (
  SELECT row_number() OVER (ORDER BY src, rel, dst) AS edge_id, src, rel, dst FROM triples
),
seeds AS (
  SELECT dst AS node_id, rel, 'head' AS dir, edge_id * 2 AS seed_idx FROM numbered
  UNION ALL
  SELECT src AS node_id, rel, 'tail' AS dir, edge_id * 2 + 1 AS seed_idx FROM numbered
),
tallies AS (
  SELECT a.dir AS dir_a, a.rel AS rel_a, b.rel AS rel_b,
         count(*) + count(DISTINCT a.node_id) AS tally
  FROM seeds a JOIN seeds b ON a.node_id = b.node_id AND a.seed_idx <> b.seed_idx
  GROUP BY 1, 2, 3
),
totals AS (
  SELECT rel_a AS rel, sum(tally) AS s FROM tallies GROUP BY 1
),
tt AS (
  SELECT rel_a, rel_b, sum(tally) AS t FROM tallies GROUP BY 1, 2
),
joined AS (
  SELECT coalesce(ab.rel_b, ba.rel_a) AS ra,
         coalesce(ab.rel_a, ba.rel_b) AS rb,
         coalesce(ab.t, 0) AS t_b_a,
         coalesce(ba.t, 0) AS t_a_b
  FROM tt ab FULL OUTER JOIN tt ba
    ON ab.rel_b = ba.rel_a AND ab.rel_a = ba.rel_b
)
SELECT j.ra AS rel_a, j.rb AS rel_b,
       (j.t_b_a / sa.s + j.t_a_b / sb.s) / 2.0 AS affinity
FROM joined j
JOIN totals sa ON sa.rel = j.ra
JOIN totals sb ON sb.rel = j.rb
WHERE j.ra <= j.rb AND (j.t_b_a / sa.s + j.t_a_b / sb.s) > 0
ORDER BY 1, 2
"""
