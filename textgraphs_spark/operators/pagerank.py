"""Corpus-level PageRank via iterative joins.

The reference ranks per-document graphs with networkx PageRank
(reference: textgraphs/doc.py:927-933, alpha = 0.85, defaults.py:31). At
corpus scale the aggregated lemma graph no longer fits one machine, so the
north star mandates "GraphFrames/iterative-join PageRank". GraphFrames is
not guaranteed present, so this is the self-contained iterative-join form
with identical semantics (weighted edges, uniform teleport, dangling mass
redistributed uniformly, L1 convergence):

    contribs = ranks ⋈ edges on src  →  groupBy(dst).sum(rank * w / out_w)
    rank'    = (1-α)/N + α * (contrib + dangling_mass / N)

Scale discipline:
* edges are pre-aggregated per (src, dst) and repartitioned by src ONCE —
  every iteration's join reuses that partitioning (one shuffle per round
  for the groupBy(dst), none for the join side);
* ranks localCheckpoint every iteration to truncate lineage;
* ONE Spark job per iteration: the dangling mass rides along as a
  broadcast 1-row cross join (no driver scalar round-trip), the old rank
  is carried through the update join, and the single L1-delta agg both
  materializes the lazily-checkpointed new ranks and decides convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "weight",
    alpha: float = 0.85,
    max_iter: int = 30,
    tol: float = 1.0e-6,
) -> DataFrame:
    """edges(src, dst[, weight]) → (node, rank); ranks sum to 1."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # normalized transition edges, partitioned by src once and reused
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .repartition("src")
        .localCheckpoint()
    )
    has_out = out_w.select(F.col("src").alias("node")).localCheckpoint()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iter):
        # dangling mass as a broadcast 1-row frame: the scalar stays on
        # the executors instead of a .collect() round-trip per iteration
        dangling_df = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        )
        contribs = (
            ranks.join(trans, ranks["node"] == trans["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("contrib"))
        )
        # joining ranks (not nodes) carries the old rank through, so the
        # L1 delta needs no second self-join; eager=False defers the
        # checkpoint to the delta agg below — ONE job per iteration
        new_ranks = (
            ranks.select("node", F.col("rank").alias("old_rank"))
            .join(contribs, F.col("node") == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "node",
                "old_rank",
                (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha) * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dangling") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        delta = (
            new_ranks.agg(F.sum(F.abs(F.col("rank") - F.col("old_rank"))))
            .collect()[0][0]
        )
        ranks = new_ranks.select("node", "rank")
        if delta is not None and delta < n * tol:
            break
    return ranks.select("node", "rank")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "weight",
    alpha: float = 0.85,
    max_iter: int = 30,
    tol: float = 1.0e-6,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns to ``seeds`` (a
    DataFrame with a ``node`` column) instead of uniformly — the
    random-walk-with-restart relevance score around a query entity set,
    the standard graph signal for entity disambiguation and related-
    entity retrieval (which candidate cluster is "close to" the seed
    mentions in the lemma graph).

    Semantics: s_v = 1/|S| on seeds present in the graph, 0 elsewhere;
    r0 = s; r' = (1-alpha)*s + alpha*(A^T r + dangling_mass * s) —
    dangling mass restarts at the seeds like every other walk
    termination. Same execution discipline as ``pagerank``: transition
    edges normalized and partitioned once, ONE Spark job per iteration
    (broadcast 1-row dangling frame, delta agg materializes the lazy
    checkpoint), L1 early stop at n*tol.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    in_graph_seeds = (
        nodes.join(seeds.select("node").distinct(), "node", "left_semi")
        .localCheckpoint()
    )
    ns = in_graph_seeds.count()
    if ns == 0:
        raise ValueError("no seed node is present in the graph")

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .repartition("src")
        .localCheckpoint()
    )
    has_out = out_w.select(F.col("src").alias("node")).localCheckpoint()

    # the reset vector rides inside the rank frame (node, s, rank) so no
    # iteration re-joins the seed table
    svec = (
        nodes.join(
            in_graph_seeds.withColumn("_seed", F.lit(1.0)), "node", "left"
        )
        .select(
            "node",
            F.coalesce(F.col("_seed") / F.lit(float(ns)), F.lit(0.0)).alias("s"),
        )
    )
    ranks = svec.withColumn("rank", F.col("s")).localCheckpoint()
    for _ in range(max_iter):
        dangling_df = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        )
        contribs = (
            ranks.join(trans, ranks["node"] == trans["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("contrib"))
        )
        new_ranks = (
            ranks.select("node", "s", F.col("rank").alias("old_rank"))
            .join(contribs, F.col("node") == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "node",
                "s",
                "old_rank",
                (
                    F.lit(1.0 - alpha) * F.col("s")
                    + F.lit(alpha) * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dangling") * F.col("s")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        delta = (
            new_ranks.agg(F.sum(F.abs(F.col("rank") - F.col("old_rank"))))
            .collect()[0][0]
        )
        ranks = new_ranks.select("node", "s", "rank")
        if delta is not None and delta < n * tol:
            break
    return ranks.select("node", "rank")


def hits(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 8,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) by iterative joins over
    the directed (deduplicated, unweighted) edge set: each round
    authority(v) = Σ hub(u) over in-edges u→v, then hub(u) = Σ auth(v)
    over out-edges, each L2-normalized — the companion centrality to
    PageRank that separates CITED-BY-GOOD-HUBS from POINTING-AT-GOOD-
    AUTHORITIES, which a symmetric measure conflates. On the lemma
    graph: heads of frequent relations surface as authorities, prolific
    modifiers as hubs.

    Fixed ``max_iter`` rounds (no adaptive stop) so the unrolled SQL
    oracle is step-identical; same per-round discipline as pagerank
    (edge frame checkpointed once, score frames checkpointed per round
    to truncate lineage, norms ride as broadcast 1-row cross joins —
    no driver scalar round-trip). Scale: two keyed shuffles per round
    on (src)/(dst), score frames vocabulary-sized.

    Returns (node, authority, hub), both rounded to 6.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.withColumn("hub", F.lit(1.0))
    auth = nodes.withColumn("auth", F.lit(0.0))
    for _ in range(max_iter):
        a_raw = (
            hub.join(e, hub["node"] == e["src"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("v"))
        )
        a_norm = a_raw.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("s"))
        auth = (
            nodes.join(a_raw.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(a_norm))
            .select(
                "node", (F.coalesce(F.col("v"), F.lit(0.0)) / F.col("s")).alias("auth")
            )
            .localCheckpoint()
        )
        h_raw = (
            auth.join(e, auth["node"] == e["dst"])
            .groupBy("src")
            .agg(F.sum("auth").alias("v"))
        )
        h_norm = h_raw.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("s"))
        hub = (
            nodes.join(h_raw.withColumnRenamed("src", "node"), "node", "left")
            .crossJoin(F.broadcast(h_norm))
            .select(
                "node", (F.coalesce(F.col("v"), F.lit(0.0)) / F.col("s")).alias("hub")
            )
            .localCheckpoint()
        )
    return auth.join(hub, "node").select(
        "node", F.round("auth", 6).alias("authority"), F.round("hub", 6).alias("hub")
    )
