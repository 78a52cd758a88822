"""Transitive clustering: connected components via large-star/small-star.

The reference implies transitive closure over equivalence edges — mentions
linking to the same IRI node collapse (reference: textgraphs/kg.py:1021-1035)
and ``owl:sameAs`` edges join DBPedia/Wikidata IRIs (kg.py:1127-1134), with
the IRI discipline explicitly motivated by "transitive closure, semantic
inference" (elem.py:12-14). At corpus scale that closure is the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) on an edge DataFrame:

* large-star: for every node, hook every *larger* neighbor to the minimum
  of the neighborhood (including self);
* small-star: hook every smaller-or-equal neighbor to the minimum.

Both are a single groupBy per round; the edge set converges to a star
forest in O(log n) rounds. Rounds localCheckpoint to truncate lineage —
without this the plan doubles every iteration and the driver dies long
before the data does.

Node ids must be orderable integers; callers hash stable string keys with
xxhash64 (collision probability at 10^9 keys ~ 2.7e-2 per *pair*... i.e.
negligible: 64-bit space) and keep a (key, id) sidecar for the join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Emit (v, m) for each neighbor v > u, where m = min(N(u) ∪ {u}).

    Formulated as min-aggregation + join rather than collect_set: a hub
    node with 10^8 neighbors must never materialize its neighborhood as
    one array in one task — the scalar agg + re-join keeps every row
    bounded and lets partial aggregation absorb the skew.
    """
    nbrs = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = nbrs.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        nbrs.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient (big, small); hook small neighbors + self to the minimum."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))  # m < src always
    hooked = oriented.join(mins, "src").select(
        F.col("dst").alias("v"), F.col("m")
    ).union(mins.select(F.col("src").alias("v"), F.col("m")))
    return (
        hooked.filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _driver_union_find(spark, e: DataFrame) -> DataFrame:
    """Small-graph fast path: one collect + union-find on the driver.

    Size-adaptive execution: below the threshold the edge set fits the
    driver trivially and the O(log n) distributed rounds would cost more
    in stage latency than the entire computation. Same contract as the
    distributed path (component = min node id).
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in e.toPandas().itertuples(index=False):
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    import pandas as pd

    pdf = pd.DataFrame(
        {"node": list(parent.keys()), "component": [find(n) for n in parent]},
        dtype="int64",
    )
    # Arrow-backed createDataFrame — py4j row serialization is 100x slower;
    # explicit schema so an empty edge set doesn't break inference
    return spark.createDataFrame(pdf, schema="node long, component long")


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    small_graph_threshold: int = 500_000,
) -> DataFrame:
    """edges(src, dst) [long ids] → (node, component) with component =
    min node id of the component. Driver loop with convergence check on
    the edge-set hash (cheap: one agg per round); edge sets below
    ``small_graph_threshold`` short-circuit to a driver-side union-find."""
    e = (
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    if small_graph_threshold and e.count() <= small_graph_threshold:
        return _driver_union_find(e.sparkSession, e)
    prev_sig = None
    converged = False
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint()
        sig_row = e.agg(
            F.count("*").alias("n"),
            F.sum(F.hash("src", "dst").cast("long")).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # the star-forest extraction below is only valid at the fixpoint;
        # returning anyway could silently assign one node to two components
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — raise max_iterations (rounds needed is "
            "O(log n) in the largest component)"
        )
    # star forest: every remaining edge is (member, root)
    roots = e.select(F.col("dst").alias("node"), F.col("dst").alias("component")).distinct()
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return members.union(roots).distinct()


def components_over_keys(
    match_edges: DataFrame,
    *,
    left: str = "left_id",
    right: str = "right_id",
) -> DataFrame:
    """String-keyed convenience wrapper: hash keys → run CC → join back.

    Returns (entity_key, cluster_id) where cluster_id is the MIN MEMBER
    KEY (string) of the component — stable across runs, engine-agnostic
    (an ANSI-SQL oracle reproduces it; an xxhash64-based id could not be),
    and self-describing in exports. The CC iterations themselves still run
    on hashed longs; only the final label is the min key, via one extra
    vocabulary-sized aggregation.
    """
    ids = (
        match_edges.select(F.col(left).alias("k"))
        .union(match_edges.select(F.col(right).alias("k")))
        .distinct()
        .withColumn("id", F.xxhash64("k"))
    )
    e = match_edges.select(
        F.xxhash64(left).alias("src"), F.xxhash64(right).alias("dst")
    )
    cc = connected_components(e)
    assigned = (
        ids.join(cc, ids["id"] == cc["node"], "left")
        .select("k", F.coalesce("component", "id").alias("comp"))
    )
    canon = assigned.groupBy("comp").agg(F.min("k").alias("cluster_id"))
    return assigned.join(canon, "comp").select(
        F.col("k").alias("entity_key"), "cluster_id"
    )
