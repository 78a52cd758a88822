"""Connected components vs a pure-Python union-find oracle."""

import random

from pyspark.sql import functions as F

from textgraphs_spark.operators.components import connected_components, components_over_keys


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_cc_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(1, 200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(edges, nodes)
    # group expected into component sets (only nodes that touch an edge)
    touched = {a for a, _ in edges} | {b for _, b in edges}

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, small_graph_threshold=0).collect()
    }
    assert set(got) == touched
    for n in touched:
        assert got[n] == expected[n], f"node {n}"


def test_cc_chain_and_star(spark):
    # long chain exercises the O(log n) contraction; star is the base case
    chain = [(i, i + 1) for i in range(100)]
    star = [(1000, 1000 + i) for i in range(1, 50)]
    df = spark.createDataFrame(chain + star, ["src", "dst"])
    got = connected_components(df, small_graph_threshold=0)
    comps = (
        got.groupBy("component").agg(F.count("*").alias("n")).collect()
    )
    sizes = sorted(r["n"] for r in comps)
    assert sizes == [50, 101]


def test_components_over_keys(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, ["left_id", "right_id"])
    out = components_over_keys(df).collect()
    cl = {r["entity_key"]: r["cluster_id"] for r in out}
    assert cl["a"] == cl["b"] == cl["c"]
    assert cl["x"] == cl["y"]
    assert cl["a"] != cl["x"]


def test_cc_small_graph_fast_path_agrees(spark):
    """The size-adaptive driver union-find must agree with the
    distributed large-star/small-star path."""
    rng = random.Random(11)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    fast = {(r["node"], r["component"]) for r in connected_components(df).collect()}
    dist = {(r["node"], r["component"]) for r in connected_components(df, small_graph_threshold=0).collect()}
    assert fast == dist
