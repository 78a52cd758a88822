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


def test_cc_struct_ids_both_paths(spark):
    """128-bit struct ids run through BOTH the driver union-find and the
    distributed star rounds, agreeing with each other."""
    rng = random.Random(13)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["sa", "sb"]).select(
        F.struct(F.col("sa").cast("long").alias("hi"), (F.col("sa") * 7).cast("long").alias("lo")).alias("src"),
        F.struct(F.col("sb").cast("long").alias("hi"), (F.col("sb") * 7).cast("long").alias("lo")).alias("dst"),
    )
    fast = {(tuple(r["node"]), tuple(r["component"]))
            for r in connected_components(df).collect()}
    dist = {(tuple(r["node"]), tuple(r["component"]))
            for r in connected_components(df, small_graph_threshold=0).collect()}
    assert fast == dist
    longs = spark.createDataFrame(edges, ["src", "dst"])
    expect = {r["node"]: r["component"] for r in connected_components(longs).collect()}
    got = {hi: chi for ((hi, _lo), (chi, _clo)) in fast}
    assert got == expect


def test_cc_128bit_survives_forced_64bit_collision(spark):
    """The at-scale correctness property: when the HIGH word collides for
    EVERY key (a simulated 64-bit birthday collision), unrelated clusters
    must still stay separate because the low word differs — over 10^6
    distinct keys. A single-64-bit-id implementation merges everything
    here."""
    n = 1_000_000
    # 5*10^5 two-node components (i <-> i + n), every id sharing hi=0:
    # correctness rides entirely on the low word
    edges = spark.range(n // 2).select(
        F.struct(F.lit(0).cast("long").alias("hi"), F.col("id").cast("long").alias("lo")).alias("src"),
        F.struct(F.lit(0).cast("long").alias("hi"), (F.col("id") + n).cast("long").alias("lo")).alias("dst"),
    )
    got = connected_components(edges)
    comps = got.groupBy("component").agg(F.count("*").alias("sz")) \
        .groupBy("sz").count().collect()
    assert {r["sz"]: r["count"] for r in comps} == {2: n // 2}


def test_components_over_keys_id_is_128bit(spark):
    """components_over_keys must build struct (two-long) CC ids, not a
    single hash — guards against a regression to the collision-prone
    64-bit id space."""
    from textgraphs_spark.operators.components import key_id128

    df = spark.range(1).select(key_id128(F.lit("x")).alias("id"))
    fields = df.schema["id"].dataType.fieldNames()
    assert fields == ["hi", "lo"]
    r = df.collect()[0]["id"]
    assert r["hi"] != r["lo"]  # independent draws


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
