"""Graph operators: distance-gated entity pairs, label propagation,
TTL bootstrap source."""

import pytest
from pyspark.sql import functions as F

from textgraphs_spark.operators.graphops import entity_pairs_within_distance, label_propagation
from textgraphs_spark.sources.bootstrap import bootstrap_nodes_edges, merge_bootstrap, parse_ttl


def test_entity_pairs_within_distance(spark):
    docs = spark.createDataFrame(
        [(0, "Werner Herzog met Anna Klein in Germany.")], ["doc_id", "text"]
    )
    pairs = entity_pairs_within_distance(docs).collect()
    keys = {(r["src_key"], r["dst_key"]) for r in pairs}
    # pairs are directed (itertools.product semantics, pipe.py:407-411)
    assert ("werner.PROPN.herzog.PROPN", "anna.PROPN.klein.PROPN") in keys
    assert ("anna.PROPN.klein.PROPN", "werner.PROPN.herzog.PROPN") in keys
    assert all(r["distance"] + 1 <= 11 for r in pairs)


def test_entity_pairs_distance_gate(spark):
    # two entities in unconnected sentences: still connected through the
    # doc graph? separate sentences share no edges -> unreachable
    docs = spark.createDataFrame(
        [(0, "Werner Herzog arrived. Anna Klein left.")], ["doc_id", "text"]
    )
    pairs = entity_pairs_within_distance(docs, max_skip=2).collect()
    assert pairs == []


def test_label_propagation_two_cliques(spark):
    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    df = spark.createDataFrame(clique1 + clique2 + [(3, 10)], ["src", "dst"])
    labels = {r["node"]: r["label"] for r in label_propagation(df).collect()}
    assert len({labels[n] for n in range(4)}) == 1
    assert len({labels[n] for n in range(10, 14)}) == 1


TTL = """
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix dbo: <http://dbpedia.org/ontology/> .
@prefix ex: <http://example.org/> .

ex:herzog skos:prefLabel "Werner Herzog"@en .
ex:herzog skos:definition "German filmmaker"@en .
ex:herzog a dbo:Person .
"""


def test_parse_ttl():
    triples = parse_ttl(TTL)
    assert ("http://example.org/herzog",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://dbpedia.org/ontology/Person") in triples
    assert ("http://example.org/herzog",
            "http://www.w3.org/2004/02/skos/core#prefLabel",
            "Werner Herzog") in triples


def test_bootstrap_merge(spark):
    from textgraphs_spark.operators.extract import corpus_nodes, extract_graphs

    seed_nodes, seed_edges = bootstrap_nodes_edges(spark, TTL)
    assert seed_nodes.count() >= 1
    assert seed_edges.filter(F.col("rel").endswith("#type")).count() == 1

    docs = spark.createDataFrame([(0, "Werner Herzog shot a documentary.")], ["doc_id", "text"])
    corpus = corpus_nodes(extract_graphs(docs))
    merged = merge_bootstrap(corpus, seed_nodes)
    assert merged.filter(F.col("node_key") == "http://example.org/herzog").count() == 1
    # corpus nodes survive the union + re-agg
    assert merged.filter(F.col("node_key") == "werner.PROPN.herzog.PROPN").count() == 1


def test_girvan_newman_barbell(spark):
    """Two triangles joined by a bridge: the bridge has the highest edge
    betweenness, so exact Girvan-Newman splits off the two triangles."""
    from textgraphs_spark.operators.graphops import girvan_newman_communities

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    out = {r.node: r.community for r in girvan_newman_communities(edges).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == out[5] == out[6] == 4


def test_girvan_newman_matches_label_propagation_shape(spark):
    """On two disjoint cliques both algorithms find the same communities."""
    from textgraphs_spark.operators.graphops import (
        girvan_newman_communities, label_propagation,
    )

    rows = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    rows += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    gn = {r.node: r.community for r in girvan_newman_communities(edges).collect()}
    lp = {r.node: r.label for r in label_propagation(edges).collect()}
    gn_parts = {frozenset(k for k, v in gn.items() if v == c) for c in set(gn.values())}
    lp_parts = {frozenset(k for k, v in lp.items() if v == c) for c in set(lp.values())}
    assert gn_parts == lp_parts


def test_girvan_newman_scale_gate(spark):
    import pytest
    from textgraphs_spark.operators.graphops import girvan_newman_communities

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="label_propagation"):
        girvan_newman_communities(edges, max_edges=10)


def test_triangle_counts_known_graph(spark):
    """K4 + a disjoint path: each K4 node sits in C(3,2)=3 triangles,
    path nodes in none (absent from the output)."""
    from textgraphs_spark.operators.graphops import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    path = [(10, 11), (11, 12), (12, 13)]
    edges = spark.createDataFrame(k4 + path, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_orientation_invariants(spark):
    """Duplicate rows, reversed duplicates, and self-loops must not
    change the tally; a hub star closes exactly the triangles its rim
    edges create."""
    from textgraphs_spark.operators.graphops import triangle_counts

    # hub 0 -- rim 1..6 (star), rim edges (1,2) and (3,4): 2 triangles
    rows = [(0, i) for i in range(1, 7)] + [(1, 2), (3, 4)]
    noisy = rows + [(b, a) for a, b in rows] + [(5, 5), (0, 1)]
    edges = spark.createDataFrame(noisy, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_link_prediction_known_scores(spark):
    """Square 1-2-3-4: the two diagonals are the only proposals; each
    shares both square corners, Jaccard = 2 / (2+2-2) = 1.0."""
    from textgraphs_spark.operators.graphops import link_prediction_jaccard

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    got = {
        (r.src, r.dst): (r.common, r.jaccard)
        for r in link_prediction_jaccard(edges, min_common=2).collect()
    }
    assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}


def test_link_prediction_hub_cut(spark):
    """With max_degree below the hub's degree, pairs whose only shared
    neighbor is the hub vanish; pairs with an independent witness keep
    their full-degree Jaccard."""
    from textgraphs_spark.operators.graphops import link_prediction_jaccard

    # hub 0 adjacent to 1..5; 1 and 2 also share witness 9
    rows = [(0, i) for i in range(1, 6)] + [(1, 9), (2, 9)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    full = {
        (r.src, r.dst)
        for r in link_prediction_jaccard(edges, min_common=1).collect()
    }
    assert (3, 4) in full and (1, 2) in full
    cut = {
        (r.src, r.dst): (r.common, r.jaccard)
        for r in link_prediction_jaccard(
            edges, min_common=1, max_degree=3
        ).collect()
    }
    assert (3, 4) not in cut            # hub-only evidence suppressed
    # survivor keeps the EXACT full-graph score: common=1 (hub center
    # cut), degrees still count every edge: deg(1)=deg(2)=2 -> 1/(2+2-1)
    assert cut[(1, 2)] == (1, 0.333333)


def test_kcore_peels_tendrils(spark):
    """K4 core survives k=3 peeling; a chain hanging off it peels away
    over MULTIPLE rounds (each round exposes the next link), pinning the
    iterative fixed point — and every survivor reports core degree 3."""
    from textgraphs_spark.operators.graphops import kcore

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tendril = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(k4 + tendril, "src long, dst long")
    got = {r.node: r.core_deg for r in kcore(edges, k=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_cascade_and_empty(spark):
    """A triangle chain where removing one low-degree node cascades:
    k=3 on a pure cycle empties the graph (schema-stable empty result);
    k=2 keeps the whole cycle."""
    from textgraphs_spark.operators.graphops import kcore

    cycle = [(i, (i + 1) % 6) for i in range(6)]
    edges = spark.createDataFrame(cycle, "src long, dst long")
    assert kcore(edges, k=3).count() == 0
    k2 = {r.node: r.core_deg for r in kcore(edges, k=2).collect()}
    assert k2 == {i: 2 for i in range(6)}


def test_harmonic_centrality_hand_computed(spark):
    """Path a-b-c-d: harmonic(a) = 1 + 1/2 + 1/3 = 1.833333;
    harmonic(b) = 1 + 1 + 1/2 = 2.5; disconnected e-f: each 1.0 and
    n_reachable 2 (unreachable nodes contribute 0, no infinity)."""
    from textgraphs_spark.operators.graphops import harmonic_centrality

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")], ["src", "dst"]
    )
    rows = {r.node: r for r in harmonic_centrality(edges).collect()}
    assert rows["a"].harmonic == pytest.approx(1 + 0.5 + 1 / 3, abs=1e-6)
    assert rows["b"].harmonic == pytest.approx(2.5, abs=1e-6)
    assert rows["a"].n_reachable == 4
    assert rows["e"].harmonic == 1.0 and rows["e"].n_reachable == 2


def test_harmonic_centrality_matches_exact_bfs(spark):
    """On a random-ish deterministic graph the sketch path must equal a
    driver-side exact BFS (sparse HLL estimates are exact here)."""
    from collections import deque

    from textgraphs_spark.operators.graphops import harmonic_centrality

    pairs = [
        (f"n{i:02d}", f"n{(i * 7 + 3) % 40:02d}") for i in range(40)
    ] + [(f"n{i:02d}", f"n{(i + 1) % 25:02d}") for i in range(25)]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = {r.node: (r.harmonic, r.n_reachable)
           for r in harmonic_centrality(edges).collect()}

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in adj:
        dist = {v: 0}
        dq = deque([v])
        while dq:
            x = dq.popleft()
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    dq.append(y)
        h = sum(1.0 / d for d in dist.values() if d > 0)
        assert got[v][1] == len(dist), v
        assert got[v][0] == pytest.approx(h, abs=1e-6), v


def test_neighborhood_function_hand_computed(spark):
    """Path a-b-c-d (ordered pairs): t=1 -> 6, t=2 -> 10, t=3 -> 12;
    fracs 0.5, 10/12, 1.0; reached_90 first true at t=3 (the 90%%
    effective diameter)."""
    from textgraphs_spark.operators.graphops import neighborhood_function

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    rows = {r.t: r for r in neighborhood_function(edges).collect()}
    assert [rows[t].reachable_pairs for t in (1, 2, 3)] == [6, 10, 12]
    assert rows[1].frac == 0.5
    assert rows[2].frac == pytest.approx(10 / 12, abs=1e-6)
    assert rows[3].frac == 1.0
    assert [rows[t].reached_90 for t in (1, 2, 3)] == [False, False, True]
    assert 4 not in rows  # loop stopped at convergence
