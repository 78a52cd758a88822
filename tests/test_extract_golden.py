"""Golden-output tests mirroring the reference's test strategy
(reference: tests/test_extract.py — Herzog top-k; docs/ex0_0.md snapshots)."""

import numpy as np

from textgraphs_spark.doclevel.build import build_doc_graph
from textgraphs_spark.doclevel.rank import pagerank, restack_ranks
from textgraphs_spark.nlp.keys import get_lemma_key_tokens
from textgraphs_spark.nlp.pipeline import parse_doc

HERZOG = (
    "Werner Herzog is a remarkable filmmaker and intellectual originally "
    "from Germany, the son of Dietrich Herzog."
)


def _ranked(text):
    g = build_doc_graph(text)
    nodes = list(g.nodes.values())
    edges = [(e.src, e.dst, float(e.count)) for e in g.edges.values()]
    succ = {}
    for s, d, _ in edges:
        succ.setdefault(s, set()).add(d)
    for nd in nodes:
        nd.neighbors = len(succ.get(nd.node_id, ()))
    ranks = pagerank(len(nodes), edges)
    stacked = np.array([0 if (n.pos == "VERB" or n.kind == "iri") else n.count for n in nodes])
    final = restack_ranks(
        ranks, stacked,
        np.array([n.neighbors for n in nodes]),
        np.array([int(n.sub_obj) for n in nodes]),
        np.array([n.kind == "ent" for n in nodes]),
    )
    for nd, w in zip(nodes, final):
        nd.weight = float(w)
    return sorted((n for n in nodes if n.weight > 0), key=lambda n: -n.weight)


def test_extract_herzog_topk():
    """Parity with reference tests/test_extract.py:20-70: top-4 ranked
    phrases must contain the three named entities."""
    top4 = [(n.text, n.pos) for n in _ranked(HERZOG)[:4]]
    for expected in [("Germany", "PROPN"), ("Werner Herzog", "PROPN"), ("Dietrich Herzog", "PROPN")]:
        assert expected in top4, f"{expected} not in {top4}"


def test_weights_sum_near_one():
    """Phrase ranks normalize to ~1.0 per doc (doc.py:893-904); the LP's
    slack variable absorbs a small gap when coef0 == coef1 binds."""
    ranked = _ranked(HERZOG)
    total = sum(n.weight for n in ranked)
    assert 0.9 < total <= 1.0 + 1e-9


def test_lemma_key_parity():
    """Key grammar parity with pipe.py:273-311."""
    assert get_lemma_key_tokens([("werner", "PROPN"), ("herzog", "PROPN")]) == "werner.PROPN.herzog.PROPN"
    assert get_lemma_key_tokens([("be", "AUX")], placeholder_idx=2) == "2.be.AUX"
    assert get_lemma_key_tokens([("filmmaker", "NOUN")]) == "filmmaker.NOUN"


def test_parse_deterministic():
    d1 = parse_doc(HERZOG)
    d2 = parse_doc(HERZOG)
    t1 = [(t.text, t.pos, t.lemma, t.dep, t.head) for s in d1.sents for t in s.tokens]
    t2 = [(t.text, t.pos, t.lemma, t.dep, t.head) for s in d2.sents for t in s.tokens]
    assert t1 == t2


def test_see_spot_run_roundtrip_shape():
    """The reference's minimal fixture (tests/test_load.py:32-34)."""
    g = build_doc_graph("See Spot run.")
    assert "spot.PROPN" in g.nodes
    assert g.nodes["spot.PROPN"].kind == "ent"
    assert len(g.edges) > 0


def test_entity_nodes_dedupe_by_key():
    """make_node upsert semantics (graph.py:134-157): same key across
    sentences collapses with count accumulation."""
    g = build_doc_graph("Werner Herzog makes films. Werner Herzog lives in Germany.")
    wh = g.nodes["werner.PROPN.herzog.PROPN"]
    assert wh.count == 2
    assert len(wh.loc) == 2
