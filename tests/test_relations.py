"""Relation inference: pattern triples, prob gate, INF edge construction."""

from pyspark.sql import functions as F

from textgraphs_spark.operators.relations import inf_edges, infer_relations


def test_pattern_relations(spark):
    docs = spark.createDataFrame(
        [
            (0, "Werner Herzog met Anna Klein in Germany."),
            (1, "Boris Vogel praised the early work of Clara Brandt."),
        ],
        ["doc_id", "text"],
    )
    triples = infer_relations(docs).collect()
    rels = {(r["src_key"], r["rel"], r["dst_key"]) for r in triples}
    assert ("werner.PROPN.herzog.PROPN", "met", "anna.PROPN.klein.PROPN") in rels
    assert any(r[1].startswith("praise") for r in rels)
    assert all(r["prob"] >= 0.9 for r in triples)


def test_inf_edges_resolve_and_dedup(spark):
    docs = spark.createDataFrame(
        [(i, "Werner Herzog met Anna Klein in Germany.") for i in range(3)],
        ["doc_id", "text"],
    )
    edges = inf_edges(infer_relations(docs)).collect()
    met = [e for e in edges if e["src_key"] == "werner.PROPN.herzog.PROPN"]
    assert len(met) == 1
    assert met[0]["count"] == 3                      # dedup with count (graph.py:217-218)
    assert met[0]["rel"].startswith("http://www.wikidata.org/")  # resolve_rel_iri analog
    assert met[0]["kind"] == "inf"


def test_custom_extractor_plugs_in(spark):
    """InferRel extension point: swap the extractor, keep the plumbing."""
    docs = spark.createDataFrame([(0, "anything")], ["doc_id", "text"])

    def fake(doc_id, text):
        return [{"doc_id": doc_id, "src_key": "a", "rel": "linked_to",
                 "dst_key": "b", "prob": 0.99},
                {"doc_id": doc_id, "src_key": "a", "rel": "weak",
                 "dst_key": "c", "prob": 0.5}]

    got = infer_relations(docs, gen_triples_batch=fake).collect()
    assert len(got) == 1  # min_prob 0.9 gate (defaults.py:28)
    assert got[0]["rel"] == "linked_to"
