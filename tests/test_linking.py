"""Offline KG-catalog entity linking (kg.py J7/J8 semantics as joins)."""

import pytest
from pyspark.sql import functions as F

from textgraphs_spark.operators.linking import (
    iri_match_edges, kg_catalog_from_gazetteer, link_entities, sameas_edges,
)


@pytest.fixture(scope="module")
def linked(spark):
    entities = spark.createDataFrame(
        [
            ("germany.PROPN", "Germany"),
            ("deutschland.PROPN", "Germany"),   # different key, same surface
            ("nasa.PROPN", "NASA"),
            ("unknown.PROPN", "Xyzzy"),
        ],
        ["entity_key", "surface"],
    )
    catalog = kg_catalog_from_gazetteer(spark)
    return link_entities(entities, catalog), catalog


def test_link_entities(linked):
    links, _ = linked
    rows = links.collect()
    iris = {r["entity_key"]: set() for r in rows}
    for r in rows:
        iris[r["entity_key"]].add(r["namespace"])
    assert iris["germany.PROPN"] == {"dbpedia", "wikidata"}
    assert "unknown.PROPN" not in iris
    assert all(r["prob"] >= 0.8 for r in rows)


def test_sameas_edges(linked):
    links, _ = linked
    edges = sameas_edges(links).collect()
    assert any(
        "dbpedia.org" in r["left_id"] and "wikidata.org" in r["right_id"]
        for r in edges
    )
    assert all(r["rel"].endswith("sameAs") for r in edges)


def test_iri_match_edges(linked):
    links, _ = linked
    pairs = {(r["left_id"], r["right_id"]) for r in iri_match_edges(links).collect()}
    # both keys with surface "Germany" link to the same IRI -> match edge
    assert ("deutschland.PROPN", "germany.PROPN") in pairs
