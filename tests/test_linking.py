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


def test_second_pass_links_typos_only(spark):
    """The search fallback (reference kg.py:940-983 + best-alias
    kg.py:530-550): typo'd surfaces unlinked by the exact pass resolve
    to their intended IRI; exact-linked and garbage surfaces do not
    appear in the fallback output."""
    from textgraphs_spark.operators.linking import (
        link_entities_second_pass, link_entities_with_fallback,
    )

    entities = spark.createDataFrame(
        [
            ("germany.PROPN", "Germany"),     # exact hit -> not in pass 2
            ("gremany.PROPN", "Gremany"),     # transposition -> fallback
            ("tkoyo.PROPN", "Tkoyo"),         # transposition -> fallback
            ("zqwvx.PROPN", "Zqwvx"),         # no alias above 0.8
        ],
        ["entity_key", "surface"],
    )
    catalog = kg_catalog_from_gazetteer(spark)
    second = link_entities_second_pass(entities, catalog)
    rows = {r["entity_key"]: r for r in second.collect()}
    assert rows["gremany.PROPN"]["iri"].endswith("/Germany")
    assert rows["tkoyo.PROPN"]["iri"].endswith("/Tokyo")
    assert "germany.PROPN" not in rows      # already exact-linked
    assert "zqwvx.PROPN" not in rows        # below min_alias
    assert all(r["namespace"] == "dbpedia" for r in rows.values())
    assert all(0.8 < r["prob"] <= 1.0 for r in rows.values())

    both = link_entities_with_fallback(entities, catalog)
    by_chan = {r["channel"] for r in both.collect()}
    assert by_chan == {"exact", "search"}
    # a fallback link flows into the closure feeds unchanged
    from textgraphs_spark.operators.linking import iri_match_edges

    assert iri_match_edges(both.drop("channel")).count() >= 1
