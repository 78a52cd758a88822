"""HTML visualization sinks: standalone graph render + wordcloud
(dependency-free stand-ins for reference vis.py, data-contract parity)."""

import json
import re

import pytest
from pyspark.sql import functions as F

from textgraphs_spark.sources.htmlvis import write_graph_html, write_wordcloud_html


def test_graph_html_roundtrip(spark, tmp_path):
    from textgraphs_spark.operators.extract import (
        corpus_edges, corpus_nodes, extract_graphs,
    )

    docs = spark.createDataFrame(
        [(0, "Werner Herzog met Anna Klein in Germany."),
         (1, "Anna Klein visited Germany again.")],
        ["doc_id", "text"],
    )
    ex = extract_graphs(docs)
    nodes, edges = corpus_nodes(ex), corpus_edges(ex)
    out = write_graph_html(nodes, edges, str(tmp_path / "g.html"))
    html = open(out, encoding="utf-8").read()
    payload = json.loads(re.search(r"const DATA = (.*?);\n", html).group(1))
    ids = {n["id"] for n in payload["nodes"]}
    assert len(ids) == nodes.count()          # every node rendered, ids unique
    labels = {n["label"] for n in payload["nodes"]}
    assert "Werner Herzog" in labels and "Germany" in labels
    kinds = {n["kind"] for n in payload["nodes"]}
    assert "ent" in kinds
    # reference edge styling survives (vis.py:150-161): DEP edges are
    # thin lightgray 'to'-arrows (other kinds fall back to plain gray)
    dep = [e for e in payload["links"] if e["color"] == "lightgray"]
    assert dep and all(e["width"] == 1 and e["arrows"] == "to" for e in dep)
    for e in payload["links"]:
        assert e["source"] in ids and e["target"] in ids
    assert "<canvas" in html and "requestAnimationFrame" in html


def test_graph_html_size_gate(spark, tmp_path):
    nodes = spark.range(0, 50).select(
        F.concat(F.lit("k"), "id").alias("node_key"),
        F.concat(F.lit("s"), "id").alias("surface"),
        F.lit("lem").alias("kind"), F.lit(1).alias("count"),
    )
    edges = spark.createDataFrame([], "src_key string, dst_key string, kind string, rel string")
    with pytest.raises(ValueError, match="max_nodes"):
        write_graph_html(nodes, edges, str(tmp_path / "x.html"), max_nodes=10)


def test_graph_html_hostile_content_escaped(spark, tmp_path):
    """Corpus-derived strings must not break out of the <script> block
    or inject markup: '</' is escaped inside the JSON payload and the
    title is HTML-escaped, while json round-trip preserves the bytes."""
    evil = "</script><script>alert(1)</script>"
    nodes = spark.createDataFrame(
        [("k0", evil, "ent", 3)], ["node_key", "surface", "kind", "count"]
    )
    edges = spark.createDataFrame(
        [], "src_key string, dst_key string, kind string, rel string"
    )
    out = write_graph_html(
        nodes, edges, str(tmp_path / "evil.html"), title="<t>&x"
    )
    html = open(out, encoding="utf-8").read()
    # exactly one literal '</script>' — the template's own closing tag
    assert html.count("</script>") == 1
    assert "&lt;t&gt;&amp;x" in html
    payload = json.loads(re.search(r"const DATA = (.*?);\n", html).group(1))
    assert payload["nodes"][0]["label"] == evil    # data intact after escape


def test_wordcloud_html_escaping_and_term_collisions(spark, tmp_path):
    """Distinct terms 'a b' and 'a_b' must both render (keyed by the
    original term, not the underscored render form), and markup in
    terms is HTML-escaped."""
    weights = spark.createDataFrame(
        [("a b", 0.08), ("a_b", 0.04), ("<img src=x>", 0.02)],
        ["surface", "weight"],
    )
    out = write_wordcloud_html(weights, str(tmp_path / "wc2.html"))
    html = open(out, encoding="utf-8").read()
    assert 'title="1000">a_b</span>' in html    # 'a b' rendered underscored
    assert 'title="500">a_b</span>' in html     # literal 'a_b' kept separately
    assert "<img" not in html and "&lt;img_src=x&gt;" in html


def test_wordcloud_html_reference_scaling(spark, tmp_path):
    """Frequencies must reproduce vis.py:262-266: round(w/max*1000),
    spaces -> underscores, positive weights only."""
    weights = spark.createDataFrame(
        [("alpha beta", 0.08), ("gamma", 0.04), ("zero", 0.0), ("neg", -1.0)],
        ["surface", "weight"],
    )
    out = write_wordcloud_html(weights, str(tmp_path / "wc.html"))
    html = open(out, encoding="utf-8").read()
    assert 'title="1000">alpha_beta</span>' in html
    assert 'title="500">gamma</span>' in html
    assert "zero" not in html and "neg" not in html
