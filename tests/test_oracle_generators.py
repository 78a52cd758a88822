"""Property tests pinning the generated DuckDB oracle SQL to the Python
NLP implementation it mirrors.

The oracle generators (plans/er_oracle.py, plans/pages_oracle.py) compile
the tagger/lemmatizer/dependency/chunk rules from nlp/lex.py into SQL CASE
cascades. These tests run BOTH implementations over randomized corpora and
require identical output — so a lex or pipeline edit that drifts one side
without the other fails here, not in the driver's correctness gate.

No Spark needed: the Python side is the plain per-doc builder, the SQL
side is DuckDB over an in-memory table.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from textgraphs_spark.doclevel.build import build_doc_graph
from textgraphs_spark.nlp import lex
from textgraphs_spark.plans.er_oracle import graph_ctes

# vocabulary stressing every tagger branch reachable in lowercase text:
# closed classes, irregulars, -ing/-ed/-ies/-es/-s inflections, ING_ED
# exceptions, suffix adjectives/adverbs, digits, short words
VOCAB = [
    "a", "the", "this", "is", "was", "been", "of", "in", "between", "it",
    "they", "and", "or", "if", "because", "not", "very", "originally",
    "run", "running", "ran", "runs", "made", "making", "makes", "take",
    "taking", "took", "written", "writes", "children", "men", "better",
    "thing", "king", "morning", "building", "hundred", "red", "need",
    "remarkable", "famous", "helpful", "active", "table", "tables",
    "query", "queries", "batch", "batches", "boxes", "classes", "bus",
    "analysis", "data", "window", "stream", "filter", "sort", "slowly",
    "quickly", "2024", "7", "x", "ab", "cat", "cats", "dress", "focus",
]


def _py_nodes(texts: list[str]) -> set[tuple]:
    rows = []
    for doc_id, text in enumerate(texts):
        g = build_doc_graph(text)
        for nd in g.nodes.values():
            rows.append((doc_id, nd.key, nd.kind, nd.text, nd.pos,
                         nd.length, nd.count, nd.sub_obj))
    return set(rows)


def _sql_nodes(texts: list[str]) -> set[tuple]:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    sql = f"""WITH
{graph_ctes('documents')}
SELECT doc_id, node_key, kind, surface, pos, length,
       CAST(count AS INT) AS count, sub_obj
FROM node_rows
"""
    return {tuple(r) for r in con.execute(sql).fetchall()}


def _py_edges(texts: list[str]) -> set[tuple]:
    rows = []
    for doc_id, text in enumerate(texts):
        g = build_doc_graph(text)
        id2key = {nd.node_id: nd.key for nd in g.nodes.values()}
        for e in g.edges.values():
            rows.append((doc_id, id2key[e.src], id2key[e.dst], e.kind,
                         e.rel, e.count))
    return set(rows)


def _sql_edges(texts: list[str]) -> set[tuple]:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    sql = f"""WITH
{graph_ctes('documents')}
SELECT doc_id, src_key, dst_key, kind, rel, CAST(count AS INT) AS count
FROM edge_rows
"""
    return {tuple(r) for r in con.execute(sql).fetchall()}


def _random_corpus(seed: int, n_docs: int = 40) -> list[str]:
    rng = random.Random(seed)
    return [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 30)))
        for _ in range(n_docs)
    ]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_graph_sql_twin_matches_python_nodes(seed):
    texts = _random_corpus(seed)
    py = _py_nodes(texts)
    sql = _sql_nodes(texts)
    assert py == sql, (
        f"node drift: py-only={sorted(py - sql)[:5]} sql-only={sorted(sql - py)[:5]}"
    )


@pytest.mark.parametrize("seed", [4, 5])
def test_graph_sql_twin_matches_python_edges(seed):
    texts = _random_corpus(seed)
    py = _py_edges(texts)
    sql = _sql_edges(texts)
    assert py == sql, (
        f"edge drift: py-only={sorted(py - sql)[:5]} sql-only={sorted(sql - py)[:5]}"
    )


def test_pages_oracle_matches_python_entities():
    """The mixed-case (PROPN/NER-merge) SQL twin reproduces the Python
    entity extraction over the arithmetic pages corpus."""
    from textgraphs_spark.plans.pages_oracle import pages_graph_ctes
    from textgraphs_spark.sources.pages import _arith_lists

    fn, ln, gpe, org = _arith_lists()
    texts = []
    for i in range(60):
        texts.append(
            f"{fn[i % len(fn)]} {ln[i % len(ln)]} met "
            f"{fn[(i * 7 + 3) % len(fn)]} {ln[(i * 5 + 11) % len(ln)]} in "
            f"{gpe[i % len(gpe)]} near {org[(i * 3 + 1) % len(org)]} offices"
        )

    py = set()
    for doc_id, text in enumerate(texts):
        g = build_doc_graph(text)
        for nd in g.nodes.values():
            if nd.kind == "ent":
                py.add((doc_id, nd.key, nd.text, nd.count))

    con = duckdb.connect()
    sql = f"""WITH
{pages_graph_ctes(60)}
SELECT doc_id, node_key, surface, CAST(cnt AS INT) FROM ment
"""
    got = {tuple(r) for r in con.execute(sql).fetchall()}
    assert py == got, (
        f"entity drift: py-only={sorted(py - got)[:5]} sql-only={sorted(got - py)[:5]}"
    )


def test_lex_edit_would_be_caught():
    """Sanity: the SQL really is generated from lex (not hardcoded) —
    the DET list appears verbatim in the generated cascade."""
    sql = graph_ctes()
    for w in sorted(lex.DET)[:3]:
        assert f"'{w}'" in sql
    assert "IHDR" not in sql  # and it is the right generator
