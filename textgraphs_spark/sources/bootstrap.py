"""RDF/TTL bootstrap source: seed nodes/edges before parsing.

Mirrors the reference's ``load_bootstrap_ttl`` (reference:
textgraphs/doc.py:1103-1212): a small Turtle document of entity
definitions (skos:prefLabel, skos:definition, rdf:type, owl:sameAs /
skos:related synonym links) is parsed driver-side — it is configuration,
kilobytes not terabytes — and becomes seed rows unioned into the corpus
node/edge tables (``unionByName`` + re-aggregation replaces the
reference's in-place dict seeding).

A minimal deterministic Turtle subset is parsed without rdflib (not in
this environment): @prefix lines, then `subject predicate object .`
statements with IRIs, prefixed names, and quoted literals.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PREFIX_RE = re.compile(r"@prefix\s+([A-Za-z0-9_]*):\s*<([^>]+)>\s*\.")
_STMT_RE = re.compile(
    r"(<[^>]+>|[A-Za-z0-9_]*:[A-Za-z0-9_]+)\s+"
    r"(<[^>]+>|[A-Za-z0-9_]*:[A-Za-z0-9_]+|a)\s+"
    r"(<[^>]+>|[A-Za-z0-9_]*:[A-Za-z0-9_]+|\"[^\"]*\"(?:@[a-z\-]+)?)\s*[;.]"
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SKOS_PREF = "http://www.w3.org/2004/02/skos/core#prefLabel"
SKOS_DEF = "http://www.w3.org/2004/02/skos/core#definition"


def parse_ttl(ttl: str) -> list[tuple[str, str, str]]:
    """Parse the minimal TTL subset into (subj, pred, obj) triples;
    prefixed names expanded, literals kept as bare strings."""
    prefixes: dict[str, str] = {}
    for m in _PREFIX_RE.finditer(ttl):
        prefixes[m.group(1)] = m.group(2)

    def expand(term: str) -> str:
        if term == "a":
            return RDF_TYPE
        if term.startswith("<"):
            return term[1:-1]
        if term.startswith('"'):
            lit = term[1 : term.rindex('"')]
            return lit
        pfx, _, local = term.partition(":")
        return prefixes.get(pfx, pfx + ":") + local

    triples = []
    # normalize ';' continuation onto full statements line by line
    current_subject = None
    for line in ttl.splitlines():
        line = line.strip()
        if not line or line.startswith("@prefix") or line.startswith("#"):
            continue
        m = _STMT_RE.match(line)
        if m:
            current_subject = expand(m.group(1))
            triples.append((current_subject, expand(m.group(2)), expand(m.group(3))))
        elif current_subject is not None:
            # continuation: `pred obj ;` or `pred obj .`
            m2 = re.match(
                r"(<[^>]+>|[A-Za-z0-9_]*:[A-Za-z0-9_]+|a)\s+"
                r"(<[^>]+>|[A-Za-z0-9_]*:[A-Za-z0-9_]+|\"[^\"]*\"(?:@[a-z\-]+)?)\s*[;.]",
                line,
            )
            if m2:
                triples.append((current_subject, expand(m2.group(1)), expand(m2.group(2))))
    return triples


def bootstrap_nodes_edges(spark: SparkSession, ttl: str) -> tuple[DataFrame, DataFrame]:
    """TTL → seed (nodes, edges) DataFrames in the corpus lemma-graph
    schema. prefLabel'd subjects become IRI-kind nodes; rdf:type and other
    IRI-object predicates become typed edges (kind='iri')."""
    triples = parse_ttl(ttl)
    labels = {s: o for s, p, o in triples if p == SKOS_PREF}
    defs = {s: o for s, p, o in triples if p == SKOS_DEF}
    node_rows = [
        {
            "node_key": s,
            "kind": "iri",
            "surface": labels.get(s, s),
            "pos": RDF_TYPE,
            "label": defs.get(s, labels.get(s, s)),
            "length": len(labels.get(s, s).split(" ")),
            "count": 1,
            "sub_obj": False,
            "doc_freq": 0,
        }
        for s in {s for s, _, _ in triples}
    ]
    edge_rows = [
        {"src_key": s, "dst_key": o, "kind": "iri", "rel": p, "prob": 1.0, "count": 1}
        for s, p, o in triples
        if p not in (SKOS_PREF, SKOS_DEF) and (o.startswith("http") or ":" not in o)
    ]
    nodes = spark.createDataFrame(node_rows) if node_rows else None
    edges = spark.createDataFrame(edge_rows) if edge_rows else None
    return nodes, edges


def merge_bootstrap(corpus_nodes: DataFrame, seed_nodes: DataFrame) -> DataFrame:
    """Union seed nodes into the corpus node table with re-aggregation —
    the distributed analog of the reference seeding its node dict before
    parsing (doc.py:1166-1212)."""
    cols = ["node_key", "kind", "surface", "pos", "label", "length", "count", "sub_obj", "doc_freq"]
    u = corpus_nodes.select(*cols).unionByName(seed_nodes.select(*cols))
    return (
        u.groupBy("node_key")
        .agg(
            F.first("kind").alias("kind"),
            F.first("surface").alias("surface"),
            F.first("pos").alias("pos"),
            F.first("label", ignorenulls=True).alias("label"),
            F.first("length").alias("length"),
            F.sum("count").alias("count"),
            F.max(F.col("sub_obj").cast("int")).cast("boolean").alias("sub_obj"),
            F.sum("doc_freq").alias("doc_freq"),
        )
    )
