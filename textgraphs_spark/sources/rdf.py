"""RDF N3 sink + namespace compaction.

Mirrors the reference's RDF export semantics (reference:
textgraphs/doc.py:990-1082): ENT/LEM nodes (excluding verbs) become
``skos:prefLabel`` subjects typed by their class IRI (or ``owl:Thing``
when unlinked, doc.py:558-560 default-semantics fill); IRI nodes pass
through; INF edges become predicate triples. Namespace prefix compaction
follows kg.py:266-303 / NS_PREFIX (kg.py:145-162).

Output is a (subj, pred, obj) DataFrame plus an N3 text writer — triples
stay distributed; only formatting is a projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..nlp import lex

SKOS_PREF = "http://www.w3.org/2004/02/skos/core#prefLabel"
RDF_TYPE = lex.RDF_TYPE
OWL_THING = lex.OWL_THING


def normalize_prefix_col(col: F.Column) -> F.Column:
    """Compact a fully-qualified IRI column using NS_PREFIX (longest
    namespace first so subsets never double-compact; kg.py:266-303)."""
    import re as _re

    out = col
    for prefix, ns in sorted(lex.NS_PREFIX.items(), key=lambda kv: -len(kv[1])):
        out = F.regexp_replace(out, "^" + _re.escape(ns), prefix + ":")
    return out


def _entity_iri(surface) -> F.Column:
    """Surface form → entity IRI ref. Reference naming (space/dot → _)
    plus neutralization of every char that is illegal inside an IRI ref
    (angle brackets, quotes, braces, pipe, caret, backtick, backslash,
    whitespace/control) — without this, one surface containing ``<`` or
    a newline corrupts the serialized triple line."""
    return F.concat(
        F.lit("<https://github.com/DerwenAI/textgraphs/ns/entity/"),
        F.regexp_replace(surface, r'[ .\x00-\x20<>"{}|^`\\]', "_"),
        F.lit(">"),
    )


def _literal(surface, lang: str) -> F.Column:
    """Surface form → single-line N3 string literal. Backslashes are
    escaped first, double quotes become apostrophes (the reference's
    lossy choice, kept for parity), and newline/CR/tab — which would
    break the one-triple-per-line serialization — become \\n/\\r/\\t."""
    s = F.regexp_replace(surface, r"\\", r"\\\\")
    s = F.regexp_replace(s, '"', "'")
    s = F.regexp_replace(s, "\n", r"\\n")
    s = F.regexp_replace(s, "\r", r"\\r")
    s = F.regexp_replace(s, "\t", r"\\t")
    return F.concat(F.lit('"'), s, F.lit(f'"@{lang}'))


def export_rdf_triples(nodes: DataFrame, edges: DataFrame, *, lang: str = "en") -> DataFrame:
    """Corpus nodes/edges → (subj, pred, obj) triples DataFrame."""
    # entity/lemma nodes, verbs redacted (doc.py:1011-1013)
    ent_lem = nodes.filter(
        F.col("kind").isin("ent", "lem") & (F.col("pos") != "VERB")
    )
    slug = _entity_iri(F.col("surface"))
    label_triples = ent_lem.select(
        slug.alias("subj"),
        F.lit(f"<{SKOS_PREF}>").alias("pred"),
        _literal(F.col("surface"), lang).alias("obj"),
    )
    type_triples = ent_lem.select(
        slug.alias("subj"),
        F.lit(f"<{RDF_TYPE}>").alias("pred"),
        F.concat(
            F.lit("<"),
            F.when(F.col("label").startswith("http"), F.col("label")).otherwise(F.lit(OWL_THING)),
            F.lit(">"),
        ).alias("obj"),
    )
    # inferred-relation edges (kind = inf) as direct triples
    inf_edges = (
        edges.filter(F.col("kind") == "inf")
        .join(nodes.select(F.col("node_key").alias("src_key"), F.col("surface").alias("s_sur")), "src_key")
        .join(nodes.select(F.col("node_key").alias("dst_key"), F.col("surface").alias("d_sur")), "dst_key")
        .select(
            # SAME slug recipe as the label triples — the old space-only
            # replacement gave "Dr. Who" a different IRI here (Dr._Who)
            # than its own prefLabel subject (Dr__Who), dangling the edge
            _entity_iri(F.col("s_sur")).alias("subj"),
            F.concat(F.lit("<"), F.col("rel"), F.lit(">")).alias("pred"),
            _entity_iri(F.col("d_sur")).alias("obj"),
        )
    )
    return label_triples.unionByName(type_triples).unionByName(inf_edges).distinct()


def write_n3(triples: DataFrame, path: str) -> None:
    """Write N3 lines — deterministic ordering for reproducible artifacts
    (the reference sorts its serialization output; graph.py:291-296)."""
    (
        triples.select(
            F.concat_ws(" ", "subj", "pred", "obj", F.lit(".")).alias("value")
        )
        .orderBy("value")
        .write.mode("overwrite")
        .text(path)
    )
