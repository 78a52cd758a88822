"""Build one document's lemma graph: nodes, edges, mentions.

Reimplements the semantics of the reference's element collection
(reference: textgraphs/doc.py:137-239 token classification,
doc.py:242-306 class links, doc.py:309-378 noun-chunk overlay,
doc.py:381-471 orchestration; textgraphs/graph.py:53-233 node/edge upsert)
as a pure function over the deterministic parse — no mutation shared across
documents, so any number of docs can be processed in parallel.

Node kinds (reference: textgraphs/elem.py:71-94):  dep | lem | ent | chu | iri
Edge kinds (reference: textgraphs/elem.py:181-204): dep | chu | inf | syn | iri
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..nlp import lex
from ..nlp.keys import get_lemma_key_tokens
from ..nlp.pipeline import Doc, parse_doc


@dataclass
class DocNode:
    node_id: int
    key: str
    text: str
    pos: str
    kind: str                    # dep|lem|ent|chu|iri
    label: str | None = None
    length: int = 1
    sub_obj: bool = False
    count: int = 0
    loc: list[list[int]] = field(default_factory=list)
    neighbors: int = 0
    weight: float = 0.0
    annotated: bool = False


@dataclass
class DocEdge:
    key: str
    src: int
    dst: int
    kind: str                    # dep|chu|inf|syn|iri
    rel: str
    prob: float
    count: int = 1


@dataclass
class DocGraph:
    nodes: dict[str, DocNode]    # insertion-ordered, keyed by lemma key
    edges: dict[str, DocEdge]


def build_doc_graph(text: str, *, text_id: int = 0, para_id: int = 0, link_classes: bool = True) -> DocGraph:
    """Parse ``text`` and collect its lemma-graph elements."""
    doc: Doc = parse_doc(text)
    g = DocGraph(nodes={}, edges={})

    def make_node(key: str, surface: str, pos: str, kind: str, sent_id: int,
                  token_id: int, *, label: str | None = None, length: int = 1,
                  linked: bool = True) -> DocNode:
        # upsert semantics of graph.py:121-157: placeholders are replaced,
        # linked keys accumulate count + loc
        location = [text_id, para_id, sent_id, token_id]
        if not linked:
            node = DocNode(len(g.nodes), key, surface, pos, kind, length=length)
            g.nodes[key] = node
        elif key in g.nodes:
            node = g.nodes[key]
            node.count += 1
            node.loc.append(location)
        else:
            node = DocNode(
                len(g.nodes), key, surface, pos, kind,
                label=label, length=length, count=1, loc=[location],
            )
            g.nodes[key] = node
        return node

    def make_edge(src: DocNode, dst: DocNode, kind: str, rel: str, prob: float) -> None:
        # dedup-with-count semantics of graph.py:167-233; no self-loops
        key = ".".join([str(src.node_id), str(dst.node_id), rel.replace(" ", "_"), kind])
        if key in g.edges:
            g.edges[key].count += 1
        elif src.node_id != dst.node_id:
            g.edges[key] = DocEdge(key, src.node_id, dst.node_id, kind, rel, prob)

    all_sent_nodes: list[list[DocNode]] = []
    tok_offset = 0  # doc-global token index (spaCy's span.i is doc-level)
    for sent in doc.sents:
        sent_nodes: list[DocNode] = []
        for tok in sent.tokens:
            if tok.ent_label is not None:
                # named entity (merged span): key composed from the
                # underlying raw tokens (pipe.py:314-324)
                node = make_node(
                    get_lemma_key_tokens(tok.raw), tok.text, tok.pos, "ent",
                    sent.sent_id, tok.i, label=tok.ent_label, length=tok.n_raw,
                )
            elif tok.pos in ("NOUN", "PROPN", "VERB"):
                node = make_node(
                    get_lemma_key_tokens([(tok.lemma, tok.pos)]), tok.text,
                    tok.pos, "lem", sent.sent_id, tok.i,
                )
            else:
                # unlinked placeholder with doc-unique key (doc.py:228-239);
                # the index is doc-global so keys never collide across
                # sentences (pipe.py:298-299 uses spaCy's doc-level token.i)
                node = make_node(
                    get_lemma_key_tokens([(tok.lemma, tok.pos)], placeholder_idx=tok_offset + tok.i),
                    tok.text, tok.pos, "dep", sent.sent_id, tok.i, linked=False,
                )
            sent_nodes.append(node)

        for tok, node in zip(sent.tokens, sent_nodes):
            # remap NER label to a class IRI and link it (doc.py:427-438).
            # Deliberately fires only on the FIRST mention: the reference's
            # remap_ner(<already-an-IRI>) returns None on re-mention
            # (kg.py remap_ner + doc.py:431-438), so its class-node count
            # stays 1 per entity — parity over per-mention counting. (We
            # additionally keep the IRI label instead of the reference's
            # label=None side effect on re-mention.)
            if node.kind == "ent" and link_classes:
                iri = lex.NER_MAP.get(node.label or "", (None,))[0] if node.label else None
                if iri is not None:
                    node.label = iri
                    _make_class_link(g, node, make_edge)
            # DEP edge to the token's head (doc.py:440-459)
            make_edge(node, sent_nodes[tok.head], "dep", tok.dep, 1.0)
            if tok.dep in ("nsubj", "pobj"):
                node.sub_obj = True

        all_sent_nodes.append(sent_nodes)
        tok_offset += len(sent.tokens)

    # noun-chunk overlay, one pass per doc AFTER all sentences
    # (doc.py:309-378, pipe.py:327-373): novelty ("unseen") is decided
    # against the node set as it stood before the overlay began
    pre_overlay_keys = set(g.nodes.keys())
    for sent, sent_nodes in zip(doc.sents, all_sent_nodes):
        for (cs, ce) in sent.chunks:
            raw_pairs = [p for t in sent.tokens[cs:ce] for p in t.raw]
            chunk_key = get_lemma_key_tokens(raw_pairs)
            if chunk_key in pre_overlay_keys:
                continue
            if chunk_key in g.nodes:
                node = g.nodes[chunk_key]
                node.count += 1
                node.loc.append([text_id, para_id, sent.sent_id, cs])
            else:
                surface = " ".join(t.text for t in sent.tokens[cs:ce])
                node = DocNode(
                    len(g.nodes), chunk_key, surface, "noun_chunk", "chu",
                    length=ce - cs, count=1,
                    loc=[[text_id, para_id, sent.sent_id, cs]],
                )
                g.nodes[chunk_key] = node
            for k in range(cs, ce):
                make_edge(node, sent_nodes[k], "chu", "noun_chunk", 1.0)

    return g


def _make_class_link(g: DocGraph, node: DocNode, make_edge) -> None:
    """Link an entity node to its class-IRI node (doc.py:242-306)."""
    iri = node.label
    assert iri is not None
    if iri in g.nodes:
        dst = g.nodes[iri]
        dst.count += 1
    else:
        meta = next((m for m in lex.NER_MAP.values() if m[0] == iri), None)
        definition = meta[1] if meta else iri
        cls_label = meta[2] if meta else iri
        dst = DocNode(
            len(g.nodes), iri, definition, lex.RDF_TYPE, "iri",
            label=cls_label, length=len(cls_label.split(" ")), count=1,
        )
        g.nodes[iri] = dst
    node.annotated = True
    # prob = node.weight is 0.0 here because ranking runs after the build —
    # the reference does exactly the same (doc.py:295 passes node.weight
    # before calc_phrase_ranks has run); kept for parity
    make_edge(node, dst, "iri", lex.RDF_TYPE, node.weight)
