"""Per-document lemma-graph construction + ranking (the "map" stage).

The reference processes one paragraph chunk at a time and explicitly frames
this as map-reduce-able (reference: docs/graph.md:26-28, docs/lemma.md:21-23).
This package is that per-chunk computation as pure Python over one document,
invoked from ``mapInPandas`` so each Arrow batch of documents is processed
inside a single vectorized UDF call.
"""

from .build import DocGraph, build_doc_graph
from .rank import pagerank, restack_ranks

__all__ = ["DocGraph", "build_doc_graph", "pagerank", "restack_ranks"]
