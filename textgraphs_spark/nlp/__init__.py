"""Deterministic, dependency-free NLP used inside Arrow-batched UDFs.

Replaces the reference's spaCy pipelines (reference: textgraphs/pipe.py:211-270)
with pure, versioned rule code so that extraction is *byte-identical and
reproducible* across executors, Spark versions, and reruns — a requirement
the reference cannot meet with downloaded model weights.

Everything here is plain Python operating on one string at a time; the Spark
layer calls these functions from ``mapInPandas`` over Arrow batches, so the
per-row work stays inside a vectorized batch boundary.
"""

from .pipeline import Doc, Sentence, Token, parse_doc
from .keys import get_lemma_key_tokens

__all__ = ["Doc", "Sentence", "Token", "parse_doc", "get_lemma_key_tokens"]
