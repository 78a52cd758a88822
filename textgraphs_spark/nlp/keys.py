"""Invariant lemma-key composition.

Exactly mirrors the reference's key discipline (textgraphs/pipe.py:273-311):

* single token        -> "<lemma.lower()>.<POS>"
* placeholder token   -> "<token_index>.<lemma.lower()>.<POS>"
* multi-token span    -> per-token pairs concatenated with "."
                         e.g. "werner.PROPN.herzog.PROPN"

These keys are the *identity* of a node in the lemma graph, the seed of
entity-cluster identity, and the primary blocking key — so they must be
byte-identical across the whole corpus and across runs.
"""

from __future__ import annotations


def get_lemma_key_tokens(pairs: list[tuple[str, str]], *, placeholder_idx: int | None = None) -> str:
    """Compose a lemma key from (lemma, pos) pairs.

    ``placeholder_idx`` prepends the token index for unlinked stopword
    placeholders (pipe.py:298-299), keeping them doc-unique.
    """
    terms: list[str] = []
    if placeholder_idx is not None:
        terms.append(str(placeholder_idx))
    for lemma, pos in pairs:
        terms.append(lemma.strip().lower())
        terms.append(pos)
    return ".".join(terms)
