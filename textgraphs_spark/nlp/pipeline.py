"""Deterministic tokenizer / tagger / lemmatizer / NER / chunker / deps.

A rule-based stand-in for the reference's three spaCy pipelines
(reference: textgraphs/pipe.py:216-270 builds tok/ner/aux docs). The goal
is not linguistic fidelity — it is *invariant extraction*: the same input
string always yields the same tokens, tags, entity spans, noun chunks, and
heads, on any executor, forever. The reference itself notes spaCy load is
"one of the more expensive operations" (pipe.py:434-437); this replacement
is also ~1000x cheaper to initialize, which matters when Spark spins up
hundreds of Python workers.

The parse produces a *merged-entity* token sequence per sentence, mirroring
the reference's ``ner_pipe.add_pipe("merge_entities")`` (pipe.py:509-511):
a multi-token named-entity span becomes one token whose ``raw`` field keeps
the underlying (lemma, pos) pairs needed for invariant lemma keys
(pipe.py:273-311).
"""

from __future__ import annotations

import re
from functools import lru_cache
from dataclasses import dataclass, field

from . import lex

# "[A-Z]\." keeps name-initial abbreviations ("W. Herzog") as one token
_TOKEN_RE = re.compile(r"[A-Z]\.(?=\s|$)|[A-Za-z0-9]+(?:['’][A-Za-z]+)?|[^\sA-Za-z0-9]")
# sentence break after .!? — except when the period closes a single-capital
# abbreviation ("J." in "Ingrid J. Keller")
_SENT_RE = re.compile(r"(?<=[.!?])(?<![A-Z]\.)\s+")
_NUM_RE = re.compile(r"^[0-9]+$")


@dataclass
class Token:
    i: int                 # index within the merged sentence
    text: str
    lemma: str             # lowercase lemma of the (merged) token
    pos: str
    dep: str = "dep"
    head: int = 0          # index (within sentence) of the head token
    idx: int = 0           # char offset within the document
    ent_label: str | None = None
    # underlying raw (lemma, pos) pairs — length > 1 only for merged entities
    raw: list[tuple[str, str]] = field(default_factory=list)

    @property
    def n_raw(self) -> int:
        return len(self.raw)


@dataclass
class Sentence:
    sent_id: int
    tokens: list[Token]
    # noun chunks as (start, end_exclusive) over merged token indices
    chunks: list[tuple[int, int]] = field(default_factory=list)


@dataclass
class Doc:
    text: str
    sents: list[Sentence]


@lru_cache(maxsize=65536)
def _tag(word: str, sent_initial: bool) -> str:
    low = word.lower()
    if not word[0].isalnum():
        return "PUNCT"
    if _NUM_RE.match(word):
        return "NUM"
    if low in lex.DET:
        return "DET"
    if low in lex.AUX:
        return "AUX"
    if low in lex.ADP:
        return "ADP"
    if low in lex.PRON:
        return "PRON"
    if low in lex.CCONJ:
        return "CCONJ"
    if low in lex.SCONJ:
        return "SCONJ"
    if low in lex.ADV:
        return "ADV"
    if word[0].isupper() and not (sent_initial and low in lex.COMMON_WORDS):
        return "PROPN"
    if low in lex.VERB or lex.IRREGULAR_LEMMA.get(low) in lex.VERB:
        return "VERB"
    if low in lex.ADJ:
        return "ADJ"
    if low.endswith("ly") and len(low) > 4:
        return "ADV"
    if (low.endswith("ing") or low.endswith("ed")) and low not in lex.ING_ED_NOUNS and len(low) > 4:
        return "VERB"
    if low.endswith(("ous", "ful", "ive", "able", "ible")) and len(low) > 5:
        return "ADJ"
    if low.endswith("s") and not low.endswith(("ss", "us", "is")) and lemmatize(low, "VERB") in lex.VERB:
        # 3rd-person singular of a known verb ("runs", "makes")
        return "VERB"
    return "NOUN"


@lru_cache(maxsize=65536)
def lemmatize(word: str, pos: str) -> str:
    """Rule-based lemma; always lowercase (keys lowercase anyway,
    mirroring ``span.lemma_.strip().lower()`` in pipe.py:294).

    lru_cache: both functions are pure (word, arg) -> str and word
    frequency is Zipfian in any real corpus, so the cache converts the
    per-token rule cascade into a dict hit for the head of the
    distribution. 64k entries x ~40 B is worker-negligible.
    """
    low = word.lower()
    if low in lex.IRREGULAR_LEMMA:
        return lex.IRREGULAR_LEMMA[low]
    if pos in ("PROPN", "PUNCT", "NUM", "DET", "ADP", "PRON", "CCONJ", "SCONJ"):
        return low
    if pos in ("VERB", "AUX"):
        if low.endswith("ing") and len(low) > 5 and low not in lex.ING_ED_NOUNS:
            stem = low[:-3]
            return _fix_stem(stem)
        if low.endswith("ed") and len(low) > 4 and low not in lex.ING_ED_NOUNS:
            stem = low[:-2]
            return _fix_stem(stem)
        if low.endswith("ies") and len(low) > 4:
            return low[:-3] + "y"
        if low.endswith("es") and len(low) > 3 and low[-3] in "sxzo":
            return low[:-2]
        if low.endswith("s") and not low.endswith(("ss", "us", "is")) and len(low) > 3:
            return low[:-1]
        return low
    # nouns / adjectives: plural stripping only
    if low.endswith("ies") and len(low) > 4:
        return low[:-3] + "y"
    if low.endswith(("sses", "shes", "ches", "xes", "zes")) and len(low) > 4:
        return low[:-2]
    if low.endswith("s") and not low.endswith(("ss", "us", "is")) and len(low) > 3:
        return low[:-1]
    return low


def _fix_stem(stem: str) -> str:
    """Undo consonant doubling / restore trailing 'e' after -ing/-ed strip."""
    if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in "aeioulsz":
        return stem[:-1]
    if stem in lex.VERB:
        return stem
    if (stem + "e") in lex.VERB:
        return stem + "e"
    if len(stem) > 2 and stem[-1] not in "aeiou" and stem[-2] in "aeiou" and stem[-3] not in "aeiou":
        # CVC pattern often drops a final 'e' ("making" -> "make")
        candidate = stem + "e"
        if candidate in lex.VERB:
            return candidate
    return stem


def _ner_label(surface: str, n_tokens: int) -> str:
    low = surface.lower()
    if low in lex.GAZETTEER_GPE:
        return "GPE"
    if low in lex.GAZETTEER_ORG:
        return "ORG"
    if n_tokens == 1 and low in lex.GAZETTEER_GPE:
        return "GPE"
    return "PERSON"


def parse_doc(text: str) -> Doc:
    """Full deterministic parse: sentences → merged tokens with POS,
    lemma, entity label, dependency head/label, plus noun chunks."""
    sents: list[Sentence] = []
    offset = 0
    for sent_id, sent_text in enumerate(_SENT_RE.split(text)):
        if not sent_text:
            continue
        start_char = text.find(sent_text, offset)
        offset = start_char + len(sent_text)
        sents.append(_parse_sentence(sent_id, sent_text, start_char))
    return Doc(text=text, sents=sents)


def _parse_sentence(sent_id: int, sent_text: str, base_off: int) -> Sentence:
    # 1. raw tokenization + tags
    raw_words: list[tuple[str, int]] = [
        (m.group(0), base_off + m.start()) for m in _TOKEN_RE.finditer(sent_text)
    ]
    raw_tags = [_tag(w, i == 0) for i, (w, _) in enumerate(raw_words)]
    raw_lemmas = [lemmatize(w, t) for (w, _), t in zip(raw_words, raw_tags)]

    # 2. NER: maximal runs of PROPN tokens (len >= 1)
    ent_spans: list[tuple[int, int]] = []
    i = 0
    n = len(raw_words)
    while i < n:
        if raw_tags[i] == "PROPN":
            j = i
            while j + 1 < n and raw_tags[j + 1] == "PROPN":
                j += 1
            ent_spans.append((i, j + 1))
            i = j + 1
        else:
            i += 1

    # 3. merge entity runs into single tokens (mirrors spaCy merge_entities)
    tokens: list[Token] = []
    ent_iter = iter(ent_spans)
    cur = next(ent_iter, None)
    i = 0
    while i < n:
        if cur is not None and cur[0] == i:
            s, e = cur
            surface = sent_text[raw_words[s][1] - base_off : raw_words[e - 1][1] - base_off + len(raw_words[e - 1][0])]
            raw_pairs = [(raw_lemmas[k], raw_tags[k]) for k in range(s, e)]
            tokens.append(
                Token(
                    i=len(tokens),
                    text=surface,
                    lemma=" ".join(raw_lemmas[s:e]),
                    pos="PROPN",
                    idx=raw_words[s][1],
                    ent_label=_ner_label(surface, e - s),
                    raw=raw_pairs,
                )
            )
            cur = next(ent_iter, None)
            i = e
        else:
            w, off = raw_words[i]
            tokens.append(
                Token(
                    i=len(tokens),
                    text=w,
                    lemma=raw_lemmas[i],
                    pos=raw_tags[i],
                    idx=off,
                    raw=[(raw_lemmas[i], raw_tags[i])],
                )
            )
            i += 1

    _assign_heads(tokens)
    chunks = _noun_chunks(tokens)
    return Sentence(sent_id=sent_id, tokens=tokens, chunks=chunks)


def _assign_heads(tokens: list[Token]) -> None:
    """Deterministic shallow dependency arcs. Only the labels the engine
    consumes matter: ``nsubj``/``pobj`` set the sub_obj flag
    (reference: doc.py:462-463); everything else just names DEP edges."""
    if not tokens:
        return
    root = next((t.i for t in tokens if t.pos == "VERB"), None)
    if root is None:
        root = next((t.i for t in tokens if t.pos == "AUX"), None)
    if root is None:
        root = next((t.i for t in tokens if t.pos in ("NOUN", "PROPN")), 0)

    def next_nominal(i: int) -> int | None:
        for t in tokens[i + 1 :]:
            if t.pos in ("NOUN", "PROPN"):
                return t.i
        return None

    def prev_attach(i: int) -> int:
        for t in reversed(tokens[:i]):
            if t.pos in ("NOUN", "PROPN", "VERB", "AUX"):
                return t.i
        return root

    seen_root_nominal = False
    for t in tokens:
        if t.i == root:
            t.dep = "ROOT"
            t.head = root
            continue
        if t.pos == "PUNCT":
            t.dep, t.head = "punct", root
        elif t.pos == "DET":
            nn = next_nominal(t.i)
            t.dep, t.head = "det", (nn if nn is not None else root)
        elif t.pos == "ADJ":
            nn = next_nominal(t.i)
            t.dep, t.head = "amod", (nn if nn is not None else root)
        elif t.pos == "ADP":
            t.dep, t.head = "prep", prev_attach(t.i)
        elif t.pos == "ADV":
            t.dep, t.head = "advmod", root
        elif t.pos in ("CCONJ", "SCONJ"):
            t.dep, t.head = "cc", root
        elif t.pos == "AUX":
            t.dep, t.head = "aux", root
        elif t.pos in ("NOUN", "PROPN", "PRON", "NUM"):
            # governed by the nearest preceding ADP if one intervenes
            # after the previous nominal/verb; else subject/object of root
            gov = None
            for p in reversed(tokens[: t.i]):
                if p.pos == "ADP":
                    gov = p.i
                    break
                if p.pos in ("NOUN", "PROPN", "VERB", "AUX"):
                    break
            if gov is not None:
                t.dep, t.head = "pobj", gov
            elif t.i < root:
                t.dep, t.head = "nsubj", root
            else:
                if not seen_root_nominal:
                    t.dep, t.head = "attr", root
                    seen_root_nominal = True
                else:
                    t.dep, t.head = "conj", root
        else:
            t.dep, t.head = "dep", root


def _noun_chunks(tokens: list[Token]) -> list[tuple[int, int]]:
    """Base NPs over merged tokens: [DET]? [ADJ|NOUN]* (NOUN|PROPN)."""
    chunks: list[tuple[int, int]] = []
    i = 0
    n = len(tokens)
    while i < n:
        if tokens[i].pos in ("DET", "ADJ", "NOUN", "PROPN"):
            j = i
            last_nominal = None
            while j < n and tokens[j].pos in ("DET", "ADJ", "NOUN", "PROPN", "CCONJ"):
                if tokens[j].pos in ("NOUN", "PROPN"):
                    last_nominal = j
                j += 1
            if last_nominal is not None:
                chunks.append((i, last_nominal + 1))
                i = last_nominal + 1
            else:
                i = j
        else:
            i += 1
    return chunks
