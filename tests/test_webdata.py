"""Corpus-curation operator tests: repetition signals, boilerplate
n-gram mining, benchmark decontamination, minhash cluster closure."""

import pytest
from pyspark.sql import functions as F

from textgraphs_spark.operators import webdata as W


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "a a a b": 4 words / 2 distinct; bigrams (a a)x2 (a b);
        # trigrams (a a a) (a a b)
        (0, "a a a b"),
        (1, "x"),                              # sub-bigram doc: fractions 0.0
        (2, ""),                               # empty doc: all zeros
        (3, "alpha beta gamma delta epsilon"),  # all-distinct, flat grams
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_signals_known_values(docs):
    out = {r["doc_id"]: r for r in W.repetition_signals(docs).collect()}
    assert len(out) == 4  # sub-bigram docs still present via the left join
    r0 = out[0]
    assert r0["n_words"] == 4
    assert r0["dup_word_frac"] == 0.5
    assert r0["top_bigram_frac"] == round(2 / 3, 6)
    assert r0["top_trigram_frac"] == 0.5
    assert out[1]["n_words"] == 1
    assert out[1]["dup_word_frac"] == 0.0
    assert out[1]["top_bigram_frac"] == 0.0
    assert out[2]["n_words"] == 0
    assert out[2]["dup_word_frac"] == 0.0
    r3 = out[3]
    assert r3["dup_word_frac"] == 0.0
    assert r3["top_bigram_frac"] == 0.25  # 4 distinct bigrams, each once


def test_boilerplate_ngrams_planted(spark):
    # "cookie policy accepted" planted in 4 docs, once twice
    base = "cookie policy accepted"
    rows = [(i, f"unique{i} words here {base}") for i in range(4)]
    rows.append((9, f"no shared trigrams in this document at all {base} {base}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["gram"]: r for r in W.boilerplate_ngrams(docs, n=3, min_df=5).collect()}
    # only the planted gram clears min_df (the shared "words here cookie"
    # context trigrams reach df=4; per-doc-unique prefixes df=1)
    assert set(out) == {base}
    assert out[base]["df"] == 5
    assert out[base]["n_occurrences"] == 6  # doc 9 contributes two occurrences


def test_contaminated_docs_planted(spark):
    ev = spark.createDataFrame(
        [(100, "the exact benchmark answer string here")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (0, "prefix words the exact benchmark answer string here suffix"),
            (1, "entirely unrelated corpus document with different words"),
            # shares every WORD with the eval doc but no 4-gram — word
            # overlap alone must not flag contamination
            (2, "answer string here exact benchmark the"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in W.contaminated_docs(corpus, ev, n=4).collect()}
    assert 0 in out and 1 not in out
    # doc 0 contains the eval text verbatim: all 3 eval 4-grams match
    assert out[0]["n_matched"] == 3
    assert out[0]["n_grams"] == 6  # 9 words -> 6 distinct 4-grams
    assert out[0]["overlap_frac"] == 0.5
    assert 2 not in out  # word overlap without any shared 4-gram


def test_curation_decisions_every_gate(spark):
    """One doc per ladder rung + a keeper; reasons are the FIRST failing
    gate, so e.g. the low-quality doc must still be English (the lang
    gate sits above quality) and the repetitive doc must clear quality."""
    dup_base = (
        "the quick brown fox jumps over the lazy dog with many more words "
        "to comfortably pass every single quality gate in the ladder"
    )
    rows = [
        (0, dup_base + " first"),   # canonical member of the near-dup pair
        (1, dup_base + " second"),  # near_dup (non-canonical)
        (2, "der schnelle braune fuchs springt und ist nicht mit auf dem feld"),  # lang
        (3, "the x y z!!!!!!!!!!!!!!!!"),  # English but junk -> low_quality
        (4, "the spam spam spam spam spam spam spam spam spam spam spam"),  # repetitive
        (5, "the quiet analyst wrote careful notes about spark plans with time for review"),  # keep
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in W.curation_decisions(docs, threshold=0.5).collect()
    }
    assert len(out) == 6  # every document gets exactly one verdict
    assert out[0]["reason"] == "keep" and out[0]["keep"]
    assert out[1]["reason"] == "near_dup"
    assert out[2]["reason"] == "lang"
    assert out[3]["reason"] == "low_quality"
    assert out[4]["reason"] == "repetitive"
    assert out[5]["reason"] == "keep" and out[5]["keep"]
    assert all((r["reason"] == "keep") == r["keep"] for r in out.values())


def test_minhash_clusters_match_pairs_closure(spark):
    # near-dup chain 0~1~2 (transitive cluster) + pair 10~11 + singleton
    t = (
        "large identical shingle body shared across the documents in this "
        "cluster with only tiny differences at the very end"
    )
    rows = [
        (0, t + " zero"),
        (1, t + " one"),
        (2, t + " two"),
        (10, "another repeated near duplicate family with its own long body text ten"),
        (11, "another repeated near duplicate family with its own long body text eleven"),
        (20, "completely unrelated content that matches nothing else at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    kw = dict(threshold=0.5)
    clusters = {
        r["keep_id"]: r for r in W.minhash_dedup_clusters(docs, **kw).collect()
    }
    # closure must equal union-find over the pair generator's output
    from textgraphs_spark.operators.dedup import minhash_dedup_pairs

    pairs = [
        (r["left_id"], r["right_id"])
        for r in minhash_dedup_pairs(docs, **kw).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for n in parent:
        expected.setdefault(find(n), []).append(n)
    assert set(clusters) == set(expected)
    for keep, members in expected.items():
        assert clusters[keep]["n_docs"] == len(members)
        assert clusters[keep]["doc_ids"] == "|".join(map(str, sorted(members)))
    # and the planted chain actually formed a 3-cluster (guards against
    # the pair generator silently finding nothing)
    assert clusters[0]["n_docs"] == 3
    assert 20 not in {m for ms in expected.values() for m in ms}
