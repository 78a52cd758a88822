"""Property-based tests (hypothesis) for the pure kernels.

The reference has no property tests (SURVEY.md §5); these guard the
invariants everything else is built on: extraction determinism, lemma-key
grammar, Jaro-Winkler semantics (vs DuckDB's implementation — the oracle
the driver uses), and the restack LP solution.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from textgraphs_spark.doclevel.build import build_doc_graph
from textgraphs_spark.doclevel.rank import solve_restack_coeffs
from textgraphs_spark.nlp.pipeline import parse_doc
from textgraphs_spark.operators.scoring import jaro_winkler, name_match_score

TEXTS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=200,
)
WORDS = st.text(alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz"), min_size=0, max_size=12)


@given(TEXTS)
@settings(max_examples=200, deadline=None)
def test_parse_never_crashes_and_is_deterministic(text):
    d1 = parse_doc(text)
    d2 = parse_doc(text)
    t1 = [(t.text, t.pos, t.lemma, t.dep, t.head) for s in d1.sents for t in s.tokens]
    t2 = [(t.text, t.pos, t.lemma, t.dep, t.head) for s in d2.sents for t in s.tokens]
    assert t1 == t2
    for s in d1.sents:
        for t in s.tokens:
            assert 0 <= t.head < len(s.tokens)


@given(TEXTS)
@settings(max_examples=100, deadline=None)
def test_doc_graph_invariants(text):
    g = build_doc_graph(text)
    ids = [n.node_id for n in g.nodes.values()]
    assert ids == list(range(len(ids)))  # dense insertion-order ids
    for e in g.edges.values():
        assert e.src != e.dst  # no self-loops (graph.py:220-221)
        assert 0 <= e.src < len(ids) and 0 <= e.dst < len(ids)
    for n in g.nodes.values():
        if n.kind in ("ent", "lem", "chu"):
            assert n.count >= 1
            assert len(n.loc) == n.count  # loc accumulates with count


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@given(WORDS, WORDS)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_matches_duckdb(a, b):
    got = jaro_winkler(a, b)
    con = duckdb.connect()
    expected = con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert abs(got - expected) < 1e-12, (a, b, got, expected)


@given(WORDS, WORDS)
@settings(max_examples=200, deadline=None)
def test_jw_bounds_and_symmetry(a, b):
    s = jaro_winkler(a, b)
    assert 0.0 <= s <= 1.0
    assert jaro_winkler(b, a) == s
    if a == b and a:
        assert s == 1.0


@given(st.text(min_size=0, max_size=40), st.text(min_size=0, max_size=40))
@settings(max_examples=200, deadline=None)
def test_name_match_score_bounds(a, b):
    s = name_match_score(a, b)
    assert 0.0 <= s <= 1.0 + 1e-12


@given(st.lists(st.tuples(st.text(max_size=24), st.text(max_size=24)),
                min_size=0, max_size=60))
@settings(max_examples=60, deadline=None)
def test_vectorized_kernels_match_scalar(pairs):
    """The DuckDB-backed batch kernels (_jw_batch and the batched
    name-match arithmetic inside name_match_udf) must be bit-equal to
    the scalar reference implementations on arbitrary text."""
    import numpy as np
    import pandas as pd

    from textgraphs_spark.operators.scoring import _jw_batch, name_match_udf

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got_jw = _jw_batch(np.array(a, dtype=object), np.array(b, dtype=object))
    for x, y, g in zip(a, b, got_jw):
        assert abs(g - jaro_winkler(x, y)) < 1e-12, (x, y)
    # drive the batched name-match body directly (the pandas_udf wrapper
    # stores the original function on .func)
    got_nm = name_match_udf.func(pd.Series(a, dtype=object), pd.Series(b, dtype=object))
    for x, y, g in zip(a, b, got_nm):
        assert abs(g - name_match_score(x, y)) < 1e-12, (x, y)


def test_jw_batch_without_duckdb(monkeypatch):
    """Worker-image contract (README): when duckdb is absent on an
    executor, the batch kernel must fall back to the memoized
    pure-Python JW per worker — bit-equal output, no exception."""
    import numpy as np

    from textgraphs_spark.operators import scoring

    def _no_duckdb():
        raise ImportError("No module named 'duckdb' (simulated)")

    monkeypatch.setattr(scoring, "_jw_conn", _no_duckdb)
    a = np.array(["werner herzog", "anna klein", "café", ""], dtype=object)
    b = np.array(["werner herzg", "anna kline", "cafe", "x"], dtype=object)
    got = scoring._jw_batch(a, b)
    for x, y, g in zip(a, b, got):
        assert abs(g - jaro_winkler(x, y)) < 1e-12, (x, y)


@given(
    st.floats(0.001, 10), st.floats(0.001, 10),
    st.floats(0.0001, 5), st.floats(0.0001, 5),
)
@settings(max_examples=300, deadline=None)
def test_restack_lp_constraints(sum_e, sum_l, min_e, max_l):
    """The closed-form solve must satisfy the LP constraints
    (doc.py:771-781): objective slack >= 0, coef0 >= coef1 >= 0, and both
    equality constraints within tolerance."""
    c0, c1 = solve_restack_coeffs(sum_e, sum_l, min_e, max_l)
    assert c0 >= c1 >= 0
    slack1 = 1.0 - (c0 * sum_e + c1 * sum_l)
    slack2 = c0 * min_e - c1 * max_l
    assert slack1 >= -1e-9
    assert abs(slack1 - slack2) < 1e-6
