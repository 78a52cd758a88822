"""Round-5 operator tests: clustering coefficient, degree
assortativity, suffix blocking, n-gram containment.

Each pins hand-computable values on tiny synthetic graphs/corpora —
the oracle sweep covers corpus-scale value parity, these cover the
semantics the oracle can't isolate (known-topology coefficients,
subset-dup vs resemblance separation, prefix-corruption recall)."""

import pytest
from pyspark.sql import functions as F

from textgraphs_spark.operators.dedup import (
    ngram_containment_pairs, ngram_jaccard_pairs,
)
from textgraphs_spark.operators.graphops import (
    clustering_coefficient, degree_assortativity,
)
from textgraphs_spark.plans.er_eval import suffix_blocking_metrics


def test_clustering_coefficient_known_graph(spark):
    # triangle a-b-c plus pendant d hanging off a:
    #   b, c: deg 2, 1 triangle -> coeff 1.0
    #   a:    deg 3, 1 triangle -> 2*1/(3*2) = 0.333333
    #   d:    deg 1 -> omitted (undefined)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")], "src string, dst string"
    )
    got = {r["node"]: r for r in clustering_coefficient(edges).collect()}
    assert set(got) == {"a", "b", "c"}
    assert got["a"]["deg"] == 3 and got["a"]["triangles"] == 1
    assert got["a"]["coeff"] == 0.333333
    assert got["b"]["coeff"] == 1.0 and got["c"]["coeff"] == 1.0


def test_clustering_coefficient_zero_triangles(spark):
    # path a-b-c: b has deg 2, 0 triangles -> coeff 0.0 (left-join fill)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {r["node"]: r for r in clustering_coefficient(edges).collect()}
    assert set(got) == {"b"}
    assert got["b"]["triangles"] == 0 and got["b"]["coeff"] == 0.0


def test_assortativity_star_is_minus_one(spark):
    # star: every edge joins deg-3 hub to deg-1 leaf -> r = -1 exactly
    edges = spark.createDataFrame(
        [("c", "a"), ("c", "b"), ("c", "d")], "src string, dst string"
    )
    row = degree_assortativity(edges).collect()[0]
    assert row["n_edges"] == 3
    assert row["assortativity"] == -1.0


def test_assortativity_regular_graph_is_null(spark):
    # 4-cycle: all degrees 2, zero variance -> undefined -> NULL
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    row = degree_assortativity(edges).collect()[0]
    assert row["n_edges"] == 4
    assert row["assortativity"] is None


def test_suffix_blocking_catches_prefix_corruption(spark):
    # 'werner herzog' vs 'w herzog': the positional name key channel and
    # any prefix-anchored key miss nothing here, but the point is the
    # SHARED SUFFIX 'herzog' (len >= 5) blocks them together; the
    # unrelated pair shares no >=5 suffix
    ents = spark.createDataFrame(
        [
            ("e1", "Werner Herzog", 1),
            ("e2", "W. Herzog", 1),
            ("e3", "Lotte Eisner", 2),
            ("e4", "Klaus Kinski", 3),
        ],
        "entity_key string, surface string, truth_id long",
    )
    row = suffix_blocking_metrics(ents, min_len=5, max_block=4).collect()[0]
    assert row["covered_true_pairs"] == 1      # the herzog pair
    assert row["pair_completeness"] == 1.0     # it is the only true pair
    assert row["n_candidates"] >= 1


def test_suffix_blocking_stop_suffix_cap(spark):
    # every surface ends in 'common' -> that suffix's block (and its
    # 5-char tail 'ommon') holds all 5 records; max_block=3 drops both,
    # so ONLY pairs sharing a rarer (longer) suffix survive: the twins.
    # The letter just before 'common' differs across non-twins, so no
    # accidental longer suffix is shared.
    ents = spark.createDataFrame(
        [
            ("e1", "zzkaren common", 1),
            ("e2", "zzkaren common", 1),
            ("e3", "qqlouis common", 2),
            ("e4", "rrmarie common", 3),
            ("e5", "ssnigel common", 4),
        ],
        "entity_key string, surface string, truth_id long",
    )
    row = suffix_blocking_metrics(ents, min_len=5, max_block=3).collect()[0]
    assert row["n_candidates"] == 1
    assert row["covered_true_pairs"] == 1


def test_containment_finds_subset_dup_jaccard_misses(spark):
    base = "alpha beta gamma delta epsilon zeta"
    long = base + " " + " ".join(f"tok{i} filler{i} pad{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, base, "s"), (2, long, "s"), (3, "unrelated words entirely here", "s")],
        "doc_id long, text string, source string",
    )
    cont = {
        (r["left_id"], r["right_id"]): r["containment"]
        for r in ngram_containment_pairs(
            docs, n=3, threshold=0.9, block_col="source"
        ).collect()
    }
    # every trigram of the short doc appears in the long one
    assert cont == {(1, 2): 1.0}
    # resemblance on the same pair is low: Jaccard misses it at 0.5
    jac = ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, block_col="source"
    ).collect()
    assert all({r["left_id"], r["right_id"]} != {1, 2} for r in jac)


def test_containment_requires_positive_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "s")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError):
        ngram_containment_pairs(docs, threshold=0.0)


def test_containment_short_docs_empty_grams(spark):
    # docs shorter than n tokens have EMPTY gram sets (the sequence(1,0)
    # guard) -> no pairs, never a phantom 1.0
    docs = spark.createDataFrame(
        [(1, "ab", "s"), (2, "ab", "s")],
        "doc_id long, text string, source string",
    )
    assert ngram_containment_pairs(docs, n=3, threshold=0.1).count() == 0


def test_ktruss_peels_pendant_triangle(spark):
    # two K4-ish blocks? keep it minimal: K4 on {a,b,c,d} is a 4-truss
    # (every edge closes 2 triangles); a pendant triangle {d,e,f} has
    # edge support 1 everywhere, so k=4 peels it entirely — INCLUDING
    # the shared corner d's spokes
    from textgraphs_spark.operators.graphops import ktruss

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    pend = [("d", "e"), ("d", "f"), ("e", "f")]
    edges = spark.createDataFrame(k4 + pend, "src string, dst string")
    got = {(r["a"], r["b"]): r["support"] for r in ktruss(edges, k=4).collect()}
    assert set(got) == set(k4)
    assert all(s == 2 for s in got.values())


def test_ktruss_cascading_peel(spark):
    # triangle chain a-b-c, b-c-d, c-d-e: every edge has support 1,
    # so k=4 empties the graph — and the empty frame has the schema
    from textgraphs_spark.operators.graphops import ktruss

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
         ("c", "e"), ("d", "e")],
        "src string, dst string",
    )
    out = ktruss(edges, k=4)
    assert out.count() == 0
    assert out.columns == ["a", "b", "support"]
    # k=3 (support >= 1) keeps all 7 edges of the triangle chain
    assert ktruss(edges, k=3).count() == 7


def test_phonetic_blocking_sound_alikes(spark):
    # johnson/jonson and smith/smyth key together phonetically while
    # every exact last_tok key splits them; the unrelated pair stays
    # apart -> completeness 1.0 with exactly 2 candidates
    from textgraphs_spark.plans.er_eval import phonetic_blocking_metrics

    ents = spark.createDataFrame(
        [
            ("e1", "Mary Johnson", 1),
            ("e2", "Mary Jonson", 1),
            ("e3", "John Smith", 2),
            ("e4", "Jon Smyth", 2),
            ("e5", "Klaus Kinski", 3),
        ],
        "entity_key string, surface string, truth_id long",
    )
    row = phonetic_blocking_metrics(ents).collect()[0]
    assert row["n_candidates"] == 2
    assert row["covered_true_pairs"] == 2
    assert row["pair_completeness"] == 1.0


def test_phonetic_expr_parity_spark_vs_duckdb(spark):
    # the SAME expression text modulo the 'g' flag must produce the
    # SAME keys in both engines — the parity-by-construction claim
    import duckdb

    from textgraphs_spark.operators.blocking import phonetic_expr

    toks = ["johnson", "jonson", "smith", "smyth", "herzog", "kinski",
            "eisner", "a", "zzz", "aeiou"]
    sdf = spark.createDataFrame([(t,) for t in toks], "t string").selectExpr(
        "t", f"{phonetic_expr('t')} AS k"
    )
    got_spark = {r["t"]: r["k"] for r in sdf.collect()}
    vals = ", ".join(f"('{t}')" for t in toks)
    got_duck = dict(duckdb.sql(
        f"SELECT t, {phonetic_expr('t', duck=True)} FROM (VALUES {vals}) v(t)"
    ).fetchall())
    assert got_spark == got_duck


def test_hits_matches_numpy_power_iteration(spark):
    # step-identical 8-round L2-normalized HITS in numpy must agree to
    # the rounded 6 decimals — the pagerank-vs-numpy parity pattern
    import numpy as np

    from textgraphs_spark.operators.pagerank import hits

    edge_list = [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("a2", "a1"),
                 ("h2", "x"), ("x", "a2")]
    nodes = sorted({n for e in edge_list for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edge_list:
        A[idx[s], idx[d]] = 1.0
    hub = np.ones(len(nodes))
    for _ in range(8):
        auth = A.T @ hub
        auth = auth / np.sqrt((auth ** 2).sum())
        hub = A @ auth
        hub = hub / np.sqrt((hub ** 2).sum())
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r["node"]: (r["authority"], r["hub"]) for r in hits(edges).collect()}
    for n in nodes:
        assert got[n][0] == round(float(auth[idx[n]]), 6), n
        assert got[n][1] == round(float(hub[idx[n]]), 6), n
    # structure: a1 is the dominant authority, h1 the dominant hub
    assert got["a1"][0] == max(v[0] for v in got.values())
    assert got["h1"][1] == max(v[1] for v in got.values())


def test_readability_hand_computed(spark):
    from textgraphs_spark.operators.textquality import readability

    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in readability(docs).collect()}
    r1 = got[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    assert r1["n_syllables"] == 6          # one vowel group per word
    # 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    assert r1["flesch"] == 119.19
    assert r1["ttr"] == 0.833333           # 5 distinct / 6
    r2 = got[2]                            # empty text: NULLs, zero counts
    assert r2["n_words"] == 0 and r2["flesch"] is None and r2["ttr"] is None


def test_readability_syllable_floor(spark):
    # a word with no vowels still counts >= 1 syllable ('rhythm' minus
    # its y? use 'zzz'), and multi-group words count their groups
    from textgraphs_spark.operators.textquality import readability

    docs = spark.createDataFrame(
        [(1, "zzz beautiful")], "doc_id long, text string"
    )
    r = readability(docs).collect()[0]
    # zzz -> 1 (floor); beautiful -> eau, i, u -> 3
    assert r["n_syllables"] == 4


def test_funnel_strict_ordering(spark):
    # u1 completes view->click->purchase in order; u2 clicks BEFORE its
    # first view (click doesn't count) and never purchases; u3 views
    # only. Chain semantics: step times must strictly increase.
    from textgraphs_spark.operators.analytics import funnel_counts

    rows = [
        (1, "view", "2026-01-01 10:00:00"),
        (1, "click", "2026-01-01 10:05:00"),
        (1, "purchase", "2026-01-01 10:10:00"),
        (2, "click", "2026-01-01 09:00:00"),
        (2, "view", "2026-01-01 09:30:00"),
        (3, "view", "2026-01-01 08:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts string")
    got = {r["step"]: r for r in
           funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert got[1]["n_users"] == 3 and got[1]["conv_from_prev"] is None
    assert got[2]["n_users"] == 1          # only u1: u2's click precedes its view
    assert got[3]["n_users"] == 1
    assert got[2]["conv_from_first"] == 0.333333
    assert got[3]["conv_from_prev"] == 1.0


def test_funnel_rejects_single_step(spark):
    from textgraphs_spark.operators.analytics import funnel_counts

    ev = spark.createDataFrame(
        [(1, "view", "2026-01-01 10:00:00")],
        "user_id long, event_type string, ts string",
    )
    with pytest.raises(ValueError):
        funnel_counts(ev, ["view"])


def test_cohort_retention_triangle(spark):
    # u1 first active week 0, returns week 1; u2 joins week 1 only —
    # cohorts anchor at each user's OWN first week
    from textgraphs_spark.operators.analytics import cohort_retention

    rows = [
        (1, "2026-01-05 10:00:00"),   # Monday, week A
        (1, "2026-01-13 10:00:00"),   # week A+1
        (2, "2026-01-14 10:00:00"),   # week A+1 (their week 0)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string")
    got = {(r["cohort_us"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(ev).collect()}
    offsets = sorted((k[1], v) for k, v in got.items())
    assert offsets == [(0, 1), (0, 1), (1, 1)]  # two week-0 cells, one return
    assert len({k[0] for k in got}) == 2        # two distinct cohorts


def test_bigram_xent_word_salad_scores_high(spark):
    # three docs of the SAME unigram distribution; doc 3 scrambles the
    # adjacencies. Unigram xent cannot separate it; bigram xent must.
    from textgraphs_spark.operators.webdata import (
        bigram_cross_entropy, unigram_cross_entropy,
    )

    normal = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(1, normal), (2, normal), (3, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    uni = {r["doc_id"]: r["xent"] for r in unigram_cross_entropy(docs).collect()}
    bi = {r["doc_id"]: r["xent2"] for r in bigram_cross_entropy(docs).collect()}
    assert uni[3] == uni[1]            # unigram-blind to order
    assert bi[3] > bi[1]               # bigram catches the salad
    assert bi[1] == bi[2]


def test_bigram_xent_short_docs(spark):
    from textgraphs_spark.operators.webdata import bigram_cross_entropy

    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_cross_entropy(docs).collect()}
    assert got[1]["n_bigrams"] == 0 and got[1]["xent2"] is None
    assert got[2]["n_bigrams"] == 0 and got[2]["xent2"] is None
    assert got[3]["n_bigrams"] == 1    # its lone bigram: P = 1 -> xent 0
    assert got[3]["xent2"] == 0.0


def test_five_channel_recall_union_dominates(spark):
    # union completeness >= every single channel's, and the frame has
    # exactly the six expected channel rows
    from textgraphs_spark.plans.er_eval import (
        eval_entities, five_channel_recall,
    )

    rows = {r["channel"]: r for r in
            five_channel_recall(eval_entities(spark, n_base=40, n_twin=10)).collect()}
    assert set(rows) == {"name", "minhash", "skeleton", "suffix",
                         "phonetic", "union"}
    u = rows["union"]["pair_completeness"]
    for ch, r in rows.items():
        assert r["pair_completeness"] <= u + 1e-9, ch
        assert r["n_candidates"] >= r["covered_true_pairs"]


def test_dice_known_values(spark):
    # 'Werner Herzog' vs 'Werner X Herzog': sets {werner,herzog} vs
    # {werner,x,herzog} -> dice = 2*2/(2+3) = 0.8, sharing the name key
    from textgraphs_spark.plans.er_eval import dice_study

    ents = spark.createDataFrame(
        [
            ("e1", "Werner Herzog", 1),
            ("e2", "Werner X. Herzog", 1),
            ("e3", "Walter Herzog", 2),
        ],
        "entity_key string, surface string, truth_id long",
    )
    got = {(r["left_id"], r["right_id"]): r for r in dice_study(ents).collect()}
    assert got[("e1", "e2")]["dice"] == 0.8
    assert got[("e1", "e2")]["is_true"] is True
    assert got[("e1", "e3")]["dice"] == 0.5     # {werner,herzog}|{walter,herzog}
    assert got[("e1", "e3")]["is_true"] is False


def test_pack_efficiency_conservation(spark, sf_dir):
    # per-shard invariants of the packing plan: capacity covers tokens,
    # padding < one sequence's worth, and the doc/token totals
    # reconcile with the raw pack output
    import __spark_entry__ as em

    out = em.queries()["pack_efficiency"](spark, sf_dir).collect()
    assert len(out) == 4
    for r in out:
        cap = r["n_seqs"] * 512
        assert 0 <= cap - r["n_tokens"] < 512
        assert 0.0 <= r["padding_frac"] < 512 / cap


def test_span_removal_hand_case(spark):
    """Shared 4-token run 'alpha beta gamma delta' (k=3 grams at two
    starts) disappears from both docs; unique prose survives; the
    untouched doc and the empty doc pass through."""
    from textgraphs_spark.operators.dedup import duplicated_span_removal

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta unique one"),
         (1, "zzz alpha beta gamma delta other words"),
         (2, "totally different text here now"),
         (3, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in duplicated_span_removal(docs).collect()}
    assert got[0]["cleaned"] == "unique one" and got[0]["n_removed"] == 4
    assert got[1]["cleaned"] == "zzz other words"
    assert got[2]["n_removed"] == 0
    assert got[3] == (3, 0, 0, "")


def test_span_removal_intra_doc_repeats_survive(spark):
    """min_docs=2 counts DISTINCT documents: a k-gram repeated twice
    inside one doc but appearing nowhere else is NOT removed."""
    from textgraphs_spark.operators.dedup import duplicated_span_removal

    docs = spark.createDataFrame(
        [(0, "x y z q x y z"), (1, "totally unrelated words here")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in duplicated_span_removal(docs).collect()}
    assert got[0]["n_removed"] == 0
    assert got[0]["cleaned"] == "x y z q x y z"


def test_span_removal_short_docs_untouched(spark):
    """Docs below k tokens produce no grams and survive verbatim, even
    when byte-identical to each other (exact dedup's job, not this)."""
    from textgraphs_spark.operators.dedup import duplicated_span_removal

    docs = spark.createDataFrame(
        [(0, "ab cd"), (1, "ab cd")], "doc_id long, text string")
    rows = duplicated_span_removal(docs, k=3).collect()
    assert all(r["n_removed"] == 0 and r["cleaned"] == "ab cd" for r in rows)


def test_gopher_flags_isolate_each_rule(spark):
    """Seven crafted docs, each violating exactly one Gopher rule, plus
    one clean doc — per-doc flags must pinpoint the single failure."""
    from textgraphs_spark.operators.textquality import gopher_flags

    clean = ("the corpus page of record with words that have value to be used "
             + "data quality filter corpus token mix " * 8).strip()
    docs = [
        ("short", "the tiny little page of nine"),
        ("longwords", "the of " + "extraordinarily incomprehensible " * 30),
        ("symbols", clean + " #" * 10),
        ("bullets", "- the item list of entry records here\n" * 10),
        ("ellipses", ("plain line about the corpus of record\n"
                      "noted line trails away the record of it...\n"
                      "more line drifts beyond the record of it…\n") * 5),
        ("numeric", clean + " 1234567" * 20),
        ("nostop", ("corpus data " + "corpus token filter quality data mix " * 9).strip()),
        ("clean", clean),
    ]
    expect_fail = {
        "short": "word_count", "longwords": "mean_word_len",
        "symbols": "symbol_ratio", "bullets": "bullet_lines",
        "ellipses": "ellipsis_lines", "numeric": "alpha_words",
        "nostop": "stop_words", "clean": None,
    }
    df = spark.createDataFrame(docs, "name string, text string")
    flags = gopher_flags("text")
    rows = df.select("name", *[c.alias(n) for n, c in flags]).collect()
    for r in rows:
        failed = [n for n, _ in flags if r[n] == 0]
        want = expect_fail[r["name"]]
        assert failed == ([want] if want else []), (r["name"], failed)


def test_gopher_census_on_generator(spark):
    """Census totals over gopher_pages(400): each rule's n_fail equals
    the size of its residue class (i % 13 == r), all_rules passes are
    exactly the non-violating residues."""
    from textgraphs_spark.operators.textquality import gopher_census
    from textgraphs_spark.sources.pages import gopher_pages

    n = 400
    res_count = {r: len([i for i in range(n) if i % 13 == r]) for r in range(13)}
    rule_residue = {
        "word_count": 1, "mean_word_len": 2, "symbol_ratio": 3,
        "bullet_lines": 4, "ellipsis_lines": 5, "alpha_words": 6,
        "stop_words": 7,
    }
    got = {r["rule"]: r for r in gopher_census(gopher_pages(spark, n)).collect()}
    assert set(got) == set(rule_residue) | {"all_rules"}
    for rule, res in rule_residue.items():
        assert got[rule]["n_fail"] == res_count[res], rule
        assert got[rule]["n_pass"] == n - res_count[res], rule
    n_bad = sum(res_count[r] for r in rule_residue.values())
    assert got["all_rules"]["n_pass"] == n - n_bad
    assert abs(got["all_rules"]["pass_share"] - (n - n_bad) / n) < 1e-9


def test_edit_join_matches_naive_with_short_strings(spark):
    """edit_distance_join == the naive quadratic join on a corpus that
    exercises every channel: short strings sharing ZERO grams but
    within distance k ('ab'/'cd' would be invisible to any gram index —
    the short channel must catch them), transpositions (lev 2),
     1-substitutions, and far pairs that must be pruned."""
    import itertools

    from textgraphs_spark.operators.blocking import edit_distance_join

    surfs = [
        "ab", "cd", "abc", "alice stone", "alice stnoe", "alise stone",
        "bob stone", "alice ston", "wholly unrelated surface", "a", "",
    ]
    ents = spark.createDataFrame(
        [(f"e{i}", s) for i, s in enumerate(surfs)], "entity_key string, surface string"
    )
    got = {(r["left_id"], r["right_id"]): r["lev"]
           for r in edit_distance_join(ents, k=2).collect()}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(surfs), 2):
        d = lev(a.lower(), b.lower())
        if d <= 2:
            # engine contract (and oracle): left_id < right_id as STRINGS,
            # not enumeration order — "e10" sorts before "e9"
            want[tuple(sorted((f"e{i}", f"e{j}")))] = d
    assert got == want
    assert got[("e0", "e1")] == 2          # zero shared grams, short channel
    assert got[("e3", "e4")] == 2          # transposition
    assert ("e3", "e8") not in got         # far pair pruned AND verified out


def test_c4_line_filter_on_generator(spark):
    """Every C4 gate fires on exactly the residues built to trip it:
    0-kept pages (no terminal punct / short lines), 2-kept pages
    (javascript / policy lines pruned, sentence gate then fails),
    page-gate drops with intact kept lines (lorem kept 5, brace kept 4,
    badword kept 5), and the 3/11 clean residues keep=1."""
    from textgraphs_spark.operators.textquality import c4_line_filter
    from textgraphs_spark.sources.pages import c4_pages

    rows = c4_line_filter(c4_pages(spark, n_pages=440)).collect()
    by_res = {}
    for r in rows:
        by_res.setdefault(r["doc_id"] % 11, []).append(r)
    for res, want_kept, want_keep in [
        (1, 0, 0), (2, 0, 0), (3, 2, 0), (4, 2, 0),
        (5, 5, 0), (6, 4, 0), (7, 5, 0), (8, 2, 0),
        (0, 4, 1), (9, 4, 1), (10, 4, 1),
    ]:
        assert all(r["n_kept"] == want_kept for r in by_res[res]), res
        assert all(r["keep"] == want_keep for r in by_res[res]), res
    # page-gate drops keep their cleaned text (sentences >= 3) — the
    # drop is attributable to the page gate alone
    for res in (5, 6, 7):
        assert all(r["n_sentences"] >= 3 for r in by_res[res])
    # empty cleaned text hashes as md5('') in both engines
    import hashlib
    empty = hashlib.md5(b"").hexdigest()
    assert all(r["clean_md5"] == empty for r in by_res[1])


def test_jaccard_join_matches_naive(spark):
    """jaccard_set_join == the naive quadratic join on a corpus with
    identical sets (j=1), majority-overlap sets, sub-threshold pairs,
    singleton tokens, and an empty-after-normalization surface (must be
    excluded, not crash)."""
    import itertools

    from textgraphs_spark.operators.blocking import jaccard_set_join

    surfs = [
        "alice stone", "alice b stone", "stone alice", "alice stone jr",
        "bob iron gate", "iron gate", "zz", "", "alice", "bob gate iron",
    ]
    ents = spark.createDataFrame(
        [(f"e{i:02d}", s) for i, s in enumerate(surfs)],
        "entity_key string, surface string",
    )
    got = {(r["left_id"], r["right_id"]): r["jaccard"]
           for r in jaccard_set_join(ents, threshold=0.5).collect()}

    def toks(s):
        return set(t for t in s.lower().split() if t)

    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(surfs), 2):
        ta, tb = toks(a), toks(b)
        if not ta or not tb:
            continue
        jac = len(ta & tb) / len(ta | tb)
        if round(jac, 9) >= 0.5:
            want[(f"e{i:02d}", f"e{j:02d}")] = round(jac, 6)
    assert got == want
    assert got[("e00", "e02")] == 1.0            # same token set, reordered
    assert got[("e04", "e09")] == 1.0            # 3-token permutation
    assert got[("e00", "e01")] == round(2 / 3, 6)
    # ('alice stone','alice') -> |inter|=1, |union|=2 -> exactly 0.5: kept,
    # and the length filter (1 >= 0.5*2) admits the asymmetric pair
    assert got[("e00", "e08")] == 0.5


def test_jaccard_join_threshold_boundary(spark):
    """A pair at exactly the threshold is KEPT (>=, both engines round
    through 9 digits first)."""
    from textgraphs_spark.operators.blocking import jaccard_set_join

    ents = spark.createDataFrame(
        [("a", "alice stone"), ("b", "alice")],
        "entity_key string, surface string",
    )
    rows = jaccard_set_join(ents, threshold=0.5).collect()
    assert len(rows) == 1 and rows[0]["jaccard"] == 0.5


def test_modularity_two_triangles_bridge(spark):
    """Two triangles joined by a bridge, plus a pendant in its own
    community: hand-computed q_part per community (m=8), including the
    zero-intra-edge community (left-join fill, negative q_part)."""
    from textgraphs_spark.operators.graphops import modularity_by_community

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("d", "e"), ("e", "f"), ("f", "d"),
         ("c", "d"), ("a", "g")],
        "src string, dst string",
    )
    labels = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x"),
         ("d", "y"), ("e", "y"), ("f", "y"), ("g", "z")],
        "node string, label string",
    )
    got = {r["label"]: r for r in modularity_by_community(edges, labels).collect()}
    assert got["x"]["n_nodes"] == 3 and got["x"]["m_intra"] == 3
    assert got["x"]["d_sum"] == 8          # deg a=3, b=2, c=3
    assert got["x"]["q_part"] == round(3 / 8 - (8 / 16) ** 2, 6)
    assert got["y"]["d_sum"] == 7          # deg d=3, e=2, f=2
    assert got["y"]["q_part"] == round(3 / 8 - (7 / 16) ** 2, 6)
    assert got["z"]["m_intra"] == 0 and got["z"]["d_sum"] == 1
    assert got["z"]["q_part"] == round(-((1 / 16) ** 2), 6)
    # partition quality is the sum of the parts
    q = sum(r["q_part"] for r in got.values())
    assert abs(q - (0.125 + round(3 / 8 - (7 / 16) ** 2, 6) - 0.003906)) < 1e-5


def test_modularity_default_labels_are_label_prop(spark):
    """With labels omitted the operator scores its own label-prop
    partition — every node appears exactly once and q_part sums to a
    finite Q in [-1, 1]."""
    from textgraphs_spark.operators.graphops import (
        label_propagation, modularity_by_community,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f"),
         ("f", "d"), ("c", "d")],
        "src string, dst string",
    )
    rows = modularity_by_community(edges).collect()
    n_nodes = sum(r["n_nodes"] for r in rows)
    assert n_nodes == 6
    q = sum(r["q_part"] for r in rows)
    assert -1.0 <= q <= 1.0
    # the partition scored is exactly label_propagation's
    labs = label_propagation(edges)
    want_labels = {r["label"] for r in labs.collect()}
    assert {r["label"] for r in rows} == want_labels


def test_topk_recall_identical_and_disjoint(spark):
    """recall@k = 1 when the approximate index returns the exact set,
    0 when it returns none of it, fractional otherwise — and a query
    the approximate side misses ENTIRELY still yields a row (left
    join, 0 matched)."""
    from textgraphs_spark.operators.similarity import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30), (3, 31)],
        "q_id long, vec_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 99)],  # q3 absent entirely
        "q_id long, vec_id long",
    )
    got = {r["q_id"]: r for r in topk_recall(exact, approx, "m", k=2).collect()}
    assert got[1]["n_matched"] == 2 and got[1]["recall"] == 1.0
    assert got[2]["n_matched"] == 1 and got[2]["recall"] == 0.5
    assert got[3]["n_matched"] == 0 and got[3]["recall"] == 0.0
    assert all(r["method"] == "m" for r in got.values())


def test_source_mixture_weights_upweights_small_sources(spark):
    """alpha=0.5 mixture: a source with 4x the tokens gets only 2x the
    weight (sqrt scaling); weights sum to 1; eff_epochs flags the small
    source as over-sampled (> 1 pass) under a budget equal to the
    corpus size."""
    docs = spark.createDataFrame(
        [(i, "tok " * 400, "big") for i in range(4)]
        + [(100, "tok " * 400, "small")],
        "doc_id long, text string, source string",
    )
    from textgraphs_spark.operators.webdata import source_mixture_weights

    got = {r["source"]: r for r in source_mixture_weights(
        docs, token_budget=2000).collect()}
    assert got["big"]["n_tokens"] == 1600 and got["small"]["n_tokens"] == 400
    # sqrt(1600)=40, sqrt(400)=20 -> weights 2/3 and 1/3
    assert got["big"]["weight"] == round(2 / 3, 6)
    assert got["small"]["weight"] == round(1 / 3, 6)
    assert abs(sum(r["weight"] for r in got.values()) - 1.0) < 1e-5
    # small source: 2000 * 1/3 / 400 = 1.67 epochs -> over-sampled
    assert got["small"]["eff_epochs"] > 1.0
    assert got["big"]["eff_epochs"] < 1.0


def test_k_anonymity_census_hand_computed(spark):
    """Groups of sizes 1, 2, 5 over one QI column: at k=2 only the
    singleton is below; at k=5 the pair joins it; share_below follows
    the ROW mass, not the group count."""
    from textgraphs_spark.operators.pii import k_anonymity_census

    rows = [("a",)] * 1 + [("b",)] * 2 + [("c",)] * 5
    df = spark.createDataFrame(rows, "qi string")
    got = {r["k"]: r for r in k_anonymity_census(df, ["qi"], ks=(2, 5)).collect()}
    assert got[2]["n_groups"] == 3
    assert got[2]["groups_below"] == 1 and got[2]["rows_below"] == 1
    assert got[2]["share_below"] == 0.125
    assert got[5]["groups_below"] == 2 and got[5]["rows_below"] == 3
    assert got[5]["share_below"] == 0.375


def test_channel_provenance_flags(spark):
    """Sound-alike twins are found by phonetic but not by the exact
    name key; identical surfaces hit every applicable channel; flags
    agree with n_channels."""
    from textgraphs_spark.plans.er_eval import channel_provenance

    ents = spark.createDataFrame(
        [
            ("e1", "Mary Johnson", 1),
            ("e2", "Mary Jonson", 1),
            ("e3", "Mary Johnson", 1),
            ("e4", "Peter Quill", 2),
        ],
        "entity_key string, surface string, truth_id long",
    )
    got = {(r["left_id"], r["right_id"]): r for r in channel_provenance(ents).collect()}
    twins = got[("e1", "e3")]
    assert twins["in_name"] == 1 and twins["in_phonetic"] == 1
    assert twins["is_true"]
    sound = got[("e1", "e2")]
    assert sound["in_phonetic"] == 1
    assert sound["in_name"] == 0          # johnson != jonson exact key
    for r in got.values():
        n = (r["in_name"] + r["in_minhash"] + r["in_skeleton"]
             + r["in_suffix"] + r["in_phonetic"])
        assert n == r["n_channels"]
    assert not any(
        "e4" in k and r["is_true"] for k, r in got.items()
    )


def test_contrastive_pairs_labels_and_determinism(spark):
    """Near-identical docs label 1; bucket-colliding low-Jaccard pairs
    label 0 (when the pair hash keeps them); labels never overlap; and
    the mined set is bit-identical across runs (deterministic
    thinning, no RNG)."""
    from textgraphs_spark.operators.webdata import contrastive_pairs

    base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, base.replace("quick", "rapid").replace("lazy", "idle")
                 .replace("dog", "cat").replace("fox", "wolf")),
            (4, "completely different text about spark physical plans and shuffles"),
        ],
        "doc_id long, text string",
    )
    r1 = contrastive_pairs(docs, hi=0.6, lo=0.4, neg_keep=1.0).collect()
    r2 = contrastive_pairs(docs, hi=0.6, lo=0.4, neg_keep=1.0).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    by_label = {}
    for r in r1:
        by_label.setdefault(r["label"], []).append((r["left_id"], r["right_id"]))
    assert (1, 2) in by_label.get(1, [])           # near-identical pair
    for lab, pairs in by_label.items():
        other = by_label.get(1 - lab, [])
        assert not set(pairs) & set(other)
    for r in r1:
        assert (r["jaccard"] >= 0.6) if r["label"] == 1 else (r["jaccard"] <= 0.4)


def test_cluster_depth_census_chain_star_singleton(spark):
    """Chain a-b-c-d has eccentricity 3 from its min-key root; a star
    rooted at a LEAF (min key) reaches the far leaves at depth 2; a
    singleton sits at depth 0."""
    from textgraphs_spark.plans.er_eval import cluster_depth_census

    matches = spark.createDataFrame(
        [("a", "b", 0.95), ("b", "c", 0.95), ("c", "d", 0.95),
         ("m", "z", 0.95), ("n", "z", 0.95), ("p", "z", 0.95)],
        "left_id string, right_id string, score double",
    )
    assigns = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
         ("z", "m"), ("m", "m"), ("n", "m"), ("p", "m"),
         ("solo", "solo")],
        "entity_key string, cluster_id string",
    )
    got = {r["max_depth"]: (r["n_clusters"], r["n_entities"])
           for r in cluster_depth_census(assigns, matches).collect()}
    assert got[3] == (1, 4)     # the chain
    assert got[2] == (1, 4)     # star via leaf root: m->z->n,p
    assert got[0] == (1, 1)     # the singleton
    assert set(got) == {0, 2, 3}


def test_similarity_joins_null_and_unicode_surfaces(spark):
    """NULL surfaces and surfaces that normalize to empty (pure-unicode
    names under the [A-Za-z ] normalizer) are EXCLUDED, not crashed on,
    by both lossless similarity joins; the surviving ASCII pair still
    matches."""
    from textgraphs_spark.operators.blocking import (
        edit_distance_join, jaccard_set_join,
    )

    ents = spark.createDataFrame(
        [("e1", "alice stone"), ("e2", "alice stone"), ("e3", None),
         ("e4", "寿司 太郎"), ("e5", "émile zola")],
        "entity_key string, surface string",
    )
    ej = {(r["left_id"], r["right_id"]): r["lev"]
          for r in edit_distance_join(ents, k=2).collect()}
    assert ej[("e1", "e2")] == 0
    assert all("e3" not in k and "e4" not in k for k in ej)
    jj = {(r["left_id"], r["right_id"]): r["jaccard"]
          for r in jaccard_set_join(ents, threshold=0.5).collect()}
    assert jj[("e1", "e2")] == 1.0
    assert all("e3" not in k and "e4" not in k for k in jj)
    # 'émile zola' normalizes to 'mile zola' (accented char stripped):
    # still a valid 2-token surface, present in neither result only
    # because nothing matches it — not because it was dropped
    assert not any("e5" in k for k in jj)


def test_two_table_linkage_semantics(spark):
    """Linked pairs are strictly cross-table (A keys < n_true, B keys
    >= n_true), assignments are one-to-one in both directions, and the
    precision on the labeled corpus is high (the point of reciprocal
    best)."""
    from textgraphs_spark.plans.er_eval import eval_entities, two_table_linkage

    rows = two_table_linkage(eval_entities(spark)).collect()
    assert rows, "linkage produced no assignments"
    a_seen, b_seen = set(), set()
    for r in rows:
        ai, bi = int(r["left_id"][1:]), int(r["right_id"][1:])
        assert ai < 180 and bi >= 180
        assert r["left_id"] not in a_seen and r["right_id"] not in b_seen
        a_seen.add(r["left_id"]); b_seen.add(r["right_id"])
        assert r["score"] >= 0.9          # only above-threshold assignments
    precision = sum(r["is_true"] for r in rows) / len(rows)
    # the corpus DESIGNS a precision ceiling: twin entities' initialed
    # forms are byte-identical to their base partner's (_eval_name_lists
    # docstring), so those B records are unresolvable by ANY name-only
    # linker and reciprocal-best picks one by tie-break. Links are
    # correct away from that designed ambiguity, so precision sits well
    # above chance but below 1.0 — assert the band, not perfection.
    assert 0.7 <= precision < 1.0
    # and the designed pressure is the ONLY error source: every false
    # link involves a TWIN entity (truth >= n_base) on at least one
    # side — base-vs-base links are never confused
    for r in rows:
        if not r["is_true"]:
            a_truth = int(r["left_id"][1:]) % 180
            b_truth = int(r["right_id"][1:]) % 180
            assert a_truth >= 150 or b_truth >= 150, (r["left_id"], r["right_id"])


def test_dedup_ablation_channels_and_overlaps(spark):
    """A corpus with byte-exact twins (caught by every channel),
    near-identical docs (minhash+simhash), and unrelated docs: the
    census reports each channel's removals, their overlaps, and the
    deduplicated union."""
    from textgraphs_spark.operators.webdata import dedup_channel_ablation

    base = ("the quick brown fox jumps over the lazy dog beside the "
            "quiet river bank every single morning before dawn arrives")
    docs = spark.createDataFrame(
        [
            (1, base), (2, base),                       # byte-exact pair
            (3, base + " today"),                       # near-dup of 1
            (4, "completely unrelated text about catalyst optimizer rules"
                " and adaptive query execution in distributed engines"),
        ],
        "doc_id long, text string",
    )
    got = {r["channel"]: r["n_removed"]
           for r in dedup_channel_ablation(docs).collect()}
    assert got["exact"] == 1                      # doc 2
    assert got["minhash"] >= 2                    # docs 2 and 3 at least
    assert got["exact_and_minhash"] == 1          # doc 2 in both
    assert got["any"] >= got["minhash"]
    assert got["any"] <= 3                        # doc 4 never removed
    # union counts distinct ids, never double-counts channel overlaps
    assert got["any"] < got["exact"] + got["minhash"] + got.get("simhash", 0) \
        or got["exact_and_minhash"] == 0


def test_dsir_weights_separate_target_from_offtarget(spark):
    """Docs resembling the high-quality target subset score POSITIVE
    importance weights; off-target token salad scores negative; empty
    docs carry NULL (no signal)."""
    from textgraphs_spark.operators.webdata import dsir_importance_weights

    quality = ("the analyst wrote careful notes about the spark plans and "
               "the optimizer rules that shape them in practice for the team")
    docs = spark.createDataFrame(
        [
            (1, quality),
            (2, quality.replace("analyst", "engineer")),
            # off-target salad that FAILS the quality gate (15-char
            # gibberish words -> mean-word-len rule trips -> q = 0.625)
            (3, " ".join("zxq" * 5 for _ in range(10))),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dsir_importance_weights(docs).collect()}
    # absolute sign is smoothing-dependent on tiny corpora (add-one over
    # the full vocabulary depresses every target prob); the ORDERING is
    # the contract: target-like docs far above the off-target salad
    assert got[1]["dsir_weight"] > got[3]["dsir_weight"]
    assert got[2]["dsir_weight"] > got[3]["dsir_weight"]
    assert got[3]["dsir_weight"] < 0          # salad is decisively off-target
    assert got[1]["dsir_weight"] - got[3]["dsir_weight"] > 1.0
    assert got[4]["dsir_weight"] is None and got[4]["n_tokens"] == 0


def test_semdedup_clusters_within_cell_closure(spark):
    """Two tight groups of near-parallel vectors collapse to two
    clusters with min-id keepers; the orthogonal outlier joins no
    cluster; member lists are sorted numeric ids."""
    from textgraphs_spark.operators.similarity import semdedup_clusters

    def v(base, eps):
        out = [0.0] * 8
        out[base] = 1.0
        out[(base + 1) % 8] = eps
        return out

    rows = (
        [(i, v(0, 0.01 * i)) for i in range(1, 4)]       # group A: ids 1-3
        + [(10 + i, v(4, 0.01 * i)) for i in range(1, 4)]  # group B: ids 11-13
        + [(99, v(2, 0.0))]                                # orthogonal outlier
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["keep_id"]: r for r in
           semdedup_clusters(emb, n_cells=3, threshold=0.95).collect()}
    assert got[1]["n_vecs"] == 3 and got[1]["member_ids"] == "1|2|3"
    assert got[11]["n_vecs"] == 3 and got[11]["member_ids"] == "11|12|13"
    assert set(got) == {1, 11}                 # the outlier is no cluster


def test_imatch_collapses_band_filtered_near_dups(spark):
    """Docs differing ONLY in out-of-band terms (a corpus-wide stopword
    or a df=1 rare term) share an I-Match signature; docs differing in
    an in-band term do not; docs with zero retained terms are skipped."""
    from textgraphs_spark.operators.dedup import imatch_duplicates, imatch_signatures

    # 'the' appears in 5/6 docs -> df 5 > floor(0.5*6)=3 -> too common.
    # 'zzyzx' appears once -> df 1 < min_df 2 -> too rare.
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "quick brown fox zzyzx"),        # rare term ignored -> dup of 1
            (3, "the quick brown fox"),          # exact dup of 1
            (4, "the quick brown wolf"),         # in-band diff ('wolf' df=2)
            (5, "quick brown wolf"),             # dup of 4
            (6, "the"),                          # all terms filtered -> skipped
        ],
        "doc_id long, text string",
    )
    sig = imatch_signatures(docs, min_df=2, max_df_frac=0.5)
    assert {r["doc_id"] for r in sig.collect()} == {1, 2, 3, 4, 5}
    groups = {r["keep_id"]: r for r in
              imatch_duplicates(docs, min_df=2, max_df_frac=0.5).collect()}
    assert groups[1]["doc_ids"] == "1|2|3"
    assert groups[4]["doc_ids"] == "4|5"


def test_capture_drift_counts_revision_events(spark):
    """Unchanged consecutive captures are byte-equal (hamming 0, not a
    change); each change-predicate firing is exactly one counted change.
    Hand-computed from chg(u,j) = (u*31 + j*17) % 5 < 2 over 5 captures:
    url 0 changes at j=3 only; url 2 at j=2 and j=4."""
    from textgraphs_spark.operators.webdata import capture_drift
    from textgraphs_spark.sources.pages import capture_pages

    got = {r["url"]: r for r in capture_drift(capture_pages(spark, n_urls=4, n_caps=5)).collect()}
    assert all(r["n_captures"] == 5 for r in got.values())
    u0 = got["https://site0.example.com/page/0"]
    u2 = got["https://site2.example.com/page/2"]
    assert u0["n_changes"] == 1 and u0["change_rate"] == 0.25
    assert u2["n_changes"] == 2 and u2["change_rate"] == 0.5

    # a url whose captures never change: 0 changes, mean hamming 0
    static = spark.createDataFrame(
        [(1, "u", "2024-01-01 00:00:00", "same text body"),
         (2, "u", "2024-01-02 00:00:00", "same text body")],
        "doc_id long, url string, warc_ts string, text string",
    )
    row = capture_drift(static).collect()[0]
    assert row["n_changes"] == 0 and row["change_rate"] == 0.0 and row["mean_hamming"] == 0.0


def test_mirror_hosts_content_channel_and_gates(spark):
    """Hosts sharing content under DIFFERENT urls pair up with the right
    shared counts; the hosts-per-hash cap excludes syndicated
    boilerplate; min_shared excludes one-off coincidences."""
    from textgraphs_spark.operators.webdata import mirror_hosts

    rows = [
        # a.org and b.net mirror docs 1 and 2 (different paths)
        (1, "https://a.org/x/1", "doc one"),
        (2, "https://a.org/x/2", "doc two"),
        (3, "https://b.net/y/1", "doc one"),
        (4, "https://b.net/y/2", "doc two"),
        # c.com shares ONE doc with a.org -> below min_shared=2
        (5, "https://c.com/z", "doc one"),
        # boilerplate snippet on 4 hosts -> excluded by max_hosts_per_hash=3
        (6, "https://a.org/b", "cookie banner"),
        (7, "https://b.net/b", "cookie banner"),
        (8, "https://c.com/b", "cookie banner"),
        (9, "https://d.io/b", "cookie banner"),
    ]
    pages = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = mirror_hosts(pages, min_shared=2, max_hosts_per_hash=3).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["host_a"], r["host_b"], r["shared"]) == ("a.org", "b.net", 2)
    # overlap = 2 shared / min(3, 3) distinct hashes per host
    assert abs(r["overlap"] - 2 / 3) < 1e-6


def test_token_stats_by_lang_fertility(spark):
    """Per-lang word totals and chars-per-word; zero-word docs count
    toward n_docs but contribute no chars to the fertility ratio."""
    from textgraphs_spark.operators.textquality import token_stats_by_lang

    docs = spark.createDataFrame(
        [(1, "en", "one two three"), (2, "en", "four five"),
         (3, "de", "ein"), (4, "de", "...")],
        "doc_id long, lang string, text string",
    )
    got = {r["lang"]: r for r in token_stats_by_lang(docs).collect()}
    assert got["en"]["n_docs"] == 2 and got["en"]["total_words"] == 5
    assert got["en"]["avg_words_per_doc"] == 2.5
    # chars: 13 + 9 = 22 over 5 words
    assert abs(got["en"]["avg_chars_per_word"] - 22 / 5) < 1e-6
    # the zero-word doc 4: counted in n_docs, excluded from chars
    assert got["de"]["n_docs"] == 2 and got["de"]["total_words"] == 1
    assert got["de"]["avg_chars_per_word"] == 3.0


def test_mirror_farms_transitive_closure(spark):
    """Hosts chained by pairwise mirror overlap close into one farm even
    when the endpoints share nothing directly; disjoint mirror pairs stay
    separate farms; farm_id is the lexicographic min member host."""
    from textgraphs_spark.operators.webdata import mirror_farms

    rows = [
        # chain: a.org <-> b.net on docs 1,2; b.net <-> c.com on docs 3,4
        # (a.org and c.com share NOTHING -> only closure links them)
        (1, "https://a.org/p/1", "doc one"),
        (2, "https://a.org/p/2", "doc two"),
        (3, "https://b.net/q/1", "doc one"),
        (4, "https://b.net/q/2", "doc two"),
        (5, "https://b.net/q/3", "doc three"),
        (6, "https://b.net/q/4", "doc four"),
        (7, "https://c.com/r/3", "doc three"),
        (8, "https://c.com/r/4", "doc four"),
        # a disjoint two-host farm
        (9, "https://x.io/s/1", "other one"),
        (10, "https://x.io/s/2", "other two"),
        (11, "https://y.dev/t/1", "other one"),
        (12, "https://y.dev/t/2", "other two"),
    ]
    pages = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {r["farm_id"]: r for r in mirror_farms(pages, min_shared=2).collect()}
    assert set(got) == {"a.org", "x.io"}
    assert got["a.org"]["n_hosts"] == 3
    assert got["a.org"]["hosts"] == "a.org|b.net|c.com"
    assert got["x.io"]["n_hosts"] == 2
    assert got["x.io"]["hosts"] == "x.io|y.dev"


def test_mirror_pages_fixture_four_farms(spark):
    """The synthetic mirror corpus carries exactly four 3-host farm
    universes; content never crosses universes."""
    from textgraphs_spark.operators.webdata import mirror_farms
    from textgraphs_spark.sources.pages import mirror_pages

    got = mirror_farms(mirror_pages(spark)).collect()
    assert len(got) == 4
    assert all(r["n_hosts"] == 3 for r in got)
    # farm_id is the LEXICOGRAPHIC min host: "mirror10.org" < "mirror9.org"
    assert sorted(r["farm_id"] for r in got) == [
        "mirror0.org", "mirror10.org", "mirror3.org", "mirror6.org"
    ]


def test_extract_outlinks_parse_and_normalization(spark):
    """Href parsing, host normalization (www./port/case), NULL rows
    dropped, self-links kept at extraction (graph level filters them)."""
    from textgraphs_spark.operators.linkgraph import extract_outlinks

    rows = [
        (1, "https://a.org/x",
         b'<html><body><a href="https://WWW.B.net:8080/p/1">Read This</a>'
         b'<a href="http://a.org/self">self</a></body></html>'),
        (2, None, b'<a href="https://c.com/x">never</a>'),
        (3, "https://d.io/y", None),
    ]
    pages = spark.createDataFrame(rows, "doc_id long, url string, html binary")
    got = {(r["src_host"], r["dst_host"], r["anchor"])
           for r in extract_outlinks(pages).collect()}
    assert got == {("a.org", "b.net", "Read This"), ("a.org", "a.org", "self")}


def test_host_link_graph_and_rank(spark):
    """Pair counts aggregate across pages; self-links excluded; hub
    host outranks leaf hosts under PageRank."""
    from textgraphs_spark.operators.linkgraph import host_link_graph, host_link_rank
    from textgraphs_spark.sources.pages import link_pages

    pages = link_pages(spark)
    g = {(r["src_host"], r["dst_host"]): r["n_links"]
         for r in host_link_graph(pages).collect()}
    assert all(s != d for s, d in g)
    # the reciprocal farm pair exists in both directions
    assert ("spam0.biz", "spam1.biz") in g and ("spam1.biz", "spam0.biz") in g
    ranks = {r["host"]: r["rank"] for r in host_link_rank(pages).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-3
    # the even-page hub bias puts site0 above the organic mean (the t1
    # channel carries double weight per page, so site0 need not be #1)
    organic = [v for k, v in ranks.items() if k.startswith("site")]
    assert ranks["site0.example"] > sum(organic) / len(organic)
    assert len(ranks) == 12


def test_anchor_text_census_topk_and_normalization(spark):
    """Anchors lowercase/whitespace-squeeze before counting; rk is per
    dst_host with the (count desc, anchor asc) tie-break; top_k cuts."""
    from textgraphs_spark.operators.linkgraph import anchor_text_census

    rows = [
        (1, "https://a.org/1", b'<a href="https://t.com/x">Big  News</a>'),
        (2, "https://b.net/2", b'<a href="https://t.com/y">big news</a>'),
        (3, "https://c.com/3", b'<a href="https://t.com/z">alpha</a>'),
        (4, "https://d.io/4", b'<a href="https://t.com/w">beta</a>'),
    ]
    pages = spark.createDataFrame(rows, "doc_id long, url string, html binary")
    got = [(r["anchor"], r["n_links"], r["rk"])
           for r in anchor_text_census(pages, top_k=2)
           .orderBy("rk").collect()]
    assert got == [("big news", 2, 1), ("alpha", 1, 2)]


def test_link_reciprocity_signals(spark):
    """Reciprocal pair scores 1.0 both ways; a one-way link scores 0 for
    the source and contributes only in-degree to the target."""
    from textgraphs_spark.operators.linkgraph import link_reciprocity

    rows = [
        (1, "https://a.org/1", b'<a href="https://b.net/x">to b</a>'),
        (2, "https://b.net/2", b'<a href="https://a.org/y">to a</a>'),
        (3, "https://c.com/3", b'<a href="https://a.org/z">to a</a>'),
    ]
    pages = spark.createDataFrame(rows, "doc_id long, url string, html binary")
    got = {r["host"]: r for r in link_reciprocity(pages).collect()}
    assert got["a.org"]["reciprocity"] == 1.0
    assert got["b.net"]["reciprocity"] == 1.0
    assert got["c.com"]["n_out_hosts"] == 1 and got["c.com"]["reciprocity"] == 0.0
    assert got["c.com"]["n_in_hosts"] == 0
    assert got["a.org"]["n_in_hosts"] == 2


def test_host_trustrank_demotes_unreachable_farm(spark):
    """Trust mass flows only along links out of the seed set: a farm no
    trusted host points toward scores exactly 0, regardless of how many
    in-links it manufactures for itself."""
    from textgraphs_spark.operators.linkgraph import host_trustrank

    rows = [
        # trusted.org -> good.net -> other.com (forward trust chain)
        (1, "https://trusted.org/1", b'<a href="https://good.net/x">good</a>'),
        (2, "https://good.net/2", b'<a href="https://other.com/y">other</a>'),
        # farm: two hosts interlinking furiously, plus links INTO good.net
        (3, "https://farm-a.biz/3",
         b'<a href="https://farm-b.biz/i">b</a><a href="https://good.net/z">g</a>'),
        (4, "https://farm-b.biz/4", b'<a href="https://farm-a.biz/j">a</a>'),
    ]
    pages = spark.createDataFrame(rows, "doc_id long, url string, html binary")
    got = {r["host"]: r["trust"] for r in
           host_trustrank(pages, ["trusted.org"]).collect()}
    assert got["farm-a.biz"] == 0.0 and got["farm-b.biz"] == 0.0
    assert got["good.net"] > 0.0 and got["other.com"] > 0.0
    assert got["trusted.org"] > got["other.com"]


def test_crawl_delta_new_changed_unchanged(spark):
    """First capture of a url is 'new'; later captures split changed vs
    unchanged by text hash against the SAME url's previous capture."""
    from textgraphs_spark.operators.webdata import crawl_delta

    rows = [
        (1, "u1", "2024-01-01 00:00:00", "body v1"),
        (2, "u2", "2024-01-01 00:00:00", "other v1"),
        (3, "u1", "2024-01-02 00:00:00", "body v2"),      # changed
        (4, "u2", "2024-01-02 00:00:00", "other v1"),     # unchanged
        (5, "u3", "2024-01-02 00:00:00", "brand new"),    # new
    ]
    pages = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts string, text string"
    )
    got = {str(r["snapshot_ts"]): r for r in crawl_delta(pages).collect()}
    d1 = got["2024-01-01 00:00:00"]
    assert (d1["n_urls"], d1["n_new"], d1["n_changed"]) == (2, 2, 0)
    assert d1["change_rate"] is None
    d2 = got["2024-01-02 00:00:00"]
    assert (d2["n_new"], d2["n_changed"], d2["n_unchanged"]) == (1, 1, 1)
    assert d2["change_rate"] == 0.5


def test_canopy_blocking_survives_token_reordering(spark):
    """'Herzog, Werner' vs 'Werner Herzog': last_tok positional keys
    split them ('werner' vs 'herzog'), but both sit in the rare-token
    canopies {werner, herzog} -> covered. The unrelated record shares
    no canopy."""
    from textgraphs_spark.plans.er_eval import canopy_blocking_metrics

    ents = spark.createDataFrame(
        [
            ("e1", "Werner Herzog", 1),
            ("e2", "Herzog, Werner", 1),
            ("e3", "Lotte Eisner", 2),
        ],
        "entity_key string, surface string, truth_id long",
    )
    row = canopy_blocking_metrics(ents, n_keys=2, max_block=4).collect()[0]
    assert row["covered_true_pairs"] == 1
    assert row["pair_completeness"] == 1.0
    assert row["n_candidates"] == 1


def test_canopy_blocking_block_cap_drops_stop_token(spark):
    """A token shared by every record ('gmbh') is dropped by the block
    cap; only the rare-token canopy pair survives."""
    from textgraphs_spark.plans.er_eval import canopy_blocking_metrics

    ents = spark.createDataFrame(
        [
            ("e1", "acme gmbh", 1),
            ("e2", "acme gmbh", 1),
            ("e3", "volt gmbh", 2),
            ("e4", "kern gmbh", 3),
            ("e5", "lund gmbh", 4),
        ],
        "entity_key string, surface string, truth_id long",
    )
    row = canopy_blocking_metrics(ents, n_keys=2, max_block=3).collect()[0]
    assert row["n_candidates"] == 1 and row["covered_true_pairs"] == 1


def test_crawler_traps_separates_trap_from_organic_hosts(spark):
    """Trap hosts (calendar paths, session-id hex paths) collapse to one
    template so trap_score -> 1; organic word-path hosts keep template
    count == url count so trap_score == 0 and the gate stays False."""
    from textgraphs_spark.operators.webdata import crawler_traps
    from textgraphs_spark.sources.pages import trap_pages

    got = {r["host"]: r for r in crawler_traps(trap_pages(spark, 400)).collect()}
    assert set(got) == {
        "org0.example", "org1.example", "cal.example", "session.example"
    }
    # calendar trap: ?sid stripped + digits collapsed -> ONE template
    cal = got["cal.example"]
    assert cal["n_templates"] == 1 and cal["n_urls"] == 100
    assert cal["is_trap"] and cal["trap_score"] == 0.99
    # session-id trap: 8-hex run collapsed -> ONE template
    ses = got["session.example"]
    assert ses["n_templates"] == 1 and ses["is_trap"]
    # organic hosts: every distinct word path IS its own template
    for h in ("org0.example", "org1.example"):
        assert got[h]["n_templates"] == got[h]["n_urls"]
        assert got[h]["trap_score"] == 0.0 and not got[h]["is_trap"]


def test_crawler_traps_min_urls_evidence_floor(spark):
    """A host with one templated url is NOT flagged — min_urls guards
    against deciding trap-ness on no evidence."""
    from textgraphs_spark.operators.webdata import crawler_traps

    pages = spark.createDataFrame(
        [(1, "https://tiny.example/view/2024")], "doc_id long, url string"
    )
    row = crawler_traps(pages, min_urls=10).collect()[0]
    assert not row["is_trap"] and row["n_urls"] == 1


def test_resolve_redirects_chains_cycles_offcrawl(spark):
    """Chains resolve to their landing url with exact hop counts;
    3-cycles AND pages feeding into them are flagged unresolvable;
    off-crawl targets are terminals reached in one hop."""
    from textgraphs_spark.operators.webdata import resolve_redirects
    from textgraphs_spark.sources.pages import redirect_pages

    got = {r["url"]: r for r in
           resolve_redirects(redirect_pages(spark, 20)).collect()}
    assert len(got) == 120
    # group 3 (g%5=3): chain 0->1->2->3; position 3 lands
    u = lambda g, p: f"https://h{g % 7}.example/r/{g}/{p}"  # noqa: E731
    assert got[u(3, 0)]["final_url"] == u(3, 3) and got[u(3, 0)]["n_hops"] == 3
    assert got[u(3, 2)]["n_hops"] == 1 and not got[u(3, 2)]["is_cycle"]
    assert got[u(3, 3)]["final_url"] == u(3, 3) and got[u(3, 3)]["n_hops"] == 0
    # group 9: 3-cycle members and the feeder are all unresolvable
    for p in (0, 1, 2, 3):
        r = got[u(9, p)]
        assert r["is_cycle"] and r["final_url"] is None and r["n_hops"] is None
    assert not got[u(9, 4)]["is_cycle"]
    # group 4, p5: off-crawl target is the terminal, one hop
    r = got[u(4, 5)]
    assert r["final_url"] == "https://offsite.example/4" and r["n_hops"] == 1


def test_resolve_redirects_max_hops_gate(spark):
    """A chain longer than max_hops is reported unresolvable even if the
    doubling overshoot internally reached its terminal."""
    from textgraphs_spark.operators.webdata import resolve_redirects

    rows = [(f"u{i}", f"u{i+1}" if i < 6 else None) for i in range(7)]
    pages = spark.createDataFrame(rows, "url string, redirect_to string")
    got = {r["url"]: r for r in
           resolve_redirects(pages, max_hops=4).collect()}
    assert got["u0"]["is_cycle"] and got["u0"]["n_hops"] is None
    assert got["u2"]["final_url"] == "u6" and got["u2"]["n_hops"] == 4


def test_soft404_hosts_separates_body_collapse(spark):
    """dead.example answers 70% of urls with one body -> suspect;
    organic hosts stay near 1/n; sparse.example is 100% collapsed but
    below the min_urls evidence floor -> NOT flagged."""
    from textgraphs_spark.operators.webdata import soft404_hosts
    from textgraphs_spark.sources.pages import soft404_pages

    got = {r["host"]: r for r in
           soft404_hosts(soft404_pages(spark, 400)).collect()}
    dead = got["dead.example"]
    assert dead["is_suspect"] and abs(dead["dominant_share"] - 0.7) < 1e-9
    assert got["sparse.example"]["dominant_share"] == 1.0
    assert not got["sparse.example"]["is_suspect"]  # only 3 urls
    for h in ("org0.example", "org1.example", "org2.example"):
        assert not got[h]["is_suspect"]
        assert got[h]["n_texts"] == got[h]["n_urls"]


def test_host_lang_entropy_flags_mt_mix(spark):
    """A single-language host has entropy 0; a uniform 4-language host
    has ln(4) and crosses the mixing gate; the evidence floor keeps
    small hosts unflagged."""
    import math

    from textgraphs_spark.operators.webdata import host_lang_entropy

    rows = (
        [(f"d{i}", "en", "mono.example") for i in range(12)]
        + [(f"m{i}", ["en", "de", "fr", "ja"][i % 4], "farm.example")
           for i in range(12)]
        + [(f"s{i}", ["en", "de"][i % 2], "tiny.example") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id string, lang string, source string")
    got = {r["host"]: r for r in
           host_lang_entropy(docs, min_docs=10, max_entropy=1.0).collect()}
    assert got["mono.example"]["lang_entropy"] == 0.0
    assert not got["mono.example"]["is_mixed"]
    assert abs(got["farm.example"]["lang_entropy"] - round(math.log(4), 6)) < 1e-9
    assert got["farm.example"]["is_mixed"]
    assert not got["tiny.example"]["is_mixed"]  # 4 docs < min_docs


def test_crawl_policy_composes_signals(spark):
    """Blocked where either hygiene flag fires (even with zero rank
    signal), boosted only for clean high-rank hosts, and hosts missing
    from a census default to no-signal rather than erroring."""
    from textgraphs_spark.operators.webdata import crawl_policy

    traps = spark.createDataFrame(
        [("cal.example", True), ("org0.example", False)],
        "host string, is_trap boolean",
    )
    soft = spark.createDataFrame(
        [("dead.example", True), ("org0.example", False)],
        "host string, is_suspect boolean",
    )
    ranks = spark.createDataFrame(
        [("org0.example", 0.4), ("quiet.example", 0.01)],
        "host string, rank double",
    )
    got = {r["host"]: r for r in
           crawl_policy(traps, soft, ranks, high_rank=0.1).collect()}
    assert got["cal.example"]["verdict"] == "block"
    assert got["cal.example"]["rank"] == 0.0  # absent from ranks
    assert got["dead.example"]["verdict"] == "block"
    assert not got["dead.example"]["is_trap"]  # absent from traps
    assert got["org0.example"]["verdict"] == "boost"
    assert got["quiet.example"]["verdict"] == "normal"
    assert len(got) == 4


def test_entity_pmi_math_and_gates(spark):
    """PMI is ln(co*N / (df_a*df_b)) over doc-level co-mention; min_co
    prunes one-off pairs; the per-doc cap excludes listy documents."""
    import math

    from textgraphs_spark.operators.extract import entity_pmi

    docs = spark.createDataFrame(
        [
            (1, "the festival visited germany", "en"),
            (2, "the festival visited germany", "en"),
            (3, "the festival continued", "en"),
            (4, "a quiet day", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {(r["key_a"], r["key_b"]): r
           for r in entity_pmi(docs, min_co=2, max_per_doc=10).collect()}
    k = ("festival.NOUN", "germany.NOUN")
    assert k in got
    r = got[k]
    # festival df=3, germany df=2, co=2, N=4
    assert (r["co_docs"], r["df_a"], r["df_b"]) == (2, 3, 2)
    assert abs(r["pmi"] - round(math.log(2 * 4 / (3 * 2)), 6)) < 1e-9
    # 'day' co-occurs with nothing twice -> pruned by min_co
    assert not any("day.NOUN" in key for key in got)


def test_entity_pmi_per_doc_cap_drops_listy_docs(spark):
    """A document whose entity set exceeds max_per_doc contributes no
    pairs at all."""
    from textgraphs_spark.operators.extract import entity_pmi

    listy = "alpha beta gamma delta epsilon zeta"  # 6 nouns
    docs = spark.createDataFrame(
        [(1, listy, "en"), (2, listy, "en")],
        "doc_id long, text string, lang string",
    )
    assert entity_pmi(docs, min_co=2, max_per_doc=5).count() == 0
    assert entity_pmi(docs, min_co=2, max_per_doc=6).count() == 15


def test_bpe_pair_census_counts_occurrences(spark):
    """Pairs are counted over word OCCURRENCES (not distinct words),
    single-char words contribute nothing, and the (n desc, pair asc)
    tie-break is total."""
    from textgraphs_spark.operators.textquality import bpe_pair_census

    docs = spark.createDataFrame(
        [(1, "abab abab"), (2, "ab x")],
        "doc_id long, text string",
    )
    got = [(r["pair"], r["n"]) for r in
           bpe_pair_census(docs, top_k=10).collect()]
    # 'abab' x2 occurrences: ab,ba,ab each -> ab 4/occurrence-pair math:
    # per 'abab': ab(2), ba(1); two occurrences + one 'ab' word
    assert got[0] == ("ab", 5)
    assert ("ba", 2) in got
    assert all(p != "x" for p, _ in got)  # len-1 word excluded
    # tie-break: equal-count pairs sort ascending by pair
    ns = [n for _, n in got]
    assert ns == sorted(ns, reverse=True)


def test_minhash_incremental_restricts_to_new_sides(spark):
    """Incremental mode emits exactly the full-run pairs touching a new
    doc: new-new and new-old pairs survive, old-old pairs are pruned,
    and jaccard values match the full run's."""
    from pyspark.sql import functions as F

    from textgraphs_spark.operators.dedup import minhash_dedup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, False), (2, base, False),              # old-old dup
        (3, base + " tail", True),                        # new, near both
        (4, "completely different content here", True),   # new, no dup
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_new boolean")
    full = {(r["left_id"], r["right_id"]): r["jaccard"]
            for r in minhash_dedup_pairs(docs, threshold=0.5).collect()}
    inc = {(r["left_id"], r["right_id"]): r["jaccard"]
           for r in minhash_dedup_pairs(
               docs, threshold=0.5, new_col="is_new").collect()}
    assert (1, 2) in full and (1, 2) not in inc          # old-old pruned
    expected = {k: v for k, v in full.items() if 3 in k or 4 in k}
    assert inc == expected and (1, 3) in inc and (2, 3) in inc


def test_bloom_decontamination_matches_exact_even_saturated(spark):
    """Bloom + exact verify equals the exact operator; with m_bits tiny
    enough that the bitmap saturates (every probe hits), the verify
    stage still kills every false positive — the losslessness contract
    under the worst case."""
    from pyspark.sql import functions as F

    from textgraphs_spark.operators.webdata import (
        contaminated_docs, contaminated_docs_bloom,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta shared one two three four"
          if i % 3 == 0 else f"tok{i} five six seven eight nine ten")
         for i in range(1, 31)],
        "doc_id long, text string",
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    ev = docs.filter(F.col("doc_id") % 5 == 0)
    exact = {r["doc_id"]: r for r in contaminated_docs(corpus, ev, n=3).collect()}
    for m_bits in (1 << 16, 64):  # healthy and fully saturated
        got = {r["doc_id"]: r for r in contaminated_docs_bloom(
            corpus, ev, n=3, m_bits=m_bits).collect()}
        assert got.keys() == exact.keys()
        for k in exact:
            assert got[k]["n_matched"] == exact[k]["n_matched"]
            assert got[k]["overlap_frac"] == exact[k]["overlap_frac"]


def test_scc_known_graph(spark):
    """3-cycle, feeder, 2-cycle, and chain vertices resolve to the
    textbook SCC partition; scc_id is the min member."""
    from textgraphs_spark.operators.components import (
        strongly_connected_components,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"),
         ("e", "f"), ("f", "e"), ("g", "d")],
        "src string, dst string",
    )
    stats = {}
    got = sorted((r["node"], r["scc_id"]) for r in
                 strongly_connected_components(edges, stats=stats).collect())
    assert got == [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"),
                   ("e", "e"), ("f", "e"), ("g", "g")]
    assert stats["rounds"] >= 1


def test_scc_direction_matters_vs_undirected_cc(spark):
    """A path a->b->c is ONE weak component but THREE SCCs — the
    directed closure the undirected kernel cannot express."""
    from textgraphs_spark.operators.components import (
        strongly_connected_components,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {r["node"]: r["scc_id"] for r in
           strongly_connected_components(edges).collect()}
    assert got == {"a": "a", "b": "b", "c": "c"}


def test_host_scc_ring_fixture_partition(spark):
    """Ring groups collapse to one SCC per group keyed by the group's
    first host; chain hosts stay singletons."""
    import collections

    from textgraphs_spark.operators.linkgraph import host_scc
    from textgraphs_spark.sources.pages import ring_pages

    got = host_scc(ring_pages(spark, 24)).collect()
    sizes = collections.Counter(r["scc_id"] for r in got)
    assert sizes["r00.example"] == 4 and sizes["r16.example"] == 4
    assert sum(1 for v in sizes.values() if v == 1) == 8
    assert len(got) == 24


def test_frontier_schedule_waves_and_gates(spark):
    """Blocked hosts vanish, unknown hosts default to normal, boost
    hosts ship two urls per wave, normal hosts one per wave."""
    from textgraphs_spark.operators.webdata import frontier_schedule

    cands = spark.createDataFrame(
        [(f"https://{h}/p/{i}",) for h in
         ("fast.example", "slow.example", "bad.example", "new.example")
         for i in range(4)],
        "url string",
    )
    pol = spark.createDataFrame(
        [("fast.example", "boost"), ("slow.example", "normal"),
         ("bad.example", "block")],
        "host string, verdict string",
    )
    got = {(r["host"], r["url"]): r["wave"] for r in
           frontier_schedule(cands, pol).collect()}
    hosts = {h for h, _ in got}
    assert "bad.example" not in hosts and "new.example" in hosts
    fast = sorted(v for (h, _), v in got.items() if h == "fast.example")
    slow = sorted(v for (h, _), v in got.items() if h == "slow.example")
    new = sorted(v for (h, _), v in got.items() if h == "new.example")
    assert fast == [1, 1, 2, 2]     # 2x interleave
    assert slow == [1, 2, 3, 4] and new == [1, 2, 3, 4]


def test_bm25_ranks_relevance_and_length_norm(spark):
    """A doc matching both query terms outranks single-term docs; among
    single-term docs the SHORTER one ranks higher (length
    normalization); a no-match query returns nothing."""
    from textgraphs_spark.operators.textquality import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana"),                      # both terms, short
            (2, "apple pear plum cherry fig date"),   # one term, long
            (3, "apple pear"),                        # one term, short
            (4, "kiwi mango"),                        # no terms
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "apple banana"), (2, "zzz")], "q_id long, q_text string"
    )
    got = bm25_topk(docs, q, top_k=5).collect()
    r1 = [r["doc_id"] for r in sorted(
        (r for r in got if r["q_id"] == 1), key=lambda r: r["rk"])]
    assert r1[0] == 1           # both terms win
    assert r1.index(3) < r1.index(2)  # shorter single-term doc ranks higher
    assert 4 not in r1
    assert not [r for r in got if r["q_id"] == 2]


def test_round5_ops_empty_inputs(spark):
    """Every round-5 operator returns an empty, correctly-schema'd
    frame on empty input instead of throwing — the resume/first-batch
    path of a staged pipeline."""
    from textgraphs_spark.operators.components import (
        strongly_connected_components,
    )
    from textgraphs_spark.operators.webdata import (
        crawl_policy, crawler_traps, frontier_schedule, resolve_redirects,
        soft404_hosts,
    )

    no_urls = spark.createDataFrame([], "doc_id long, url string")
    no_pages = spark.createDataFrame([], "doc_id long, url string, text string")
    no_redirects = spark.createDataFrame([], "url string, redirect_to string")
    no_edges = spark.createDataFrame([], "src string, dst string")
    no_policy = spark.createDataFrame([], "host string, verdict string")

    assert crawler_traps(no_urls).count() == 0
    assert soft404_hosts(no_pages).count() == 0
    rr = resolve_redirects(no_redirects)
    assert rr.count() == 0 and set(rr.columns) == {
        "url", "final_url", "n_hops", "is_cycle"}
    scc = strongly_connected_components(no_edges)
    assert scc.count() == 0 and set(scc.columns) == {"node", "scc_id"}
    pol = crawl_policy(
        crawler_traps(no_urls), soft404_hosts(no_pages),
        spark.createDataFrame([], "host string, rank double"),
    )
    assert pol.count() == 0
    assert frontier_schedule(no_urls.select("url"), no_policy).count() == 0


def test_entity_pmi_and_bm25_empty_inputs(spark):
    """Extraction-backed round-5 operators tolerate an empty corpus."""
    from textgraphs_spark.operators.extract import entity_pmi
    from textgraphs_spark.operators.textquality import bm25_topk

    no_docs = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert entity_pmi(no_docs).count() == 0
    q = spark.createDataFrame([(1, "anything")], "q_id long, q_text string")
    assert bm25_topk(no_docs, q).count() == 0


def test_plan_shards_byte_balance_and_determinism(spark):
    """Shards within a source respect the byte target (every shard but
    the last holds >= target once it closes), indices start at 0, and
    the assignment is a pure function of the table."""
    from textgraphs_spark.operators.webdata import plan_shards

    docs = spark.createDataFrame(
        [(i, "s1" if i < 8 else "s2", 100) for i in range(12)],
        "doc_id long, source string, n_chars long",
    )
    got = {r["doc_id"]: r["shard_idx"] for r in
           plan_shards(docs, target_bytes=300).collect()}
    # s1: cum-exclusive 0,100,200 -> shard 0; 300..500 -> 1; 600,700 -> 2
    assert [got[i] for i in range(8)] == [0, 0, 0, 1, 1, 1, 2, 2]
    # s2 restarts at shard 0
    assert got[8] == 0 and got[11] == 1
    again = {r["doc_id"]: r["shard_idx"] for r in
             plan_shards(docs.repartition(7), target_bytes=300).collect()}
    assert again == got  # partition-layout independent


def test_dsir_resample_gate_semantics(spark):
    """kept is exactly (hash-micro < keep_prob_micro); positive-weight
    docs cap at 10^6 (always kept); token-less docs are dropped."""
    from textgraphs_spark.operators.webdata import dsir_resample

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha beta gamma delta epsilon"),
         (2, "zz qq xx"), (3, "...")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dsir_resample(docs).collect()}
    assert 3 not in got  # token-less: no signal, no sample
    for r in got.values():
        assert 0 <= r["keep_prob_micro"] <= 1_000_000
        if r["keep_prob_micro"] == 1_000_000:
            assert r["kept"]


def test_grouped_cumsum_matches_window(spark):
    """The anti-funnel grouped cumsum is value-identical to the SQL
    window form, including across repartitioning."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from textgraphs_spark.operators.rankops import grouped_cumsum

    df = spark.range(500).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("o"),
        (F.col("id") % 13 + 1).alias("v"),
    ).repartition(11)
    got = grouped_cumsum(df, "g", [F.asc("o")], "v").orderBy("g", "o")
    w = Window.partitionBy("g").orderBy("o").rowsBetween(
        Window.unboundedPreceding, 0)
    exp = df.withColumn("cum", F.sum("v").over(w).cast("long")).orderBy("g", "o")
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in exp.select(got.columns).collect()]


def test_host_condensation_is_acyclic_dag(spark):
    """Condensing the ring fixture leaves only the chain edges (rings
    collapse internally), the result references SCC ids on both sides,
    and no mutual pair survives — acyclicity at the pair level."""
    from textgraphs_spark.operators.linkgraph import host_condensation
    from textgraphs_spark.sources.pages import ring_pages

    got = [(r["src_scc"], r["dst_scc"]) for r in
           host_condensation(ring_pages(spark, 24)).collect()]
    assert len(got) == 8
    pairs = set(got)
    assert not any((b, a) in pairs for a, b in pairs)  # no 2-cycles
    assert ("r11.example", "r00.example") in pairs      # chain into ring 0


def test_condensation_depth_layers(spark):
    """Chain components layer 0..3, the ring they feed sits one past
    the deepest feeder, isolated rings sit at 0."""
    from textgraphs_spark.operators.linkgraph import condensation_depth
    from textgraphs_spark.sources.pages import ring_pages

    got = {r["scc_id"]: r["depth"] for r in
           condensation_depth(ring_pages(spark, 24)).collect()}
    assert got["r08.example"] == 0 and got["r11.example"] == 3
    assert got["r00.example"] == 4            # fed by both depth-3 chains
    for iso in ("r04.example", "r12.example", "r16.example"):
        assert got[iso] == 0


def test_latest_captures_keeps_newest_per_url(spark):
    """One row per url, carrying the max-timestamp capture; ties break
    deterministically by the remaining columns."""
    import datetime as dt

    from textgraphs_spark.operators.webdata import latest_captures

    t = lambda s: dt.datetime(2024, 1, s)  # noqa: E731
    rows = [
        (1, "https://a/x", t(1), "old"),
        (2, "https://a/x", t(5), "new"),
        (3, "https://b/y", t(2), "only"),
        (4, "https://c/z", t(3), "tie-lo"),
        (5, "https://c/z", t(3), "tie-hi"),  # same ts: doc_id 5 wins
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts timestamp, text string")
    got = {r["url"]: r for r in latest_captures(df).collect()}
    assert len(got) == 3
    assert got["https://a/x"]["text"] == "new"
    assert got["https://c/z"]["doc_id"] == 5
