"""corpusstats operator tests: concentration (Gini/HHI/top-share),
Zipf OLS fit, Heaps vocabulary growth.

Hand-computable distributions pin the closed forms; the oracle sweep
covers corpus-scale value parity."""

import math

from pyspark.sql import functions as F

from textgraphs_spark.operators.corpusstats import (
    concentration_metrics, token_frequencies, vocab_growth, zipf_fit,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_concentration_uniform_is_zero_gini(spark):
    # four keys, one row each: Gini 0, HHI 1/4, every share 1/4 (top-k
    # share saturates at 1.0 because k=10 > n)
    df = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "k string")
    r = _one(concentration_metrics(df, key_col="k"))
    assert r["n_keys"] == 4 and r["total"] == 4
    assert r["gini"] == 0.0
    assert r["hhi"] == 0.25
    assert r["top1_share"] == 0.25
    assert r["topk_share"] == 1.0


def test_concentration_skewed(spark):
    # counts 1,1,1,7 (ascending ranks 1..4):
    #   gini = (2*(1+2+3+28) - 5*10) / (4*10) = (68-50)/40 = 0.45
    #   hhi  = (1+1+1+49)/100 = 0.52 ; top1 = 0.7
    rows = [("x",)] * 7 + [("a",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "k string")
    r = _one(concentration_metrics(df, key_col="k"))
    assert r["gini"] == 0.45
    assert r["hhi"] == 0.52
    assert r["top1_share"] == 0.7


def test_concentration_weighted_matches_exploded(spark):
    # weight_col over a pre-aggregated table == unweighted over the
    # exploded rows (the counts-vs-raw equivalence the query relies on)
    raw = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)], "k string"
    )
    pre = raw.groupBy("k").agg(F.count("*").alias("w"))
    r1 = _one(concentration_metrics(raw, key_col="k"))
    r2 = _one(concentration_metrics(pre, key_col="k", weight_col="w"))
    assert r1 == r2


def test_zipf_exact_power_law(spark):
    # frequencies 24,12,8,6 over ranks 1..4 = 24/r exactly -> slope -1
    words = (["w1"] * 24) + (["w2"] * 12) + (["w3"] * 8) + (["w4"] * 6)
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    r = _one(zipf_fit(df))
    assert r["n_vocab"] == 4
    assert r["n_tokens"] == 50
    assert abs(r["slope"] - (-1.0)) < 1e-6
    assert abs(r["intercept"] - math.log(24.0)) < 1e-6


def test_zipf_rank_ties_break_by_token(spark):
    # equal frequencies: ranks assigned by token asc; slope 0 exactly
    df = spark.createDataFrame([("aa bb cc aa bb cc",)], "text string")
    r = _one(zipf_fit(df))
    assert r["n_vocab"] == 3 and r["slope"] == 0.0


def test_token_frequencies_tokenizer_parity(spark):
    # same tokenizer as textquality (unicode letters + digits)
    df = spark.createDataFrame([("Café CAFÉ, x9 x9!",)], "text string")
    got = {r["tok"]: r["freq"] for r in token_frequencies(df).collect()}
    assert got == {"café": 2, "x9": 2}


def test_vocab_growth_prefix_semantics(spark):
    # doc 0: "a b", doc 2: "b c", doc 5: "d"
    #   ckpt 1  -> docs 1, tokens 2, vocab 2 (a,b)
    #   ckpt 3  -> docs 2, tokens 4, vocab 3 (+c)
    #   ckpt 7+ -> docs 3, tokens 5, vocab 4 (+d)
    df = spark.createDataFrame(
        [(0, "a b"), (2, "b c"), (5, "d")], "doc_id long, text string"
    )
    got = {r["ckpt"]: r for r in vocab_growth(df).collect()}
    assert got[1]["docs_seen"] == 1 and got[1]["vocab"] == 2
    assert got[3]["docs_seen"] == 2 and got[3]["tokens_seen"] == 4
    assert got[3]["vocab"] == 3
    assert got[7]["vocab"] == 4 and got[7]["tokens_seen"] == 5
    # saturation: every later checkpoint repeats the full-corpus row
    assert all(got[c]["vocab"] == 4 for c in got if c >= 7)


def test_vocab_growth_monotone_and_bounded(spark):
    # invariants on a less trivial corpus: vocab and tokens_seen are
    # non-decreasing in ckpt, vocab <= tokens_seen, docs_seen <= ckpt+1
    df = spark.createDataFrame(
        [(i, f"t{i % 5} t{i % 3} common") for i in range(40)],
        "doc_id long, text string",
    )
    rows = vocab_growth(df).orderBy("ckpt").collect()
    assert rows, "at least one checkpoint must match"
    prev_v, prev_t = 0, 0
    for r in rows:
        assert r["vocab"] >= prev_v and r["tokens_seen"] >= prev_t
        assert r["vocab"] <= r["tokens_seen"]
        assert r["docs_seen"] <= r["ckpt"] + 1
        prev_v, prev_t = r["vocab"], r["tokens_seen"]
    assert rows[-1]["vocab"] == 6  # t0..t4 (covers t0..t2) plus "common"


def test_length_quartiles_disc_semantics(spark):
    """percentile_disc picks: lengths {1,2,3,4} -> ranks 1..4,
    p25 = value@ceil(1) = 1, p50 = value@2 = 2, p75 = value@3 = 3;
    a single-doc group returns its own length for every quartile."""
    from textgraphs_spark.operators.textquality import length_quartiles

    docs = spark.createDataFrame(
        [(0, "en", "a"), (1, "en", "a b"), (2, "en", "a b c"),
         (3, "en", "a b c d"), (4, "de", "x y z")],
        "doc_id long, lang string, text string")
    got = {r["lang"]: r for r in length_quartiles(docs).collect()}
    en = got["en"]
    assert (en["n_docs"], en["p25"], en["p50"], en["p75"]) == (4, 1, 2, 3)
    de = got["de"]
    assert (de["n_docs"], de["p25"], de["p50"], de["p75"]) == (1, 3, 3, 3)
