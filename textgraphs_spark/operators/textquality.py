"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All four are pure column expressions (no UDFs) so that:
  * they run inside whole-stage codegen at scan speed, and
  * the DuckDB oracle can verify every value.

The language-ID heuristic is stopword-ratio based: for each candidate
language a small distinctive stopword set; the language with the highest
hit ratio wins (ties break lexicographically — deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKENS = "filter(split(lower({c}), '[^\\\\p{{L}}0-9]+'), t -> t <> '')"

# tiny distinctive stopword sets (deterministic, versioned)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with", "from", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "auf"],
    "es": ["el", "la", "los", "las", "es", "en", "que", "con", "una", "por"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "avec", "une", "pour"],
}


def tokens_col(text_col: str) -> Column:
    return F.expr(_TOKENS.format(c=text_col))


def token_count(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace-word and BPE-ish subword counts per doc."""
    # BPE-ish: alphanumeric runs plus each punctuation char counts as a token
    bpe = F.size(
        F.expr(
            f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
        )
    )
    return docs.select(
        F.col(id_col),
        F.size(tokens_col(text_col)).alias("n_words"),
        bpe.alias("n_ws_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def lang_struct_col(text_col: str = "text") -> Column:
    """(hits, lang) struct of the winning language — a reusable column
    so composite operators (webdata.curation_decisions) can take the
    language signal in the SAME projection as other signals instead of
    re-scanning the corpus and joining. Ties break to the
    lexicographically greatest lang (struct max), matching the oracle's
    CASE order fr > es > en > de."""
    toks = tokens_col(text_col)
    hit_cols = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.array_intersect(F.array_distinct(toks), arr))
        hit_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    return F.array_max(F.array(*hit_cols))


def pred_lang_col(text_col: str = "text") -> Column:
    best = lang_struct_col(text_col)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID by stopword hit counts."""
    best = lang_struct_col(text_col)
    return docs.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].alias("stopword_hits"),
    )


def quality_col(text_col: str = "text") -> Column:
    """The composite quality score alone, as a reusable column (see
    ``lang_struct_col`` for why) — MUST stay value-identical to
    ``quality_score``'s ``quality`` output."""
    toks = tokens_col(text_col)
    n_chars = F.length(text_col)
    n_words = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[.,;:!?]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), en_stop))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / F.least(n_words, F.lit(10))).otherwise(F.lit(0.0))
    mean_wlen = F.when(
        n_words > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_words,
    ).otherwise(F.lit(0.0))
    length_ok = F.when((n_words >= 10) & (n_words <= 100000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio <= 0.1, 1.0).otherwise(0.5)
    wlen_ok = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 1.0).otherwise(0.5)
    return F.round((length_ok + punct_ok + wlen_ok + stop_ratio) / 4.0, 6)


def quality_score(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Web-corpus quality features + a composite score in [0, 1]:
    length band, punctuation ratio, stopword ratio, mean word length,
    uppercase ratio. Matches common C4/Gopher-style filters in spirit."""
    toks = tokens_col(text_col)
    n_chars = F.length(text_col)
    n_words = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[.,;:!?]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[A-Z]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), en_stop))

    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, n_upper / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / F.least(n_words, F.lit(10))).otherwise(F.lit(0.0))
    mean_wlen = F.when(
        n_words > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_words,
    ).otherwise(F.lit(0.0))

    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        quality_col(text_col).alias("quality"),
    )


def fingerprint(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprints:
    * content_hash — md5 of raw text (exact identity)
    * norm_hash    — md5 of the normalized token join (whitespace/case/
                     punctuation-insensitive identity)
    """
    norm = F.concat_ws(" ", tokens_col(text_col))
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_hash"),
        F.md5(norm).alias("norm_hash"),
        F.length(text_col).alias("n_chars"),
    )


def readability(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading ease + type-token ratio per document — the two
    classic training-data quality signals next to the composite score:
    Flesch RE = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/
    words) with syllables estimated as vowel-group runs (>= 1 per
    word, the standard heuristic), sentences as non-empty [.!?]-split
    segments; TTR = distinct tokens / tokens (lexical diversity — LM
    training filters drop both extremes: boilerplate repeats low, OCR
    garbage high).

    One map-only whole-stage-codegen projection — zero shuffles, zero
    Python — over the same canonical tokenization as every other text
    signal. Counts are exact integers in both engines, the two ratio
    expressions are formed identically and rounded to 6, so the DuckDB
    twin is bit-equal. NULL (not a sentinel) where undefined: flesch
    needs words AND sentences, ttr needs words.
    """
    toks = tokens_col(text_col)
    n_words = F.size(toks).cast("long")
    n_sents = F.size(
        F.expr(f"filter(split({text_col}, '[.!?]+'), s -> trim(s) <> '')")
    ).cast("long")
    n_syll = F.expr(
        "aggregate(_toks, 0L, (acc, w) ->"
        " acc + greatest(size(regexp_extract_all(w, '[aeiouy]+', 0)), 1))"
    )
    flesch = F.when(
        (F.col("n_words") > 0) & (F.col("n_sentences") > 0),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (F.col("n_words") / F.col("n_sentences"))
            - F.lit(84.6) * (F.col("n_syllables") / F.col("n_words")),
            6,
        ),
    )
    ttr = F.when(
        F.col("n_words") > 0,
        F.round(F.col("n_distinct") / F.col("n_words"), 6),
    )
    return (
        docs.select(F.col(id_col), F.col(text_col), toks.alias("_toks"))
        .select(
            F.col(id_col),
            n_words.alias("n_words"),
            n_sents.alias("n_sentences"),
            n_syll.alias("n_syllables"),
            F.size(F.array_distinct("_toks")).cast("long").alias("n_distinct"),
        )
        .select(
            id_col, "n_words", "n_sentences", "n_syllables",
            flesch.alias("flesch"), ttr.alias("ttr"),
        )
    )


def length_quartiles(
    docs: DataFrame,
    *,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-group token-length quartiles — (group, n_docs, p25,
    p50, p75) with percentile_disc semantics (the value at rank
    ceil(q*n); no interpolation, so the answer is an actual document
    length and bit-equal across engines). The per-language length
    distribution is the curation knob behind min/max-length filters.

    WINDOWLESS at scale: ranks come from rankops.grouped_rank (a hot
    language never funnels into one window task), the quartile picks
    are conditional aggregates over the ranked frame — one extra
    vocabulary-of-groups-sized join, no sort of the full corpus on one
    executor. Ties on length break by doc id; the SELECTED length is
    tie-invariant (ranks sort by length first).
    """
    from .rankops import grouped_rank

    d = docs.select(
        F.col(group_col).alias("g"),
        F.size(tokens_col(text_col)).cast("long").alias("n_toks"),
        F.col(id_col).alias("_id"),
    )
    r = grouped_rank(d, "g", [F.col("n_toks"), F.col("_id")], rank_col="_r")
    cnt = d.groupBy("g").agg(F.count("*").alias("_n"))

    def pick(q: float):
        target = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("_n")).cast("long"))
        return F.max(F.when(F.col("_r") == target, F.col("n_toks")))

    return (
        r.join(cnt, "g")
        .groupBy(F.col("g").alias(group_col))
        .agg(
            F.max("_n").cast("long").alias("n_docs"),
            pick(0.25).cast("long").alias("p25"),
            pick(0.5).cast("long").alias("p50"),
            pick(0.75).cast("long").alias("p75"),
        )
        .orderBy(group_col)
    )
