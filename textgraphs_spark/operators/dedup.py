"""Document deduplication operators for large-scale corpus pipelines.

Five channels, cheapest-first — the standard web-corpus dedup ladder:

* exact        — md5 of full text; one hash-groupBy, no pairs at all.
* ngram-jaccard — word-shingle Jaccard between candidate pairs inside
                  cheap blocks; built entirely from array builtins so the
                  DuckDB oracle can verify it value-for-value.
* minhash-lsh  — character-shingle MinHash banded into buckets (see
                  blocking.py), verified pairs by true Jaccard; the scale
                  path: candidate count is bucket-bounded, never O(n²).
* simhash      — 64-bit rotation-invariant fingerprint from token md5
                  bits; near-dups are fingerprints within Hamming ≤ k
                  (bucketed by 4 × 16-bit bands, pigeonhole k ≤ 3).
* embedding    — cosine near-dup over a vector column (similarity.py).

All hashing uses md5 (identical across Spark and DuckDB) where the oracle
needs to reproduce values, xxhash64 (JVM-fast) where it does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .blocking import minhash_band_keys

# one canonical tokenization shared by Spark and the DuckDB oracle:
# lowercase, split on non-alphanumeric runs, drop empties
_TOKENS = "filter(split(lower({c}), '[^a-z0-9]+'), t -> t <> '')"


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents (size > 1), via md5 hash-agg."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "source",
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Word n-gram Jaccard between doc pairs sharing a block.

    Fully builtin (split/transform/array_intersect) — zero Python, and
    SQL-oracle-checkable. Blocks bound the pair explosion; at web scale
    the block column is a cheap sketch (length bucket, lang, host).
    """
    toks = F.expr(_TOKENS.format(c=text_col))
    # distinct over gram STRINGS, then hash each gram to a long before the
    # pair join: |grams| and |intersection| — all Jaccard needs — are
    # preserved (64-bit collisions are ~1e-13 per pair), while the arrays
    # shipped through the block join shrink from ~n-word strings to 8 B
    # per element and array_intersect compares longs, not strings
    grams = F.expr(
        f"transform(array_distinct(transform(sequence(1, greatest(size(_toks) - {n - 1}, 0)),"
        f" i -> concat_ws(' ', slice(_toks, i, {n})))), g -> xxhash64(g))"
    )
    d = (
        docs.select(
            F.col(id_col), *( [F.col(block_col)] if block_col else [] ),
            toks.alias("_toks"),
        )
        .withColumn("grams", grams)
        .drop("_toks")
    )
    join_key = [block_col] if block_col else []
    a = d.select(*join_key, F.col(id_col).alias("left_id"), F.col("grams").alias("lg"))
    b = d.select(*join_key, F.col(id_col).alias("right_id"), F.col("grams").alias("rg"))
    pairs = (
        (a.join(b, join_key) if join_key else a.crossJoin(b))
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn("inter", F.size(F.array_intersect("lg", "rg")))
        .withColumn("uni", F.size("lg") + F.size("rg") - F.col("inter"))
        .withColumn(
            "jaccard",
            F.when(F.col("uni") > 0, F.col("inter") / F.col("uni")).otherwise(F.lit(0.0)),
        )
    )
    return pairs.filter(F.col("jaccard") >= threshold).select(
        "left_id", "right_id", F.round("jaccard", 6).alias("jaccard")
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 5,
    threshold: float = 0.6,
    max_bucket: int = 200,
) -> DataFrame:
    """MinHash-LSH candidate pairs verified by true shingle Jaccard.

    Candidates come from band-bucket equality (narrow + one shuffle on the
    bucket key); buckets larger than ``max_bucket`` are dropped — a band
    shared by hundreds of documents carries no near-dup signal
    (low-entropy shingles), and the pair blow-up inside such buckets is
    exactly the skew that kills the job at corpus scale.

    Verification is two-stage, sized by what each stage must ship through
    the join:

    1. *signature agreement* — candidates join the (already computed)
       num_hashes-long signatures (256 B/side) and keep pairs whose
       estimated Jaccard (fraction of agreeing min-hashes) clears
       ``threshold - sig_margin``. LSH candidates are overwhelmingly
       false positives, so this drops most pairs for ~nothing.
    2. *exact shingle Jaccard* — survivors only, over xxhash64-hashed
       shingle sets (8 B/element instead of a shingle-length string).

    The estimator is de-biased for candidacy: sharing a band guarantees
    ``num_hashes/bands`` equal positions, so agreement is measured over
    the remaining positions only. With 32 hashes / 8 bands that leaves 28
    fair samples (σ ≤ 0.095), and the default margin (0.25) keeps a true
    at-threshold pair with P(drop) < 1e-2. At web-dedup thresholds
    (≥ 0.7) stage 1 removes the overwhelming majority of LSH noise; at
    low thresholds it degrades gracefully toward a no-op.
    """
    from textgraphs_spark.operators.blocking import (
        _exploded_shingles, band_keys_from_signatures, minhash_signatures,
    )

    sig_margin = 0.25
    d = docs.select(F.col(id_col).alias("_id"), F.lower(F.col(text_col)).alias("_t"))
    sigs = minhash_signatures(
        d, "_id", "_t", num_hashes=num_hashes, shingle=shingle
    ).localCheckpoint()
    banded = band_keys_from_signatures(sigs, "_id", num_hashes=num_hashes, bands=bands)
    bucket_key = F.concat_ws("|", "band_id", "band_key")
    keyed = banded.select(bucket_key.alias("bk"), F.col("_id"))
    counts = keyed.groupBy("bk").agg(F.count("*").alias("_n"))
    bounded = (
        keyed.join(counts.filter((F.col("_n") > 1) & (F.col("_n") <= max_bucket)), "bk")
        .drop("_n")
    )
    a = bounded.select("bk", F.col("_id").alias("left_id"))
    b = bounded.select("bk", F.col("_id").alias("right_id"))
    cands = (
        a.join(b, "bk")
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )
    rows_per_band = num_hashes // bands
    if num_hashes - rows_per_band > 0:
        matches = F.expr(
            "aggregate(zip_with(lsig, rsig, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
        )
        est = (matches - F.lit(rows_per_band)) / F.lit(num_hashes - rows_per_band)
        prefiltered = (
            cands
            .join(sigs.select(F.col("_id").alias("left_id"), F.col("sig").alias("lsig")), "left_id")
            .join(sigs.select(F.col("_id").alias("right_id"), F.col("sig").alias("rsig")), "right_id")
            .filter(est >= F.lit(max(threshold - sig_margin, 0.0)))
            .select("left_id", "right_id")
        )
    else:
        # bands == 1: every signature position is band-guaranteed, the
        # estimator has no fair sample — skip straight to exact verify
        prefiltered = cands
    sets = (
        _exploded_shingles(d, [F.col("_id")], "_t", shingle)
        .select("_id", F.xxhash64("_sh").alias("_h"))
        .groupBy("_id")
        .agg(F.collect_set("_h").alias("sh"))
    )
    verified = (
        prefiltered
        .join(sets.select(F.col("_id").alias("left_id"), F.col("sh").alias("ls")), "left_id")
        .join(sets.select(F.col("_id").alias("right_id"), F.col("sh").alias("rs")), "right_id")
        .withColumn("inter", F.size(F.array_intersect("ls", "rs")))
        .withColumn("uni", F.size("ls") + F.size("rs") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("left_id", "right_id", F.round("jaccard", 6).alias("jaccard"))


def simhash(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprints from md5-derived token hashes.

    For each token, take the top 64 bits of md5; sum ±1 per bit position
    weighted by token frequency; sign → fingerprint bit. Entirely JVM-side:
    conv(substring(md5)) + bit ops inside aggregate expressions.
    """
    toks = F.expr(_TOKENS.format(c=text_col))
    exploded = (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .select(F.col(id_col), F.explode("_toks").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("w"))
        .withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long"))
    )
    # per-bit signed sums; 60 usable bits from 15 hex chars
    bit_cols = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, F.col("w")).otherwise(-F.col("w"))
        ).alias(f"b{b}")
        for b in range(min(bits, 60))
    ]
    agg = exploded.groupBy(id_col).agg(*bit_cols)
    fp = None
    for b in range(min(bits, 60)):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= k via 4-band pigeonhole:
    any pair within Hamming 3 of 64 bits agrees exactly on at least one
    16-bit band — bucket join per band, then exact Hamming verify."""
    fp = simhash(docs, text_col=text_col, id_col=id_col)
    bands = []
    for i in range(4):
        bands.append(
            fp.select(
                F.col(id_col),
                F.col("simhash"),
                F.lit(i).alias("band"),
                F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("bkey"),
            )
        )
    banded = bands[0]
    for x in bands[1:]:
        banded = banded.unionByName(x)
    a = banded.select("band", "bkey", F.col(id_col).alias("left_id"), F.col("simhash").alias("lh"))
    b = banded.select("band", "bkey", F.col(id_col).alias("right_id"), F.col("simhash").alias("rh"))
    cands = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id", "lh", "rh")
        .distinct()
    )
    hamming = F.bit_count(F.col("lh").bitwiseXOR(F.col("rh")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("left_id", "right_id", "hamming")
    )
