"""Blocking: candidate-pair generation for record linkage.

Replaces the reference's candidate generators — the per-doc entity-pair
product gated by graph distance (reference: textgraphs/pipe.py:379-431) and
the per-mention KG lookup (kg.py:940-1065) — with corpus-scale blocking:

1. **Key blocking**: a normalized (last-token, first-initial) key over
   entity surface forms. Same key ⇒ candidate. This is the equi-join
   analog of the reference linking mentions with equal lemma keys into one
   node (graph.py:134-137).
2. **MinHash-LSH blocking**: character-shingle MinHash signatures banded
   into buckets; same (band, slice) ⇒ candidate. Catches typos that key
   blocking misses. Implemented with JVM-side expressions only
   (xxhash64 + higher-order array functions) — no Python in this path, no
   ML-Vector detour, and the signature computation is a narrow map.

Scale discipline (the part that must survive 1000 executors / 10^12 docs):
* pairs are generated over **distinct surface forms**, never mention
  occurrences — vocabulary-sized, not corpus-sized;
* every block is counted first; blocks above ``max_block_size`` are
  **salted** by hashing members into ``ceil(size/max_block_size)`` salt
  shards (hot-head-domain keys stay bounded; AQE skew-join is the backstop);
* the pair join shuffles on the block key, so co-location is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# normalized name parts: strip punctuation, lowercase
_NORM = "lower(regexp_replace(surface, '[^A-Za-z ]', ''))"


def normalize_names(entities: DataFrame) -> DataFrame:
    """Add norm / first_tok / last_tok / first_init columns."""
    return (
        entities
        .withColumn("norm", F.expr(_NORM))
        .withColumn("toks", F.split(F.trim(F.col("norm")), " +"))
        .withColumn("first_tok", F.col("toks")[0])
        .withColumn("last_tok", F.element_at("toks", -1))
        .withColumn("first_init", F.substring("first_tok", 1, 1))
        .drop("toks")
    )


def block_keys(entities: DataFrame) -> DataFrame:
    """entities(entity_key, surface, ...) → (block_key, entity_key, ...)."""
    e = normalize_names(entities)
    return e.withColumn("block_key", F.concat_ws("|", "last_tok", "first_init"))


def minhash_signature(df: DataFrame, text_col: str, *, num_hashes: int = 16, shingle: int = 3) -> DataFrame:
    """Add ``sig: array<bigint>`` — MinHash over character shingles.

    All JVM expressions: sequence → transform(substring) → per-seed
    xxhash64 min via array_min. One narrow pass, no shuffle, codegen'd.
    """
    shingles = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {shingle - 1}, 1)),"
        f" i -> substring({text_col}, i, {shingle})))"
    )
    df = df.withColumn("_shingles", shingles)
    sig = F.array(*[
        F.array_min(F.expr(f"transform(_shingles, s -> xxhash64(s, {seed}))"))
        for seed in range(num_hashes)
    ])
    return df.withColumn("sig", sig).drop("_shingles")


def minhash_bands(df: DataFrame, *, num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """Explode the signature into (band_id, band_key) LSH bucket keys."""
    rows = num_hashes // bands
    band_cols = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws("_", *[F.col("sig")[b * rows + r] for r in range(rows)]).alias("band_key"),
        )
        for b in range(bands)
    ])
    return (
        df.withColumn("_bands", band_cols)
        .withColumn("_b", F.explode("_bands"))
        .withColumn("band_id", F.col("_b.band_id"))
        .withColumn("band_key", F.col("_b.band_key"))
        .drop("_bands", "_b")
    )


def _salt_oversized(df: DataFrame, key_col: str, id_col: str, max_block_size: int) -> DataFrame:
    """Split blocks larger than ``max_block_size`` into salt shards.

    North-rule requirement: "salted repartitioning for skewed blocks".
    Pairs across shards of one oversized block are dropped by construction
    — the deliberate pair-budget cap; recall for hot keys is instead
    preserved by the exact-key channel (identical forms already share a
    lemma key upstream).
    """
    sizes = df.groupBy(key_col).agg(F.count("*").alias("_block_n"))
    out = (
        df.join(F.broadcast(sizes.filter(F.col("_block_n") > 1)), key_col)
        .withColumn(
            "_n_shards",
            F.ceil(F.col("_block_n") / F.lit(max_block_size)).cast("int"),
        )
        .withColumn(
            "salted_key",
            F.when(
                F.col("_n_shards") <= 1, F.col(key_col)
            ).otherwise(
                F.concat_ws("#", key_col, F.pmod(F.xxhash64(id_col), F.col("_n_shards")).cast("string"))
            ),
        )
        .drop("_block_n", "_n_shards")
    )
    return out


def candidate_pairs(
    blocked: DataFrame,
    *,
    key_col: str = "block_key",
    id_col: str = "entity_key",
    max_block_size: int = 200,
    carry_cols: tuple[str, ...] = ("surface",),
) -> DataFrame:
    """Self-join within (salted) blocks → distinct unordered pairs.

    Output: (block_key, left_id, right_id, left_<carry>, right_<carry>)
    with left_id < right_id.
    """
    salted = _salt_oversized(blocked, key_col, id_col, max_block_size)
    left_cols = [F.col(key_col), F.col("salted_key"), F.col(id_col).alias("left_id")] + [
        F.col(c).alias(f"left_{c}") for c in carry_cols
    ]
    right_cols = [F.col("salted_key"), F.col(id_col).alias("right_id")] + [
        F.col(c).alias(f"right_{c}") for c in carry_cols
    ]
    a = salted.select(*left_cols)
    b = salted.select(*right_cols)
    pairs = a.join(b, "salted_key").filter(F.col("left_id") < F.col("right_id")).drop("salted_key")
    # distinct: an entity pair may co-occur in several bands/blocks
    return pairs.dropDuplicates(["left_id", "right_id"])
