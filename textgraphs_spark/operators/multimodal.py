"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, Arrow batch shape, partition sizing) is real
and tested, while the actual codec work is stubbed behind
``DecoderUnavailable`` (the decode libraries are not in this container) or
a deterministic fake for tests.

At 100 TB the rules encoded here:
* binary payloads are NEVER read unless the plan projects them — keep
  them in their own column so parquet column pruning skips the bytes;
* decode/feature steps run in ``mapInPandas`` with a small
  maxRecordsPerBatch (payloads are MBs, not rows);
* frame-sampling/resizing emit *new* rows (posexplode), never driver
  collects.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecoderUnavailable(NotImplementedError):
    """Raised when a real media codec would be required."""


MEDIA_META_T = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("format", T.StringType()),       # png|jpeg|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("byte_hash", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real feature extractor: a histogram
    of byte values folded into ``dim`` buckets, L1-normalized."""
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    total = max(sum(buckets), 1)
    return [round(x / total, 6) for x in buckets]


def extract_features(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    dim: int = 16,
    real_decode: bool = False,
) -> DataFrame:
    """binary payloads → fixed-dim feature vectors via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if real_decode:
            raise DecoderUnavailable(
                "image/audio codecs are not available in this environment; "
                "run with real_decode=False for the deterministic fake"
            )
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                rows.append({
                    "media_id": int(mid),
                    "n_bytes": len(payload),
                    # fingerprint of the lowercase-hex encoding, not the
                    # raw bytes: identical discriminative power, and SQL
                    # engines without blob hashing (DuckDB 1.0) can
                    # reproduce it for value verification
                    "byte_hash": hashlib.md5(payload.hex().encode()).hexdigest(),
                    "feature": _fake_feature(bytes(payload), dim),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def multimodal_oracle_sql(n: int = 200, *, seed: int = 42, dim: int = 16) -> str:
    """DuckDB SQL reproducing ``extract_features(synth_media(n))`` with
    the flattened feature projection the driver query emits: same md5
    payload construction (as lowercase hex), same byte-bucket histogram,
    same micro-unit integers. Payload bytes are addressed as hex pairs so
    no blob byte-indexing is needed."""
    return f"""
WITH m AS (SELECT CAST(r.i AS BIGINT) AS media_id FROM range(0, {n}) r(i)),
h AS (SELECT media_id, md5('media:{seed}:' || media_id) AS hx FROM m),
p AS (
  SELECT media_id,
         substr(repeat(hx, CAST(1 + media_id % 7 AS INT)),
                1,
                2 * least(16 + CAST(media_id % 64 AS INT),
                          16 * CAST(1 + media_id % 7 AS INT))) AS phex
  FROM h
),
b AS (
  SELECT media_id,
         CAST(('0x' || substr(phex, CAST(2 * j.j + 1 AS INT), 2)) AS INT) % {dim} AS bucket
  FROM p, unnest(range(0, length(phex) // 2)) AS j(j)
),
hist AS (SELECT media_id, bucket, count(*) AS c FROM b GROUP BY 1, 2),
grid AS (SELECT media_id, CAST(g.g AS INT) AS bucket FROM m, unnest(range(0, {dim})) AS g(g)),
filled AS (
  SELECT grid.media_id, grid.bucket, coalesce(hist.c, 0) AS c
  FROM grid LEFT JOIN hist ON grid.media_id = hist.media_id AND grid.bucket = hist.bucket
),
tot AS (SELECT media_id, greatest(sum(c), 1) AS t FROM filled GROUP BY 1),
feat AS (
  SELECT f.media_id,
         array_to_string(
           list(CAST(CAST(round(round(f.c * 1.0 / tot.t, 6) * 1000000) AS BIGINT) AS VARCHAR)
                ORDER BY f.bucket),
           ',') AS feature
  FROM filled f JOIN tot ON f.media_id = tot.media_id
  GROUP BY f.media_id
)
SELECT p.media_id,
       length(p.phex) // 2 AS n_bytes,
       md5(p.phex) AS byte_hash,
       feat.feature
FROM p JOIN feat ON p.media_id = feat.media_id
ORDER BY p.media_id
"""


def frame_sample_plan(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    meta_col: str = "meta",
    every_ms: int = 1000,
) -> DataFrame:
    """Video → one row per sampled frame timestamp (plumbing only: the
    frame decode itself is the stubbed step). Pure column expressions."""
    n_frames = F.greatest(
        (F.col(f"{meta_col}.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col(f"{meta_col}.media_type") == "video")
        .select(
            F.col(id_col),
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
        )
        .select(
            id_col, "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int, *, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                h = hashlib.md5(f"media:{seed}:{i}".encode()).digest()
                payload = (h * (1 + i % 7))[: 16 + (i % 64)]
                mt = ["image", "audio", "video"][i % 3]
                rows.append({
                    "media_id": i,
                    "payload": payload,
                    "meta": {
                        "media_type": mt,
                        "format": {"image": "png", "audio": "wav", "video": "mp4"}[mt],
                        "width": 64 + i % 512 if mt == "image" else None,
                        "height": 64 + i % 256 if mt == "image" else None,
                        "duration_ms": (1000 + i * 37 % 9000) if mt != "image" else None,
                    },
                })
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_T),
    ])
    return spark.range(n).mapInPandas(gen, schema=schema)
