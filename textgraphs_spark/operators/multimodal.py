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
                    "byte_hash": hashlib.md5(payload).hexdigest(),
                    "feature": _fake_feature(bytes(payload), dim),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


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
