"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, Arrow batch shape, partition sizing) is real
and tested. Two decode branches:

* REAL, stdlib-only parsers for container formats that need no codec
  libraries — PNG IHDR (width/height/bit depth/color type + chunk census)
  and RIFF/WAVE PCM (channels/rate/bit depth/frames + RMS amplitude);
* a deterministic fake (byte-histogram feature) for synthetic payloads
  and tests. Formats beyond PNG/WAV raise ``DecoderUnavailable`` —
  full image/video codecs are not in this container.

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png_header(payload: bytes) -> dict:
    """Parse a real PNG IHDR (stdlib-only): width/height/bit depth/color
    type, plus chunk census. Raises DecoderUnavailable on non-PNG."""
    import struct

    if len(payload) < 33 or payload[:8] != _PNG_SIG:
        raise DecoderUnavailable("not a PNG payload")
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length != 13:
        raise DecoderUnavailable("malformed PNG: first chunk is not IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    # chunk census (bounded walk; tolerates truncated tails)
    n_chunks, off = 0, 8
    while off + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[off:off + 4])
        n_chunks += 1
        off += 12 + clen
    return {
        "media_type": "image", "format": "png", "width": w, "height": h,
        "bit_depth": bit_depth, "color_type": color_type,
        "interlace": interlace, "n_chunks": n_chunks,
    }


def decode_wav_header(payload: bytes) -> dict:
    """Parse a real RIFF/WAVE header + PCM stats (stdlib-only): channels,
    sample rate, bit depth, frame count, and RMS amplitude over 16-bit
    PCM data. Raises DecoderUnavailable on non-WAV."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise DecoderUnavailable("not a WAV payload")
    off = 12
    fmt = None
    data = b""
    while off + 8 <= len(payload):
        cid, clen = struct.unpack("<4sI", payload[off:off + 8])
        body = payload[off + 8:off + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                # a truncated fmt chunk is an undecodable payload, not a
                # task crash — struct.error here would kill the executor
                # task instead of routing to the caller's error channel
                raise DecoderUnavailable("malformed WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        off += 8 + clen + (clen & 1)
    if fmt is None:
        raise DecoderUnavailable("malformed WAV: no fmt chunk")
    _audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    n_frames = len(data) // max(channels * max(bits // 8, 1), 1)
    rms = 0.0
    if bits == 16 and len(data) >= 2:
        import array
        import math

        samples = array.array("h")
        samples.frombytes(data[: len(data) - (len(data) % 2)])
        if samples:
            rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    return {
        "media_type": "audio", "format": "wav", "channels": channels,
        "sample_rate": rate, "bit_depth": bits, "n_frames": n_frames,
        "rms": rms,
    }


def _real_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Feature vector from a REAL decode (PNG or WAV header + stats) —
    header fields in fixed slots, zero-padded to ``dim``. Raises
    DecoderUnavailable for formats without a parser in this container."""
    try:
        m = decode_png_header(payload)
        vec = [1.0, float(m["width"]), float(m["height"]),
               float(m["bit_depth"]), float(m["color_type"]),
               float(m["interlace"]), float(m["n_chunks"])]
    except DecoderUnavailable:
        m = decode_wav_header(payload)
        vec = [2.0, float(m["channels"]), float(m["sample_rate"]),
               float(m["bit_depth"]), float(m["n_frames"]),
               round(float(m["rms"]), 3), 0.0]
    return (vec + [0.0] * dim)[:dim]


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

        feature_fn = _real_feature if real_decode else _fake_feature
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
                    "feature": feature_fn(bytes(payload), dim),
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
