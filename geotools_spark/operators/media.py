"""Multimodal media columns: image/audio/video as opaque BINARY
payloads with typed metadata, processed by Arrow-batched kernels.

The interleaved documents table references media by ``media_ref``
(BASELINE.json input_hint); this module provides the media side:

  (media_ref string, kind string, payload binary,
   meta struct<width int, height int, channels int,
               sample_rate int, duration_ms int>)

Real decoders (Pillow/librosa/ffmpeg) are NOT installed in this
environment, so the decode kernels run a CLEARLY-MARKED deterministic
fake (bytes -> numpy) behind ``fake_decode=True``; passing
``fake_decode=False`` raises NotImplementedError at the exact seam
where a real decoder plugs in. Everything Spark-side — schema, join to
the span table, mapInPandas batch shapes, frame explode, feature
vectorization — is real and tested, which is the part that matters at
100 TB (the decode kernel is embarrassingly parallel either way).

Partitioning note: payloads are large blobs; operators here are
narrow (no shuffle) except frame_sample's explode, which multiplies
rows but not payload bytes (frames reference the parent blob by
offset, they do not copy it).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, "
    "sample_rate:int, duration_ms:int>"
)


def synthetic_media(spark: SparkSession, refs: DataFrame) -> DataFrame:
    """Deterministic media table for the given ``media_ref`` column —
    payload bytes derived from sha2(media_ref), metadata derived from
    xxhash64. No RNG objects; fully distributed."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("media_ref"), 3) + 1).cast("int"),
    )
    payload = F.to_binary(
        F.repeat(F.sha2(F.col("media_ref"), 256), 8), F.lit("hex")
    )
    h = F.pmod(F.xxhash64("media_ref", F.lit(1)), 1000)
    meta = F.struct(
        (F.pmod(F.xxhash64("media_ref", F.lit(2)), 48) * 16 + 64).cast("int").alias("width"),
        (F.pmod(F.xxhash64("media_ref", F.lit(3)), 32) * 16 + 64).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        ((h + 1) * 40).cast("int").alias("duration_ms"),
    )
    return refs.select(
        F.col("media_ref"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def _fake_pixels(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """DETERMINISTIC FAKE DECODE: tile the payload bytes into the
    declared (h, w, c) shape. Stands in for a real image decoder."""
    need = width * height * channels
    buf = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(need / len(buf)))
    return np.tile(buf, reps)[:need].reshape(height, width, channels)


def decode_image_stats(df: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """Decode image payloads and emit per-channel means + brightness.
    Arrow-batched mapInPandas; one output row per input image."""
    if not fake_decode:
        raise NotImplementedError(
            "real image decoding requires Pillow/libvips — plug a decoder "
            "into _fake_pixels and pass fake_decode=True semantics through"
        )

    out_schema = "media_ref string, mean_r double, mean_g double, mean_b double, brightness double"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            refs, mr, mg, mb, br = [], [], [], [], []
            # zip over raw columns, not iterrows: iterrows builds a
            # Series per row (~10x overhead on the batch loop)
            for ref, payload, m in zip(
                pdf["media_ref"], pdf["payload"], pdf["meta"]
            ):
                px = _fake_pixels(payload, m["width"], m["height"], m["channels"])
                ch = px.mean(axis=(0, 1))
                refs.append(ref)
                mr.append(float(ch[0]))
                mg.append(float(ch[1]))
                mb.append(float(ch[2]))
                br.append(float(px.mean()))
            yield pd.DataFrame(
                {"media_ref": refs, "mean_r": mr, "mean_g": mg, "mean_b": mb, "brightness": br}
            )

    return df.mapInPandas(_decode, out_schema)


def resize_image_meta(df: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize as metadata transform (the real pixel resample happens in
    the decode kernel at read time — standard lazy-media pattern):
    rewrites meta and stamps the requested target. Pure column ops."""
    new_meta = F.struct(
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.col("meta.channels").alias("channels"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    return df.withColumn("meta", new_meta)


def frame_sample(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Sample frame timestamps from videos: one row per sampled frame,
    referencing the parent payload by (media_ref, ts_ms) instead of
    copying bytes. Pure explode — stays in codegen."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(int(every_ms)),
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_ref", "meta", F.explode(frames).alias("ts_ms"))
        .withColumn("frame_idx", (F.col("ts_ms") / every_ms).cast("int"))
    )


def media_embedding(df: DataFrame, *, dim: int = 16, fake_decode: bool = True) -> DataFrame:
    """Feature-extract payloads into a dense embedding array<double>.
    DETERMINISTIC FAKE: fold payload bytes into ``dim`` buckets and
    l2-normalize — stands in for a CNN/audio encoder; the batch shape
    (Arrow in, array column out) is the real contract."""
    if not fake_decode:
        raise NotImplementedError("real feature extraction needs a model runtime")

    out_schema = f"media_ref string, kind string, embedding array<double>"

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                buf = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                pad = (-len(buf)) % dim
                if pad:
                    buf = np.pad(buf, (0, pad))
                v = buf.reshape(-1, dim).sum(axis=0)
                n = np.linalg.norm(v)
                embs.append((v / n if n > 0 else v).tolist())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "embedding": embs,
                }
            )

    return df.mapInPandas(_embed, out_schema)
