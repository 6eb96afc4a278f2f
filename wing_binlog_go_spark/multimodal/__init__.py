"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Driver north star: at 100 TB, media payloads dominate storage, so the
plumbing matters more than any single codec:

- payloads are ``binary`` columns (parquet keeps them out of dictionary
  encoding), metadata is a typed struct so predicates (mime, width,
  duration) push down WITHOUT touching bytes;
- decode/feature steps run in ``mapInPandas`` so each Arrow batch moves
  to Python once, and ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds executor memory against large blobs;
- partition by size: ``repartition`` on a size-bucket column keeps blob
  skew from starving tasks.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this environment, so
decode bodies are stubs: ``decode_image``/``decode_audio`` raise
NotImplementedError at the point a codec would run, and
``fake_decode_image`` is the deterministic stand-in the tests and the
schema contract run against. The Spark-side shape — schemas, batch
iteration, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real decode would go through PIL/libjpeg — not available here."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use fake_decode_image for the deterministic test path"
    )


def fake_decode_image(payload: bytes) -> dict:
    """Deterministic stand-in for a decoder: derives stable pseudo-features
    from the raw bytes so the pipeline shape is testable end-to-end."""
    n = len(payload)
    mean = (sum(payload) / n) if n else 0.0
    # 64-bit rolling hash as a stand-in perceptual hash
    h = 1469598103934665603
    for b in payload:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return {"n_bytes": n, "mean_byte": mean, "phash": h - (1 << 63)}


def image_features(df: DataFrame, batch_decoder=fake_decode_image) -> DataFrame:
    """payload → feature rows via mapInPandas (one Arrow batch per call)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [batch_decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "mean_byte": [f["mean_byte"] for f in feats],
                    "phash": [f["phash"] for f in feats],
                }
            )

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def decode_audio(payload: bytes) -> "object":
    """Real decode would go through soundfile/ffmpeg — not available."""
    raise NotImplementedError(
        "audio codecs are not installed in this environment; "
        "use fake_decode_audio for the deterministic test path"
    )


def fake_decode_audio(payload: bytes) -> dict:
    """Deterministic stand-in: treat bytes as signed samples."""
    samples = [b - 128 for b in payload]
    n = len(samples)
    rms = (sum(s * s for s in samples) / n) ** 0.5 if n else 0.0
    zc = sum(
        1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0)
    )
    return {"n_bytes": n, "rms": rms, "zero_crossings": zc}


def audio_features(df: DataFrame, batch_decoder=fake_decode_audio) -> DataFrame:
    """payload → audio feature rows via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [batch_decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "rms": [f["rms"] for f in feats],
                    "zero_crossings": [f["zero_crossings"] for f in feats],
                }
            )

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp.

    The decode of each frame is the stubbed step; the row explosion —
    which is the part that matters for partitioning (a 2-hour video is
    7200 rows at 1 fps) — is real Spark: sequence+explode, no UDF.
    """
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )


def phash_near_dup_pairs(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate media by perceptual-hash distance.

    Same scale shape as text SimHash dedup (operators/dedup.py): split
    the 64-bit phash into 4 16-bit chunks — any pair within hamming 3
    shares ≥1 chunk (pigeonhole) — so candidates come from an equi-join
    on (chunk_no, chunk), never an O(n²) comparison.
    """
    feats = image_features(df).select("media_id", "phash")
    feats = feats.repartition(F.col("media_id"))  # optimizer barrier + co-locate
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("phash"), 16 * c).bitwiseAND(F.lit(0xFFFF))
            for c in range(4)
        ]
    )
    b = feats.select(
        F.col("media_id").alias("m"),
        F.col("phash"),
        F.posexplode(chunks).alias("chunk_no", "chunk"),
    )
    lhs, rhs = b.alias("a"), b.alias("b")
    return (
        lhs.join(
            rhs,
            (F.col("a.chunk_no") == F.col("b.chunk_no"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.m") < F.col("b.m")),
        )
        .select(
            F.col("a.m").alias("media_a"),
            F.col("b.m").alias("media_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def size_bucketed(df: DataFrame, buckets: int = 32) -> DataFrame:
    """Repartition by payload-size bucket so giant blobs spread evenly."""
    return df.withColumn(
        "_size_bucket", (F.length("payload") % buckets).cast("int")
    ).repartition(buckets, "_size_bucket").drop("_size_bucket")
