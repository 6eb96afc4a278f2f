"""Driver-registered multimodal query: cross-format image near-dup.

The multimodal family was previously evidenced only by its own test
suite; this gives it a driver CORRECTNESS row. The callable
synthesizes a deterministic media corpus from the ``documents`` table
(so it respects ``sf_dir`` like every other query), encodes each
image in THREE real container formats (BMP, PNG, lossless WebP), and
runs the pigeonhole phash near-dup join with the REAL decoder — the
same bytes-in → pairs-out path a production media-dedup pass runs.

Rows-only by design: perceptual hashing has no SQL oracle. The exact
expected pair set is the per-doc format triangle (3 encodings of the
same pixels decode to identical pixels → identical phash → all three
pair up), asserted by the local test; the driver checks row count +
schema stability.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wing_binlog_go_spark.plans.relational import QuerySpec
from wing_binlog_go_spark.tables import read_table

QUERIES: dict[str, QuerySpec] = {}

_N_DOCS = 8  # 8 docs × 3 formats = 24 media rows, 24 decodes


def _synth_media_rows(doc_ids: list[int]) -> list[tuple]:
    """Deterministic media corpus: per doc, one 16×16 RGB image seeded
    by the doc id, encoded as BMP + PNG + lossless WebP (identical
    pixels — the decoders must agree bit-exactly for the triangle of
    pairs to form)."""
    from wing_binlog_go_spark.multimodal.codecs import (
        encode_bmp,
        encode_png,
        encode_webp,
    )

    rows = []
    for did in doc_ids:
        img = np.random.RandomState(did).randint(0, 256, (16, 16, 3), dtype=np.uint8)
        for k, payload in enumerate(
            (encode_bmp(img), encode_png(img), encode_webp(img))
        ):
            rows.append(
                (
                    did * 10 + k,
                    payload,
                    ("image/x-test", 16, 16, None),
                )
            )
    return rows


def _q_multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wing_binlog_go_spark.multimodal import (
        MEDIA_SCHEMA,
        phash_near_dup_pairs,
        real_decode_image,
    )

    doc_ids = [
        r.doc_id
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(_N_DOCS)
        .collect()
    ]
    media = spark.createDataFrame(_synth_media_rows(doc_ids), MEDIA_SCHEMA)
    # max_hamming=1 (not 0): a single 64-bit pigeonhole chunk would need
    # a (1<<64)-1 literal, which exceeds a JVM long; two 32-bit chunks
    # keep the join legal and identical-pixel re-encodes still match at
    # distance 0 while distinct docs sit far apart
    return (
        phash_near_dup_pairs(media, max_hamming=1, batch_decoder=real_decode_image)
        .select("media_a", "media_b")
        .orderBy("media_a", "media_b")
    )


QUERIES["q111_multimodal_near_dup"] = QuerySpec(_q_multimodal_near_dup, None)  # phash — no SQL oracle; exact triangle asserted in tests
