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


def load_frozen_phashes() -> dict:
    """The committed perceptual-hash table for the fixture media
    (``resources/phashes_q111.json``) — the q38e/q38n frozen-store
    recipe applied to the multimodal family: the binary DECODE step has
    no SQL oracle, so the hashes it produces were computed ONCE through
    the real codec path (encode BMP/PNG/WebP → decode → grayscale →
    ``codecs.phash64``) and committed; the pigeonhole candidate join +
    exact hamming verify DOWNSTREAM of decode then enters both engines
    as the same literals. Per doc: the 3 format encodings (identical
    pixels → identical hash, the q111 triangle), plus two synthetic
    boundary variants of the fixture hash — one bit flipped in chunk 1
    (hamming 1: must pair via the agreeing chunk 0) and two bits
    flipped in chunk 0 (hamming 2: candidate via chunk 1, rejected by
    the exact verify) — so the hash-match exercises accept, boundary,
    and reject paths, not just distance-0 triangles."""
    import json as _json
    import os as _os

    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "resources", "phashes_q111.json",
    )
    with open(path) as f:
        return _json.load(f)


def _q_multimodal_near_dup_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q111's hash-matched twin: the SAME pigeonhole join operator
    (``hamming_chunk_pairs``) over the committed phash table, scoped to
    the sf's first-8 documents exactly like q111 synthesizes its media
    corpus."""
    from wing_binlog_go_spark.operators.dedup import hamming_chunk_pairs

    store = load_frozen_phashes()
    media = spark.createDataFrame(
        [(int(m), int(h)) for m, h in store["media"]],
        "media_id long, phash long",
    )
    first8 = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(8)
    )
    scoped = media.join(
        F.broadcast(first8),
        F.expr("media_id DIV 10") == F.col("doc_id"),
        "left_semi",
    )
    return (
        hamming_chunk_pairs(
            scoped, "media_id", "phash",
            max_hamming=int(store["max_hamming"]),
            n_chunks=int(store["n_chunks"]),
            out_a="media_a", out_b="media_b",
        )
        .select("media_a", "media_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("media_a", "media_b")
    )


def _q111b_oracle() -> str:
    store = load_frozen_phashes()
    vals = ", ".join(f"({int(m)}, CAST({int(h)} AS BIGINT))" for m, h in store["media"])
    mh, nc = int(store["max_hamming"]), int(store["n_chunks"])
    bits = 64 // nc
    mask = (1 << bits) - 1
    chunk_rows = " UNION ALL ".join(f"SELECT {c} AS chunk_no" for c in range(nc))
    # DuckDB's >> on BIGINT is an ARITHMETIC shift where Spark's
    # shiftrightunsigned is logical, but the & mask keeps only the low
    # `bits` bits of the shifted value — the sign-fill difference lives
    # entirely in the masked-away upper bits, so the chunk values agree
    # bit-for-bit across engines for every sign of hash.
    return f"""
WITH media(media_id, phash) AS (VALUES {vals}),
first8 AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 8),
scoped AS (
  SELECT m.media_id, m.phash
  FROM media m JOIN first8 f ON m.media_id // 10 = f.doc_id
),
chunked AS (
  SELECT s.media_id, s.phash, c.chunk_no,
         (s.phash >> ({bits} * c.chunk_no)) & {mask} AS chunk
  FROM scoped s, ({chunk_rows}) c
),
cand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
         CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
  FROM chunked a
  JOIN chunked b
    ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk
   AND a.media_id < b.media_id
)
SELECT media_a, media_b, hamming FROM cand
WHERE hamming <= {mh}
ORDER BY media_a, media_b
"""


QUERIES["q111b_multimodal_near_dup_frozen"] = QuerySpec(
    _q_multimodal_near_dup_frozen, _q111b_oracle()
)
