"""Multimodal plumbing: schema contract, Arrow batch shape, stubbed
decode path, frame-sample explosion."""

from __future__ import annotations

import pytest

from wing_binlog_go_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    fake_decode_image,
    frame_sample_plan,
    image_features,
    size_bucketed,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, bytes([10, 20, 30, 40]), ("image/png", 2, 2, None)),
        (2, b"", ("image/png", 0, 0, None)),
        (3, bytes(range(256)), ("image/jpeg", 16, 16, None)),
        (4, b"\xff" * 1000, ("video/mp4", 640, 480, 3500)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_decode_is_deterministic():
    a, b = fake_decode_image(bytes([1, 2, 3])), fake_decode_image(bytes([1, 2, 3]))
    assert a == b and a["n_bytes"] == 3


def test_image_features_pipeline(media):
    feats = {r.media_id: r for r in image_features(media).collect()}
    assert feats[1].n_bytes == 4 and feats[1].mean_byte == 25.0
    assert feats[2].n_bytes == 0 and feats[2].mean_byte == 0.0
    assert feats[3].mean_byte == 127.5
    # phash stable across runs
    again = {r.media_id: r.phash for r in image_features(media).collect()}
    assert again == {k: v.phash for k, v in feats.items()}


def test_metadata_predicates_skip_payload(media):
    # filter on meta only — plan should not reference payload bytes
    imgs = media.filter(media.meta.mime.startswith("image/")).select("media_id")
    assert {r.media_id for r in imgs.collect()} == {1, 2, 3}
    assert "payload" not in imgs.columns


def test_audio_features_pipeline(spark):
    from wing_binlog_go_spark.multimodal import audio_features, decode_audio, MEDIA_SCHEMA

    rows = [
        (10, bytes([128, 128, 128, 128]), ("audio/wav", None, None, 4)),  # silence
        (11, bytes([0, 255, 0, 255]), ("audio/wav", None, None, 4)),      # square wave
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in audio_features(df).collect()}
    assert feats[10].rms == 0.0 and feats[10].zero_crossings == 0
    assert feats[11].rms > 100 and feats[11].zero_crossings == 3
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_frame_sample_explosion(media):
    frames = frame_sample_plan(media.filter(media.media_id == 4), every_ms=1000).collect()
    assert [f.frame_ts_ms for f in frames] == [0, 1000, 2000, 3000]


def test_null_payload_yields_null_features(spark):
    from wing_binlog_go_spark.multimodal import audio_features

    rows = [(1, None, ("image/png", 1, 1, None)),
            (2, bytes([1, 2]), ("image/png", 1, 1, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in image_features(df).collect()}
    assert feats[1].n_bytes is None and feats[1].phash is None
    assert feats[2].n_bytes == 2
    audio = {r.media_id: r for r in audio_features(df).collect()}
    assert audio[1].rms is None


def test_negative_duration_frame_sample(spark):
    rows = [(9, b"x", ("video/mp4", 1, 1, -500))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = frame_sample_plan(df, every_ms=1000).collect()
    assert [f.frame_ts_ms for f in frames] == [0]


def test_phash_near_dup_finds_exact_copies(spark):
    from wing_binlog_go_spark.multimodal import phash_near_dup_pairs

    rows = [
        (1, bytes(range(100)), ("image/png", 8, 8, None)),
        (2, bytes(range(100)), ("image/png", 8, 8, None)),   # exact copy of 1
        (3, bytes([7] * 64), ("image/png", 8, 8, None)),
        (4, bytes(range(99)) + b"\x00", ("image/png", 8, 8, None)),  # near 1
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {(r.media_a, r.media_b): r.hamming for r in phash_near_dup_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0  # exact copies always found
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_size_bucketing_preserves_rows(media):
    assert size_bucketed(media, buckets=4).count() == 4


def test_phash_planted_near_dup_recall_at_loose_threshold(spark):
    """Planted perceptual near-dups: a decoder stub assigns each copy a
    phash within k bits of its original (k = 1..7, re-encode noise); the
    auto-chunked pigeonhole join must recall ALL of them at
    max_hamming=7 and none of the far pairs (the exact bit_count filter
    makes recall deterministic, not probabilistic)."""
    import random

    from wing_binlog_go_spark.multimodal import phash_near_dup_pairs

    rng = random.Random(42)
    base_hashes = {i: rng.getrandbits(63) for i in range(10)}

    def flip(h, k):
        for bit in rng.sample(range(64), k):
            h ^= 1 << bit
        return h - (1 << 64) if h >= (1 << 63) else h

    planted = {}  # media_id -> phash
    expected = set()
    for i, h in base_hashes.items():
        planted[i] = h
        k = (i % 7) + 1
        planted[i + 1000] = flip(h, k)  # near-dup copy, k bits away
        expected.add((i, i + 1000))

    def stub_decoder(payload):
        mid = int.from_bytes(payload, "big")
        return {"n_bytes": len(payload), "mean_byte": 0.0, "phash": planted[mid]}

    rows = [
        (mid, mid.to_bytes(4, "big"), ("image/png", 8, 8, None))
        for mid in planted
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r.media_a, r.media_b): r.hamming
        for r in phash_near_dup_pairs(
            df, max_hamming=7, batch_decoder=stub_decoder
        ).collect()
    }
    assert expected <= set(pairs), f"missed planted dups: {expected - set(pairs)}"
    for (a, b), ham in pairs.items():
        assert ham <= 7
    # distinct random base hashes must not pair with each other
    cross = {(a, b) for a, b in pairs if a < 1000 and b < 1000}
    assert not cross
