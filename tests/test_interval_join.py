"""Interval overlap join: bucketed candidates equal the exact theta
join, edge semantics hold, and the registered plan stays an equi-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wing_binlog_go_spark.operators.interval_join import (
    interval_overlap_pairs,
    session_intervals,
)
from wing_binlog_go_spark.tables import read_table


def test_bucketed_overlap_equals_theta_join(spark, sf_small):
    """Chunk-join + verify must equal the exact (nested-loop) theta
    join on the real session intervals, for a chunk width both smaller
    and larger than typical sessions (recall is 1 by pigeonhole, not by
    tuning)."""
    iv = session_intervals(read_table(spark, sf_small, "events")).select(
        F.concat_ws("#", "user_id", "session_no").alias("id"),
        "start_us",
        "end_us",
    )
    a = iv.alias("a")
    b = iv.alias("b")
    brute = {
        (r["aid"], r["bid"], r["ov"])
        for r in a.join(
            b,
            (F.col("a.start_us") <= F.col("b.end_us"))
            & (F.col("b.start_us") <= F.col("a.end_us")),
        )
        .select(
            F.col("a.id").alias("aid"),
            F.col("b.id").alias("bid"),
            (
                F.least("a.end_us", "b.end_us")
                - F.greatest("a.start_us", "b.start_us")
            ).alias("ov"),
        )
        .collect()
    }
    assert brute, "fixture must contain overlapping sessions"
    for chunk in (300, 3600, 86400):
        got = {
            (r.id_a, r.id_b, r.overlap_us)
            for r in interval_overlap_pairs(iv, iv, chunk_seconds=chunk).collect()
        }
        assert got == brute, chunk


def test_overlap_edges_and_guards(spark):
    """Touching intervals overlap with 0 µs; disjoint ones don't;
    non-positive chunk raises."""
    left = spark.createDataFrame(
        [("L", 0, 10_000_000)], "id string, start_us long, end_us long"
    )
    right = spark.createDataFrame(
        [("touch", 10_000_000, 20_000_000), ("gap", 10_000_001, 20_000_000)],
        "id string, start_us long, end_us long",
    )
    got = {
        (r.id_a, r.id_b): r.overlap_us
        for r in interval_overlap_pairs(left, right, chunk_seconds=5).collect()
    }
    assert got == {("L", "touch"): 0}
    with pytest.raises(ValueError, match="chunk_seconds"):
        interval_overlap_pairs(left, right, chunk_seconds=0)


def test_overlap_negative_epoch_intervals(spark):
    """Pre-1970 intervals (negative epoch µs) must bucket with floor
    semantics: cast-truncation toward zero would assign [-7s, -3s] and
    [-4s, -1s] to disjoint chunk ranges at chunk=5s and silently miss
    the overlap (the ADVICE r6 finding)."""
    left = spark.createDataFrame(
        [("A", -7_000_000, -3_000_000), ("C", -100_000_000, -90_000_000)],
        "id string, start_us long, end_us long",
    )
    right = spark.createDataFrame(
        [("B", -4_000_000, -1_000_000), ("D", 1_000_000, 2_000_000)],
        "id string, start_us long, end_us long",
    )
    got = {
        (r.id_a, r.id_b): r.overlap_us
        for r in interval_overlap_pairs(left, right, chunk_seconds=5).collect()
    }
    assert got == {("A", "B"): 1_000_000}

    # Straddling zero: an interval crossing the epoch must still meet
    # both a negative-side and a positive-side partner.
    straddle = spark.createDataFrame(
        [("S", -2_000_000, 2_000_000)], "id string, start_us long, end_us long"
    )
    both = spark.createDataFrame(
        [("N", -3_000_000, -2_500_000), ("P", 1_500_000, 9_000_000)],
        "id string, start_us long, end_us long",
    )
    got2 = {
        (r.id_a, r.id_b): r.overlap_us
        for r in interval_overlap_pairs(straddle, both, chunk_seconds=5).collect()
    }
    assert got2 == {("S", "P"): 500_000}
