"""Z-order layout: the Morton code is a correct bit interleave, the
written layout is value-complete, and — the point — a two-dimensional
box predicate can prune MORE FILES (by parquet footer min/max) than a
single-column-sorted layout of the same file count."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from wing_binlog_go_spark.operators.zorder import (
    write_zordered,
    zorder_values,
)
from wing_binlog_go_spark.tables import read_table


def _files_admitting(path: str, col_a: str, lo_a, hi_a, col_b, lo_b, hi_b):
    """Files whose footer min/max CANNOT exclude the box predicate —
    exactly the files a stats-pruning scan must read."""
    admit = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins: dict = {}
        maxs: dict = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                name = c.path_in_schema
                st = c.statistics
                if st is None:
                    continue
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        if not mins:
            admit.append(f)
            continue
        if mins[col_a] > hi_a or maxs[col_a] < lo_a:
            continue
        if mins[col_b] > hi_b or maxs[col_b] < lo_b:
            continue
        admit.append(f)
    return admit


def test_morton_interleave_is_exact(spark):
    """Hand-checked interleave: x=0b0011, y=0b0101 at 4 bits →
    z = sum over i of x_i<<(2i) + y_i<<(2i+1) = 0b00100111."""
    df = spark.createDataFrame([(3, 5)], ["x", "y"])
    # force identity scaling: min=0, max=15 at bits=4 needs a range row
    df = df.union(spark.createDataFrame([(0, 0), (15, 15)], ["x", "y"]))
    zdf, stats = zorder_values(df, ["x", "y"], bits=4)
    assert stats == {"x": (0.0, 15.0), "y": (0.0, 15.0)}
    z = {(r.x, r.y): r._z for r in zdf.collect()}
    assert z[(3, 5)] == 0b00100111
    assert z[(0, 0)] == 0
    assert z[(15, 15)] == 0b11111111


def test_zorder_guards(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_values(df, ["a"])
    with pytest.raises(ValueError, match="overflows"):
        zorder_values(df, ["a", "b"], bits=32)


def test_zordered_layout_prunes_box_predicates(spark, sf_small, tmp_path):
    """Z-order's claim is BALANCED pruning: a user_id-sorted layout
    prunes perfectly on user_id and not at all on amount; the z-ordered
    layout must prune substantially on EITHER dimension alone (at most
    half the files the single-sorted layout admits on its unsorted
    dimension) and at least as well on the two-dimensional box — while
    remaining value-complete and returning correct pruned-scan
    results."""
    ev = read_table(spark, sf_small, "events").select(
        "event_id", "user_id", F.col("value").cast("double").alias("amount")
    )
    n_files = 64

    flat = str(tmp_path / "flat")
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(flat)
    )
    zpath = str(tmp_path / "zord")
    # amount is heavily skewed (range 0.03-327, median ~35): quantile
    # coding gives every code equal row mass, which is what makes a
    # 20%-mass band touch ~20% of the code axis
    write_zordered(
        ev, zpath, ["user_id", "amount"], n_files=n_files,
        bits=6, coding="quantile",
    )

    # value-completeness: same multiset of event ids
    a = spark.read.parquet(zpath).agg(
        F.count("*"), F.sum("event_id"), F.sum(F.hash("event_id").cast("long"))
    ).collect()[0]
    b = spark.read.parquet(flat).agg(
        F.count("*"), F.sum("event_id"), F.sum(F.hash("event_id").cast("long"))
    ).collect()[0]
    assert tuple(a) == tuple(b)

    # middle 20% band of each dimension; full range of the other.
    # File counts differ between layouts (range-partitioning 15
    # distinct user ids over 32 partitions leaves empty partitions
    # unwritten), so compare admitted FRACTIONS.
    u = ev.approxQuantile("user_id", [0.0, 0.4, 0.6, 1.0], 0.0)
    m = ev.approxQuantile("amount", [0.0, 0.4, 0.6, 1.0], 0.0)
    n_z = len(glob.glob(f"{zpath}/*.parquet"))
    n_flat = len(glob.glob(f"{flat}/*.parquet"))
    assert n_z == n_files

    # amount-only predicate: the user_id-sorted layout cannot prune
    # (amount scatters across every file); z-order must halve the
    # admitted fraction
    flat_amt = _files_admitting(flat, "user_id", u[0], u[3], "amount", m[1], m[2])
    z_amt = _files_admitting(zpath, "user_id", u[0], u[3], "amount", m[1], m[2])
    assert len(flat_amt) == n_flat, (len(flat_amt), n_flat)
    assert len(z_amt) / n_z <= 0.5, (len(z_amt), n_z)

    # user-only predicate: z-order still prunes (coarser than the
    # perfectly-sorted layout, but well below a full scan)
    z_usr = _files_admitting(zpath, "user_id", u[1], u[2], "amount", m[0], m[3])
    assert len(z_usr) / n_z <= 0.75, (len(z_usr), n_z)

    # the two-dimensional box is the headline: both dimensions prune
    # multiplicatively-ish (measured 0.19 at this config vs 1.0 flat)
    admit_z = _files_admitting(zpath, "user_id", u[1], u[2], "amount", m[1], m[2])
    assert len(admit_z) / n_z <= 0.35, (len(admit_z), n_z)
    assert len(admit_z) <= min(len(z_amt), len(z_usr))

    # and the pruned scan is still CORRECT: reading only admitted files
    # returns the same box rows as the full scan
    want = (
        ev.filter(
            F.col("user_id").between(u[1], u[2])
            & F.col("amount").between(m[1], m[2])
        ).count()
    )
    got = (
        spark.read.parquet(*admit_z)
        .filter(
            F.col("user_id").between(u[1], u[2])
            & F.col("amount").between(m[1], m[2])
        ).count()
    )
    assert want > 0 and got == want


def test_optimize_zorder_rewrites_in_place_crash_safely(spark, sf_small, tmp_path):
    """The maintenance form: rewrites a live table dir through the
    staged-swap protocol (value-complete, z-clustered after), and a
    crash that left only the backup recovers before optimizing."""
    import shutil

    from wing_binlog_go_spark.streaming.maintenance import optimize_zorder

    ev = read_table(spark, sf_small, "events").select(
        "event_id", "user_id", F.col("value").cast("double").alias("amount")
    )
    path = str(tmp_path / "tbl")
    ev.repartition(8).write.parquet(path)
    before = ev.agg(F.sum("event_id")).collect()[0][0]

    n = optimize_zorder(spark, path, ["user_id", "amount"], bits=6)
    assert n >= 1
    after = spark.read.parquet(path).agg(F.sum("event_id")).collect()[0][0]
    assert after == before

    # crash sim: table dir vanished mid-swap, backup remains
    backup = str(tmp_path / ".tbl._old")
    shutil.move(path, backup)
    n2 = optimize_zorder(spark, path, ["user_id", "amount"], bits=6)
    assert n2 >= 1
    assert spark.read.parquet(path).agg(F.sum("event_id")).collect()[0][0] == before


def _xy2d_ref(order: int, x: int, y: int) -> int:
    """Reference Hilbert xy2d (Wikipedia form) for cross-checking the
    Spark expression."""
    rx = ry = 0
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_index_matches_reference(spark):
    """The unrolled Spark expression equals the canonical xy2d walk on
    every cell of an 8x8 grid (bits=3) and on random 6-bit points."""
    import random

    from wing_binlog_go_spark.operators.zorder import _hilbert_d2

    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "d", _hilbert_d2(F.col("x"), F.col("y"), 3)
    )
    got = {(r.x, r.y): r.d for r in df.collect()}
    for x, y in pts:
        assert got[(x, y)] == _xy2d_ref(8, x, y), (x, y)
    # the 3-bit curve visits all 64 cells exactly once
    assert sorted(got.values()) == list(range(64))

    random.seed(11)
    pts6 = [(random.randrange(64), random.randrange(64)) for _ in range(50)]
    df6 = spark.createDataFrame(pts6, "x long, y long").withColumn(
        "d", _hilbert_d2(F.col("x"), F.col("y"), 6)
    )
    for r in df6.collect():
        assert r.d == _xy2d_ref(64, r.x, r.y), (r.x, r.y)


def test_hilbert_layout_prunes_at_least_as_well_as_morton(spark, sf_small, tmp_path):
    """Hilbert's adjacency (no Z-jumps) must not lose to Morton on the
    2-D box at the same file count / bit budget (small slack for
    range-boundary noise), and the layout stays value-complete."""
    ev = read_table(spark, sf_small, "events").select(
        "event_id", "user_id", F.col("value").cast("double").alias("amount")
    )
    n_files = 64
    mpath, hpath = str(tmp_path / "m"), str(tmp_path / "h")
    write_zordered(ev, mpath, ["user_id", "amount"], n_files=n_files,
                   bits=6, coding="quantile", curve="morton")
    write_zordered(ev, hpath, ["user_id", "amount"], n_files=n_files,
                   bits=6, coding="quantile", curve="hilbert")
    assert (
        spark.read.parquet(hpath).count() == ev.count()
    )
    u = ev.approxQuantile("user_id", [0.4, 0.6], 0.0)
    m = ev.approxQuantile("amount", [0.4, 0.6], 0.0)
    adm_m = _files_admitting(mpath, "user_id", u[0], u[1], "amount", m[0], m[1])
    adm_h = _files_admitting(hpath, "user_id", u[0], u[1], "amount", m[0], m[1])
    assert len(adm_h) <= len(adm_m) + 2, (len(adm_h), len(adm_m))


def _skilling_axes_to_index(coords: list[int], bits: int) -> int:
    """Pure-Python Skilling AxesToTranspose + MSB-major interleave —
    the independent reference the Spark column implementation must
    match bit-for-bit."""
    x = list(coords)
    n = len(x)
    m = 1 << (bits - 1)
    q = m
    while q > 1:
        p = q - 1
        for i in range(n):
            if x[i] & q:
                x[0] ^= p
            else:
                t = (x[0] ^ x[i]) & p
                x[0] ^= t
                x[i] ^= t
        q >>= 1
    for i in range(1, n):
        x[i] ^= x[i - 1]
    t = 0
    q = m
    while q > 1:
        if x[n - 1] & q:
            t ^= q - 1
        q >>= 1
    for i in range(n):
        x[i] ^= t
    idx = 0
    for s in range(bits - 1, -1, -1):
        for i in range(n):
            idx = (idx << 1) | ((x[i] >> s) & 1)
    return idx


def test_hilbert_3d_matches_reference_bijective_and_unit_step(spark):
    """The d>2 Hilbert path (Skilling transpose) over the full 3-D,
    3-bit cube (512 cells): (a) every cell's index equals the
    pure-Python reference, (b) the map is a bijection onto [0, 512),
    (c) consecutive indexes differ by exactly 1 in exactly one
    coordinate — the unit-step property that defines a Hilbert curve
    and is what tightens per-file bounding boxes."""
    from wing_binlog_go_spark.operators.zorder import _hilbert_skilling_frame

    bits, n = 3, 3
    side = 1 << bits
    cells = [
        (cx, cy, cz)
        for cx in range(side) for cy in range(side) for cz in range(side)
    ]
    df = spark.createDataFrame(cells, ["_c0", "_c1", "_c2"])
    got = {
        (r._c0, r._c1, r._c2): r._z
        for r in _hilbert_skilling_frame(df, ["_c0", "_c1", "_c2"], bits)
        .select("_c0", "_c1", "_c2", "_z")
        .collect()
    }
    # (a) reference equality, cell for cell
    for coords, z in got.items():
        assert z == _skilling_axes_to_index(list(coords), bits), coords
    # (b) bijection onto the full index range
    assert sorted(got.values()) == list(range(side ** n))
    # (c) unit-step adjacency along the whole walk
    by_index = sorted(got, key=got.get)
    for a, b in zip(by_index, by_index[1:]):
        diffs = [abs(p - q) for p, q in zip(a, b)]
        assert sorted(diffs) == [0, 0, 1], (a, b)


def test_hilbert_4d_write_path(spark, sf_small, tmp_path):
    """write_zordered(curve='hilbert') accepts 4 columns through the
    Skilling path and stays value-complete."""
    ev = read_table(spark, sf_small, "events").select(
        "event_id", "user_id",
        F.col("value").cast("double").alias("amount"),
        F.dayofmonth("ts").alias("day"),
    )
    path = str(tmp_path / "h4")
    write_zordered(
        ev, path, ["user_id", "amount", "day", "event_id"],
        n_files=16, bits=4, coding="quantile", curve="hilbert",
    )
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert sorted(r.event_id for r in back.select("event_id").collect()) == \
        sorted(r.event_id for r in ev.select("event_id").collect())
