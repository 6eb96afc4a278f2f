"""Z-order clustering: the layout must measurably tighten parquet
row-group min/max statistics on EVERY clustered column — verified by
reading the actual parquet footers with pyarrow, not by trusting the
plan."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from wing_binlog_go_spark.operators.clustering import zorder_key, zorder_write
from wing_binlog_go_spark.tables import read_table


def _rowgroup_span_fraction(path: str, col: str) -> float:
    """Mean (max-min)/global_range over all row groups of all files —
    1.0 ≈ every row group spans the whole domain (no skipping possible),
    → 0 ≈ perfectly clustered."""
    spans, lo_all, hi_all = [], None, None
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[col]
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
            lo_all = st.min if lo_all is None else min(lo_all, st.min)
            hi_all = st.max if hi_all is None else max(hi_all, st.max)
    rng = (hi_all - lo_all) or 1
    return sum((b - a) for a, b in spans) / (len(spans) * rng)


def test_zorder_write_tightens_rowgroup_stats_on_both_columns(spark, sf_dir, tmp_path):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    flat = str(tmp_path / "flat")
    zord = str(tmp_path / "zorder")
    # control: same file count, no clustering (round-robin layout)
    li.repartition(16).write.mode("overwrite").parquet(flat)
    zorder_write(li, zord, ["l_partkey", "l_extendedprice"], n_bits=5, num_files=16)

    # identical data either way
    assert (
        spark.read.parquet(zord).count()
        == spark.read.parquet(flat).count()
        == li.count()
    )
    for col in ("l_partkey", "l_extendedprice"):
        f_flat = _rowgroup_span_fraction(flat, col)
        f_z = _rowgroup_span_fraction(zord, col)
        # unclustered row groups span ~the whole domain; z-ordered ones
        # must be at least 2x narrower on BOTH columns simultaneously
        assert f_z < f_flat / 2, (col, f_z, f_flat)


def test_zorder_key_is_deterministic_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.0), (4, 20.0)], "a long, b double"
    )
    k1 = [r.z for r in df.select(zorder_key(df, ["a", "b"], 3).alias("z")).orderBy("a").collect()]
    k2 = [r.z for r in df.select(zorder_key(df, ["a", "b"], 3).alias("z")).orderBy("a").collect()]
    assert k1 == k2
    assert all(isinstance(v, int) for v in k1)  # NULL b → bucket 0, no NULL key


def test_zorder_single_column_reduces_to_range_layout(spark, sf_dir, tmp_path):
    """One clustered column degenerates to a plain range sort — spans
    shrink dramatically on that column."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    out = str(tmp_path / "z1")
    zorder_write(o, out, ["o_custkey"], n_bits=4, num_files=4)
    assert _rowgroup_span_fraction(out, "o_custkey") < 0.3
    # data intact under the layout change
    a = o.agg(F.sum("o_custkey")).first()[0]
    b = spark.read.parquet(out).agg(F.sum("o_custkey")).first()[0]
    assert a == b
