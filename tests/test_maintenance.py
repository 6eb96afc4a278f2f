"""Small-file compaction: many files → few, data identical."""

from __future__ import annotations

from wing_binlog_go_spark.streaming.maintenance import (
    compact_parquet,
    parquet_file_count,
)
from wing_binlog_go_spark.tables import read_table


def test_compaction_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    target = str(tmp_path / "frag")
    li = read_table(spark, sf_dir, "lineitem").limit(5000)
    # simulate a streaming sink's fragmentation: 40 appends
    for i in range(8):
        li.filter(f"l_orderkey % 8 = {i}").repartition(5).write.mode(
            "append"
        ).parquet(target)
    before_files = parquet_file_count(target)
    before = spark.read.parquet(target)
    before_cnt = before.count()
    before_sum = before.groupBy().sum("l_quantity").collect()[0][0]

    after_files = compact_parquet(spark, target, target_file_mb=128)
    assert after_files < before_files
    assert after_files <= 2
    after = spark.read.parquet(target)
    assert after.count() == before_cnt
    assert after.groupBy().sum("l_quantity").collect()[0][0] == before_sum
