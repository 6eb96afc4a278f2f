"""End-to-end: the reference's headline use case — stream CDC changes
into a queryable typed replica — plus the partitioned event archive."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.schema_registry import (
    ColumnSpec,
    SchemaRegistry,
    TableSpec,
)
from wing_binlog_go_spark.sources.changelog import write_fixture_changelog
from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
from wing_binlog_go_spark.streaming.sinks import (
    partitioned_archive_writer,
    read_typed_replica,
    typed_replica_writer,
)
from tests.streamwait import await_done


def _registry() -> SchemaRegistry:
    reg = SchemaRegistry()
    reg.register(
        TableSpec(
            "fixtures",
            "cdc_typed_all",
            [
                ColumnSpec("id", "bigint(20)", is_pk=True),
                ColumnSpec("c_vchar", "varchar(255)"),
                ColumnSpec("c_int", "int(11)"),
                ColumnSpec("c_new", "varchar(16)"),
            ],
        )
    )
    return reg


def test_typed_replica_end_to_end(spark, tmp_path):
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=False)
    reg = _registry()
    base = str(tmp_path / "replica")
    q = run_pipeline(
        spark,
        str(log),
        [Route("replica", typed_replica_writer(reg, ["fixtures.cdc_typed_all"], base))],
        str(tmp_path / "ckpt"),
    )
    await_done(q)
    replica = read_typed_replica(spark, reg, "fixtures.cdc_typed_all", base)
    assert dict(replica.dtypes) == {
        "id": "bigint", "c_vchar": "string", "c_int": "int", "c_new": "string"
    }
    rows = {r.id: r for r in replica.collect()}
    assert rows[1].c_vchar == "row1v2" and rows[1].c_int == 11  # update applied
    assert 5 not in rows                                        # delete applied
    assert rows[100].c_new == "x"                               # post-DDL column typed
    # the replica is a normal queryable table
    replica.createOrReplaceTempView("replica")
    n = spark.sql("SELECT COUNT(*) c FROM replica WHERE c_int > 5").collect()[0].c
    assert n >= 2


def test_partitioned_archive_layout(spark, tmp_path):
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=False)
    out = str(tmp_path / "archive")
    q = run_pipeline(
        spark,
        str(log),
        [Route("archive", partitioned_archive_writer(out))],
        str(tmp_path / "ckpt"),
    )
    await_done(q)
    # hive-style partition dirs by database/table/event_date
    assert os.path.isdir(os.path.join(out, "database=fixtures"))
    sub = os.path.join(out, "database=fixtures", "table=cdc_typed_all")
    assert any(d.startswith("event_date=") for d in os.listdir(sub))
    # partition pruning: reading one table's partition sees only its rows
    arch = spark.read.parquet(out)
    one = arch.filter((F.col("database") == "fixtures") & (F.col("table") == "cdc_typed_all"))
    assert one.count() == 11  # fixture events on that table
    assert arch.count() > one.count()
