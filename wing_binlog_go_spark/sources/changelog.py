"""Changelog source: batch/stream readers over JSONL change records, plus
the deterministic CDC test fixture (FIXTURES.md §3).

This is the engine's MySQL-free stand-in for the binlog: everything
upstream of the wire protocol (envelope shaping, routing, sinks,
checkpointing) is exercised against files with the exact record shape a
binlog reader emits (CHANGE_SCHEMA). The real-MySQL path plugs in behind
the same schema (sources.binlog).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from wing_binlog_go_spark.functions.envelope import CHANGE_SCHEMA


def read_changelog(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CHANGE_SCHEMA).json(path)


def stream_changelog(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    """File-fed change stream; maxFilesPerTrigger bounds batch size (the
    reference's bounded-queue backpressure analog, O18)."""
    return (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .json(path)
    )


def _ts(s: str) -> str:
    return (
        datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%S.000Z")
    )


def fixture_records() -> list[dict]:
    """The FIXTURES §3 scripted sequence:

    1. multi-row INSERT (3 rows, one statement) → 3 envelopes
    2. UPDATE touching 2 rows → old/new pairs
    3. DELETE 1 row
    4. ALTER TABLE then INSERT using the new column (schema evolution)
    5. changes on a second table for include/exclude + route filters
    6. a transaction split across files (restart/replay window)
    """
    f1, f2 = "mysql-bin.000003", "mysql-bin.000004"
    # All events of one transaction share its GTID (O2); the counter
    # advances past each xid commit, like the server's sequence number.
    server_uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    txn = {"no": 1}
    recs: list[dict] = []

    def rec(file, pos, db, table, action, row_no=0, before=None, after=None,
            ddl=None, xid=False, ts="2018-04-19 05:21:27"):
        recs.append(
            {
                "binlog_file": file,
                "binlog_pos": pos,
                "xid_commit": xid,
                "database": db,
                "table": table,
                "action": action,
                "row_no": row_no,
                "before": before,
                "after": after,
                "ddl_query": ddl,
                "ts_header": _ts(ts),
                "gtid": f"{server_uuid}:{txn['no']}",
            }
        )
        if xid or action == "ddl":
            txn["no"] += 1  # DDL is its own transaction (own GTID) in MySQL

    # 1. multi-row insert: one statement, 3 rows (handler.go:167-182)
    for i in range(3):
        rec(f1, 1000, "fixtures", "cdc_typed_all", "insert", row_no=i,
            after={"id": str(i + 1), "c_vchar": f"row{i + 1}", "c_int": str(10 * (i + 1))})
    rec(f1, 1100, "fixtures", "cdc_typed_all", "insert", xid=True,
        after={"id": "99", "c_vchar": "committed", "c_int": "0"})
    # 2. update 2 rows → before/after pairs (canal/rows.go:17-27)
    for i in range(2):
        rec(f1, 1200, "fixtures", "cdc_typed_all", "update", row_no=i,
            before={"id": str(i + 1), "c_vchar": f"row{i + 1}", "c_int": str(10 * (i + 1))},
            after={"id": str(i + 1), "c_vchar": f"row{i + 1}v2", "c_int": str(10 * (i + 1) + 1)})
    # 3. delete 1 row (examples/subscribe.php:52-65 shape)
    rec(f1, 1300, "fixtures", "cdc_typed_all", "delete",
        before={"id": "5", "c_vchar": "gone"}, xid=True)
    # 4. DDL + insert with new column (O8 schema evolution)
    rec(f1, 1400, "fixtures", "cdc_typed_all", "ddl",
        ddl="ALTER TABLE cdc_typed_all ADD COLUMN c_new varchar(16)")
    rec(f1, 1500, "fixtures", "cdc_typed_all", "insert",
        after={"id": "100", "c_vchar": "post-ddl", "c_int": "7", "c_new": "x"}, xid=True)
    # 5. second table for filter routing (O6/O12)
    rec(f1, 1600, "fixtures", "other_table", "insert", after={"k": "1"}, xid=True)
    rec(f1, 1700, "ignored_db", "noise", "insert", after={"k": "2"}, xid=True)
    # 6. txn split across binlog files (replay window, O11/O19)
    rec(f1, 1800, "fixtures", "cdc_typed_all", "insert",
        after={"id": "200", "c_vchar": "split-a", "c_int": "1"})
    rec(f2, 4, "fixtures", "cdc_typed_all", "insert",
        after={"id": "201", "c_vchar": "split-b", "c_int": "2"}, xid=True,
        ts="2018-04-19 05:22:27")
    return recs


def write_fixture_changelog(path: str, split_files: bool = True) -> None:
    """Write the fixture as JSONL; split_files puts each binlog file's
    records in its own JSONL so streaming triggers see ordered batches."""
    os.makedirs(path, exist_ok=True)
    recs = fixture_records()
    if split_files:
        groups: dict[str, list[dict]] = {}
        for r in recs:
            groups.setdefault(r["binlog_file"], []).append(r)
        for name, rows in groups.items():
            with open(os.path.join(path, f"{name}.jsonl"), "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")
    else:
        with open(os.path.join(path, "changelog.jsonl"), "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
