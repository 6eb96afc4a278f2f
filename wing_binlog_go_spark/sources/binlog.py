"""Custom "binlog" streaming source via the Python Data Source API
(Spark 4, public pyspark.sql.datasource).

Reference parity: the reference registers as a MySQL replica and streams
row events from a saved (file, pos) checkpoint
(vendor/.../canal/canal.go:174-178, sync loop canal/sync.go:43-169,
restore+clamp src/library/binlog/handler.go:32-55). Here the same
contract — resumable offsets over an ordered change stream, emitting
CHANGE_SCHEMA rows — is implemented as a DataSource whose backing is:

- a changelog directory of JSONL files (always available; what tests and
  local runs use), ordered by (binlog_file, binlog_pos, row_no);
- a real MySQL replication feed IF a `pymysql`-replication stack is
  importable (not shipped in this environment) — the hook raises a clear
  error instead of silently degrading.

Offsets are ``{"file": ..., "pos": ..., "row": ...}`` — the engine's
analog of the reference's pos cache record (util.go:11-57). Replay from
an old offset re-emits rows (at-least-once, O19); downstream dedupe on
event_index makes it effectively-once.

Usage::

    spark.dataSource.register(BinlogDataSource)
    df = (spark.readStream.format("binlog")
          .option("path", "/path/to/changelog").load())
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)

from wing_binlog_go_spark.functions.envelope import CHANGE_SCHEMA

_ZERO = {"file": "", "pos": -1, "row": -1}


def _load_records(path: str) -> list[tuple]:
    """All change records under ``path``, totally ordered by binlog coords."""
    rows: list[dict] = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".jsonl"):
            continue
        with open(os.path.join(path, fname)) as f:
            for line in f:
                if line.strip():
                    rows.append(json.loads(line))
    rows.sort(key=lambda r: (r["binlog_file"], r["binlog_pos"], r.get("row_no") or 0))
    return [_to_tuple(r) for r in rows]


def _to_tuple(r: dict) -> tuple:
    ts = r.get("ts_header")
    if isinstance(ts, str):
        ts = datetime.fromisoformat(ts.replace("Z", "+00:00")).replace(tzinfo=None)
    return (
        r["binlog_file"],
        r["binlog_pos"],
        bool(r.get("xid_commit")),
        r["database"],
        r["table"],
        r["action"],
        r.get("row_no") or 0,
        r.get("before"),
        r.get("after"),
        r.get("ddl_query"),
        ts,
    )


def _coord(t: tuple) -> dict:
    return {"file": t[0], "pos": t[1], "row": t[6]}


def _after(t: tuple, off: dict) -> bool:
    return (t[0], t[1], t[6]) > (off["file"], off["pos"], off["row"])


class BinlogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binlog source requires option 'path'")
        if options.get("mysql_host"):
            # Real replication feed would need a binlog client library
            # (e.g. pymysql-replication), which this environment does not
            # ship. Fail loudly rather than pretend.
            raise NotImplementedError(
                "direct MySQL replication requires a binlog client library; "
                "front the stream with a changelog directory or Kafka instead"
            )

    def initialOffset(self) -> dict:
        # Clamp semantics (handler.go:32-55): start from the beginning of
        # whatever the changelog currently holds.
        return dict(_ZERO)

    def read(self, start: dict):
        records = _load_records(self.path)
        fresh = [t for t in records if _after(t, start)]
        end = _coord(fresh[-1]) if fresh else dict(start)
        return iter(fresh), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # Deterministic replay window for recovery (at-least-once, O19).
        records = _load_records(self.path)
        return iter(
            [t for t in records if _after(t, start) and not _after(t, end)]
        )


class BinlogBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binlog source requires option 'path'")

    def read(self, partition):
        yield from _load_records(self.path)


class BinlogDataSource(DataSource):
    """spark.read/readStream.format("binlog").option("path", dir)."""

    @classmethod
    def name(cls) -> str:
        return "binlog"

    def schema(self):
        return CHANGE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return BinlogBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return BinlogStreamReader(self.options)
