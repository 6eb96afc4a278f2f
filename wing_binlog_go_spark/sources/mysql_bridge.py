"""MySQL replication → changelog bridge (the real-binlog front end).

The reference registers as a replica and consumes the wire protocol
in-process (vendor/.../canal/sync.go:43-169, row decode
replication/row_event.go:365-509). This environment ships no binlog
client library, so the Spark engine reads an append-only JSONL
changelog (sources/changelog.py, CHANGE_SCHEMA) instead — and THIS
module is the missing front half: a sidecar that tails a
`pymysql-replication <https://github.com/julien-duponchelle/python-mysql-replication>`_
``BinLogStreamReader`` and appends its events to that changelog,
honoring the append-only contract (complete lines, fsync before
offset-visible growth).

Everything here is duck-typed over the pymysql-replication event
surface (class names + ``schema``/``table``/``rows``/``timestamp``
attributes), so the conversion and file protocol are fully tested
TODAY with fake events; the day the dependency is installable,
``connect_and_run`` works unchanged and the skipif-gated integration
test in tests/test_mysql_bridge.py starts running against a live
server.

Event mapping (same shapes the fixture writes — FIXTURES.md §3):

- WriteRowsEvent  → one ``insert`` record per row (``after``)
- DeleteRowsEvent → one ``delete`` record per row (``before``)
- UpdateRowsEvent → one ``update`` record per row pair
  (``before``/``after`` — the reference pairs even/odd rows,
  canal/rows.go:17-27; pymysql-replication pre-pairs them)
- QueryEvent (non-BEGIN) → one ``ddl`` record carrying the query
- GtidEvent → sets the GTID stamped on subsequent records (O2)
- XidEvent → marks the previous record ``xid_commit`` (transaction
  boundary, like the fixture's last-record-of-txn flag)
- RotateEvent → switches ``binlog_file``
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable, Iterator
from datetime import datetime, timezone

_SKIP_QUERIES = {"BEGIN", "COMMIT", "ROLLBACK"}


def _ts_header(unix_ts: float | None) -> str:
    if unix_ts is None:
        unix_ts = 0
    return datetime.fromtimestamp(unix_ts, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.000Z"
    )


def _vals(d: dict | None) -> dict[str, str] | None:
    """Column map → the changelog's string-valued map (typed decode is
    the engine's job — functions/schema_registry.py — not the wire's)."""
    if d is None:
        return None
    return {k: None if v is None else str(v) for k, v in d.items()}


def convert_stream(
    events: Iterable, start_file: str = "mysql-bin.000001"
) -> Iterator[dict]:
    """Replication events → CHANGE_SCHEMA record dicts, in order.

    Stateful over the stream: GTID and binlog file/pos ride on separate
    protocol events and are stamped onto the row records they precede;
    the Xid commit marker arrives AFTER a transaction's last row event,
    so records are emitted with a one-record lookahead and the flag is
    set on the buffered record when the Xid arrives.
    """
    binlog_file = start_file
    gtid: str | None = None
    pending: dict | None = None

    def flush():
        nonlocal pending
        if pending is not None:
            out, pending = pending, None
            yield out

    for ev in events:
        kind = type(ev).__name__
        pos = getattr(getattr(ev, "packet", None), "log_pos", None) or getattr(
            ev, "log_pos", 0
        )
        if kind == "RotateEvent":
            binlog_file = getattr(ev, "next_binlog", binlog_file)
            continue
        if kind == "GtidEvent":
            gtid = getattr(ev, "gtid", None)
            continue
        if kind == "XidEvent":
            if pending is not None:
                pending["xid_commit"] = True
            yield from flush()
            continue

        def base(action: str) -> dict:
            return {
                "binlog_file": binlog_file,
                "binlog_pos": int(pos or 0),
                "xid_commit": False,
                "database": getattr(ev, "schema", None),
                "table": getattr(ev, "table", None),
                "action": action,
                "row_no": 0,
                "before": None,
                "after": None,
                "ddl_query": None,
                "ts_header": _ts_header(getattr(ev, "timestamp", None)),
                "gtid": gtid,
            }

        if kind == "QueryEvent":
            query = getattr(ev, "query", "")
            if isinstance(query, bytes):
                query = query.decode("utf-8", "replace")
            if query.strip().upper() in _SKIP_QUERIES:
                continue
            yield from flush()
            rec = base("ddl")
            rec["ddl_query"] = query
            # DDL is its own implicit transaction in MySQL
            rec["xid_commit"] = True
            yield rec
        elif kind in ("WriteRowsEvent", "DeleteRowsEvent", "UpdateRowsEvent"):
            for row_no, row in enumerate(getattr(ev, "rows", [])):
                yield from flush()
                if kind == "WriteRowsEvent":
                    rec = base("insert")
                    rec["after"] = _vals(row.get("values"))
                elif kind == "DeleteRowsEvent":
                    rec = base("delete")
                    rec["before"] = _vals(row.get("values"))
                else:
                    rec = base("update")
                    rec["before"] = _vals(row.get("before_values"))
                    rec["after"] = _vals(row.get("after_values"))
                rec["row_no"] = row_no
                pending = rec
        # unknown event kinds (format description, heartbeat, ...) skip
    yield from flush()


class MySQLChangelogBridge:
    """Append CHANGE_SCHEMA records to a changelog directory under the
    append-only contract the Spark source plans against: whole lines
    only, fsync'd before the write returns, one growing file per
    bridge run (rotation = a new file, never truncation)."""

    def __init__(self, out_dir: str, file_name: str = "bridge-000001.jsonl"):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, file_name)

    def append(self, records: Iterable[dict]) -> int:
        n = 0
        with open(self.path, "a", encoding="utf-8") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
                n += 1
            f.flush()
            os.fsync(f.fileno())
        return n

    def run(self, events: Iterable, start_file: str = "mysql-bin.000001") -> int:
        return self.append(convert_stream(events, start_file=start_file))


def connect_and_run(
    out_dir: str,
    connection_settings: dict,
    server_id: int = 100,
    **stream_kwargs,
) -> int:
    """Tail a live server into ``out_dir`` (blocking). Requires
    pymysql-replication; raises ImportError with the remedy otherwise
    — the same fail-loudly posture as the ``mysql_host`` option on the
    binlog source."""
    try:
        from pymysqlreplication import BinLogStreamReader
    except ImportError as exc:  # pragma: no cover - env has no driver
        raise ImportError(
            "connect_and_run requires pymysql-replication "
            "(pip install pymysql-replication); in environments without "
            "it, front the engine with a changelog directory or Kafka"
        ) from exc
    stream = BinLogStreamReader(
        connection_settings=connection_settings,
        server_id=server_id,
        blocking=True,
        resume_stream=True,
        **stream_kwargs,
    )
    bridge = MySQLChangelogBridge(out_dir)
    try:
        return bridge.run(stream)
    finally:
        stream.close()
