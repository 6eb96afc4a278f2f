"""Pipeline throughput metrics — the engine-side analog of the
reference's events/sec counter (`src/library/client/tcp.go:436-443`
computes and logs received events/sec in the demo client; the reference
keeps no server-side metrics at all).

``PipelineMetrics`` is a ``StreamingQueryListener`` that appends one
JSON line per micro-batch (query id/name, batch id, input rows,
processing duration, rows/sec) to a local file — the same shape an ops
deployment would ship to its metrics store. Listener callbacks run on
the driver's listener bus: writing a line of JSON is safe; anything
heavier (RPC, Spark actions) is not and is deliberately absent.

``summarize`` folds the log into per-query totals for tests/reports.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class PipelineMetrics(StreamingQueryListener):
    """Append-only JSONL batch metrics recorder."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface ---------------------------------

    def onQueryStarted(self, event) -> None:
        self._write(
            {"kind": "start", "id": str(event.id), "name": event.name or ""}
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "kind": "batch",
                "id": str(p.id),
                "name": p.name or "",
                "batch_id": p.batchId,
                "input_rows": p.numInputRows,
                "batch_duration_ms": p.batchDuration,
                "rows_per_sec": round(p.processedRowsPerSecond or 0.0, 3),
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write(
            {
                "kind": "stop",
                "id": str(event.id),
                "exception": event.exception or None,
            }
        )

    def onQueryIdle(self, event) -> None:  # Spark 3.5+ callback
        pass

    # -- internals --------------------------------------------------------

    def _write(self, rec: dict) -> None:
        with self._lock, open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def summarize(path: str) -> dict[str, dict]:
    """Metrics log → {query_id: {batches, rows, total_ms, rows_per_sec}}."""
    out: dict[str, dict] = {}
    try:
        with open(path) as f:
            lines = [json.loads(ln) for ln in f if ln.strip()]
    except OSError:
        return out
    for rec in lines:
        if rec.get("kind") != "batch":
            continue
        s = out.setdefault(
            rec["id"], {"batches": 0, "rows": 0, "total_ms": 0}
        )
        s["batches"] += 1
        s["rows"] += rec["input_rows"]
        s["total_ms"] += rec["batch_duration_ms"]
    for s in out.values():
        secs = s["total_ms"] / 1000.0
        s["rows_per_sec"] = round(s["rows"] / secs, 3) if secs > 0 else 0.0
    return out
