"""Control plane (O23): stop / reload / status for running pipelines.

Reference parity: a framed-TCP admin protocol with stop, reload(service),
and show-members commands (src/library/control/control.go:10-77, command
wiring src/wing-binlog-go/main.go:168-197; per-service hot reload e.g.
src/services/subscribe/tcp.go:211-228). Spark already has the management
substrate — ``spark.streams`` — so the control plane is a thin, honest
wrapper: stop by name, reload = stop + re-read config + restart, members
= active query descriptions (the Spark UI/REST covers the rest).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


@dataclass
class QueryStatus:
    id: str
    name: str | None
    is_active: bool
    last_progress: dict | None


class ControlPlane:
    """stop / reload / members over the session's streaming queries."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._starters: dict[str, Callable[[], StreamingQuery]] = {}
        self._running: dict[str, StreamingQuery] = {}

    def register(self, name: str, starter: Callable[[], StreamingQuery]) -> None:
        """starter re-reads its config on every call — that's what makes
        reload a true hot-reload (the reference re-parses service config
        on CMD_RELOAD)."""
        self._starters[name] = starter

    def start(self, name: str) -> StreamingQuery:
        q = self._starters[name]()
        self._running[name] = q
        return q

    def stop(self, name: str, timeout_sec: int = 60) -> None:
        q = self._running.get(name)
        if q is not None and q.isActive:
            q.stop()
            q.awaitTermination(timeout_sec)
        self._running.pop(name, None)

    def stop_all(self) -> None:
        for name in list(self._running):
            self.stop(name)

    def reload(self, name: str) -> StreamingQuery:
        """CMD_RELOAD semantics: quiesce, re-read config, restart. The
        checkpoint carries offsets across the bounce, so no events are
        lost or duplicated downstream of idempotent sinks.

        Caveat: Spark's memory sink does not support checkpoint recovery
        — reloadable queries must use a recoverable sink (foreachBatch,
        parquet, kafka, ...), which every production route here does.
        """
        self.stop(name)
        return self.start(name)

    def members(self) -> list[QueryStatus]:
        """CMD_SHOW_MEMBERS: one row per active query."""
        return [
            QueryStatus(
                id=str(q.id),
                name=q.name,
                is_active=q.isActive,
                last_progress=q.lastProgress,
            )
            for q in self.spark.streams.active
        ]
