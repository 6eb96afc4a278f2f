"""S5: arbitrary stateful streaming via ``applyInPandasWithState``.

The reference's only stateful operator is its process-wide event counter
(handler.go:139,168 atomic increment, restored from the pos file at boot
— O10). The engine's default replacement is the deterministic
coordinate-derived event_index (functions/envelope.py). This module is
the strict-continuity variant for consumers that demand a gapless
per-key sequence maintained as state: counts live in the state store
(RocksDB in production), survive restarts via the checkpoint, and key
partitioning distributes what the reference kept in one process.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_event_counts(stream: DataFrame, key_col: str = "full_table") -> DataFrame:
    """Per-key running event counter: emits (key, events_in_batch,
    running_total) each micro-batch; the total is stateful."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += n
        state.update((total,))
        yield pd.DataFrame(
            {"key": [key[0]], "events_in_batch": [n], "running_total": [total]}
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType="key string, events_in_batch long, running_total long",
            stateStructType="total long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_event_counts_tws(
    stream: DataFrame,
    key_col: str = "full_table",
    ttl_ms: int | None = None,
) -> DataFrame:
    """``running_event_counts`` on the transformWithState API (Spark 4):
    the successor to applyInPandasWithState — typed state variables
    (ValueState/ListState/MapState), per-state TTL, timers, and
    initial-state seeding. Kept alongside the classic form so both S5
    surfaces are exercised; semantics are identical when ``ttl_ms`` is
    None.

    ``ttl_ms`` evicts idle keys' state — the knob the classic API lacks
    entirely: at CDC scale the key space (db.table, or user ids in
    derived pipelines) grows without bound, and state for keys that
    stopped arriving would otherwise live in RocksDB forever.

    Requires the RocksDB state-store provider (transformWithState does
    not support the default HDFS-backed store); the session conf is set
    here — it only affects queries STARTED afterwards, never running
    ones or existing checkpoints (a checkpoint pins its provider).

    Environment note: the transformWithState state-server protocol
    needs ``google.protobuf``, which this sandbox does not ship — the
    import guard below fails loudly at build time instead of letting
    the query die mid-stream with a cryptic driver-worker crash. The
    e2e test (test_stateful.py) is skip-gated on the same import and
    runs the day the dependency exists.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(its state-server protocol is protobuf-framed); install "
            "protobuf or use running_event_counts (applyInPandasWithState)"
        ) from e
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    SparkSession.getActiveSession().conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class _Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "total long", ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            for pdf in rows:
                n += len(pdf)
            prev = self._total.get()
            total = (prev[0] if prev else 0) + n
            self._total.update((total,))
            yield pd.DataFrame(
                {"key": [key[0]], "events_in_batch": [n], "running_total": [total]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_Counter(),
        outputStructType="key string, events_in_batch long, running_total long",
        outputMode="Update",
        timeMode="None",
    )


def sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Custom sessionizer with explicit state (the hand-rolled analog of
    session_window, shown as the S5 extension point): state carries the
    open session's (start, last_seen, count); a row past the gap closes
    it and emits the finished session."""

    def _epoch(t: Any) -> int:
        # numeric values ARE epoch seconds (e.g. the envelope's `time`
        # field); pd.Timestamp would misread them as nanoseconds
        if isinstance(t, (int, float)):
            return int(t)
        return int(pd.Timestamp(t).timestamp())

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        times: list[int] = []
        for pdf in pdfs:
            times.extend(_epoch(t) for t in pdf[ts_col].tolist())
        times.sort()
        if state.exists:
            start, last, count = state.get
        else:
            start = last = None
            count = 0
        out = []
        for epoch in times:
            if last is not None and epoch - last > gap_seconds:
                out.append((key[0], start, last, count))
                start, count = epoch, 0
            if start is None:
                start = epoch
            last = epoch
            count += 1
        state.update((start, last, count))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "session_start", "session_end", "n_events"]
            )

    # output key column mirrors the input key column's type instead of
    # hardcoding long (string session keys are common)
    key_type = stream.schema[key_col].dataType.simpleString()
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=(
                f"key {key_type}, session_start long, session_end long, n_events long"
            ),
            stateStructType="start long, last long, count long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
