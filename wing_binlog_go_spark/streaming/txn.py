"""Transaction-atomic visibility gating for the change stream.

The reference pushes every row event the moment it decodes it and only
*checkpoints* at transaction boundaries (`canal/sync.go:64-68` saves
pos on XID) — consumers can observe half a transaction whenever they
look mid-flight. This gate holds each transaction's rows in state until
its commit marker arrives and releases them together, so every
downstream micro-batch is transaction-closed: an upsert materializer
fed through the gate never applies a partial transaction. An
improvement over the reference, possible because the binlog contains
only COMMITTED transactions — a held transaction's commit is always in
flight (file tailing or a batch boundary split it), never missing.

Mechanics: ``applyInPandasWithState`` keyed on the transaction id
(GTID). Rows accumulate in per-key state; a row with ``xid_commit``
(the XID event rides on the transaction's last row) or a DDL row
(QueryEvents imply their own commit in MySQL) releases the whole group.
Held rows survive restarts in the state store and release when the
commit arrives in a later batch — the fixture's file-split transaction
is exactly this case. Rows with a NULL gtid cannot be grouped and pass
through ungated (documented, not silent: they count in the released
output immediately).

Ordering: the gate's output interleaves transactions in state-iteration
order, which is fine — the envelope stage derives ``event_index`` from
(file, pos, row_no), so global order is re-established downstream
exactly as for any other batch.

State size: one transaction's rows must fit driver-of-state memory for
its key (MySQL transactions are bounded by max_binlog_cache_size on the
server side; a runaway multi-GB transaction should be split upstream).
"""

from __future__ import annotations

import json
import logging
from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from wing_binlog_go_spark.functions.envelope import CHANGE_SCHEMA

logger = logging.getLogger(__name__)

_COLS = [f.name for f in CHANGE_SCHEMA.fields]

#: how long a transaction may wait for its commit marker before the
#: gate gives up and releases it anyway (loudly). The "commit is always
#: in flight" premise holds for well-formed binlogs; a MALFORMED commit
#: row (e.g. a non-boolean xid_commit that parsed to NULL) would
#: otherwise strand its transaction in keyed state forever — never
#: delivered, never dead-lettered, state growing without bound.
DEFAULT_HOLD_TIMEOUT_MS = 10 * 60 * 1000


@contextmanager
def gate_drain_conf(spark):
    """Start availableNow drains of gated streams under this guard.

    The gate's ``ProcessingTimeTimeout`` makes the stateful operator
    report ``shouldRunAnotherBatch = true`` on every trigger, and with
    ``spark.sql.streaming.noDataMicroBatches.enabled`` (default true)
    an ``availableNow`` run then constructs empty micro-batches forever
    after the data is drained — the query NEVER terminates (measured:
    45 empty batches/min, identical released rows either way). Disabling
    no-data batches for the query restores availableNow's terminate-
    when-drained contract; processing-time timeouts then fire on the
    next DATA batch past the deadline, which is the gate's documented
    release path (the commit marker — or any later traffic — is always
    in flight). The streaming query clones the session conf at
    ``start()``, so restoring the conf afterwards does not affect the
    running query.
    """
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def txn_gate(
    changes: DataFrame, hold_timeout_ms: int = DEFAULT_HOLD_TIMEOUT_MS
) -> DataFrame:
    """CHANGE_SCHEMA stream → CHANGE_SCHEMA stream, transaction-closed.

    Emits a transaction's rows only in the batch where its commit
    marker (xid_commit / ddl) has been seen; earlier rows wait in
    keyed state, bounded by ``hold_timeout_ms`` (timed-out transactions
    release un-closed with a warning — visibly wrong beats silently
    absent plus unbounded state).
    """
    gated = changes.filter(F.col("gtid").isNotNull())
    passthrough = changes.filter(F.col("gtid").isNull())

    def release(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            rows = json.loads(state.get[0]) if state.exists else []
            state.remove()
            if rows:
                logger.warning(
                    "txn gate releasing %d rows of transaction %s WITHOUT "
                    "a commit marker (held past %.0f s — malformed or "
                    "lost XID row)",
                    len(rows), key[0], hold_timeout_ms / 1000.0,
                )
                out = pd.DataFrame(rows, columns=_COLS)
                out["ts_header"] = pd.to_datetime(out["ts_header"])
                yield out
            return
        rows: list[dict] = json.loads(state.get[0]) if state.exists else []
        commit_seen = False
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                # timestamps arrive as pandas Timestamps; keep them
                # serializable and reconstructible
                if rec.get("ts_header") is not None:
                    rec["ts_header"] = str(rec["ts_header"])
                rows.append(rec)
                # `is True`, not truthiness: a null boolean materializes
                # as float NaN in pandas records, and NaN is truthy — a
                # bare `rec.get("xid_commit")` would release the
                # transaction on a null marker.
                if rec.get("xid_commit") is True or rec.get("action") == "ddl":
                    commit_seen = True
        if commit_seen:
            state.remove()
            out = pd.DataFrame(rows, columns=_COLS)
            # rows round-trip through JSON state as strings; restore the
            # timestamp dtype uniformly before handing back to Spark
            out["ts_header"] = pd.to_datetime(out["ts_header"])
            yield out
        else:
            state.update((json.dumps(rows, default=str),))
            state.setTimeoutDuration(hold_timeout_ms)

    released = gated.groupBy("gtid").applyInPandasWithState(
        release,
        outputStructType=CHANGE_SCHEMA,
        stateStructType="pending string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    # align schemas (applyInPandasWithState re-derives column types from
    # the declared struct; the passthrough side already matches)
    return released.unionByName(passthrough.select(*_COLS))
