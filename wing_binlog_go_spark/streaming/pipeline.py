"""Structured-Streaming CDC pipeline: change stream → envelopes → routed
multi-sink fan-out → upsert materialization.

Reference architecture being re-expressed (jilieryuyi/wing-binlog-go):

- fan-out multicast: every event to every registered service
  (handler.go:81-98) → ONE ``foreachBatch`` writing N routes, sharing the
  checkpointed source so all sinks see identical batches (O13).
- per-route regex filters (service/util.go:9-22, O12) → compiled
  ``rlike`` predicates per route.
- checkpoint/restart: pos cache + O_SYNC (handler.go:216-260, O11) →
  Structured Streaming offset/commit log; the event_index base is stored
  per batch_id so a replayed batch reproduces identical indexes instead
  of re-counting (the reference can duplicate indexes on crash replay —
  readme.md:54 adjacent caveat; we cannot).
- delivery: at-least-once with idempotent sinks keyed on event_index ⇒
  effectively-once (O19); the parquet upsert materializer (O25/S8)
  applies last-writer-wins by event_index. On a production lakehouse the
  materializer is a Delta/Iceberg MERGE; plain parquet keeps this
  self-contained and dependency-free.

Scale notes: envelope shaping is a map stage; the only shuffle per batch
is the event_index row_number (one global sort of the micro-batch — the
batch, not the table) and per-PK dedupe in the materializer. Routes add
filters, not shuffles.
"""

from __future__ import annotations

import fcntl
import json
import os
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wing_binlog_go_spark.functions.envelope import (
    match_filters,
    to_envelopes_counted,
)
from wing_binlog_go_spark.sources.changelog import stream_changelog


@dataclass
class Route:
    """A named sink with reference filter semantics (empty ⇒ match-all)."""

    name: str
    writer: Callable[[DataFrame, int], None]
    filters: list[str] = field(default_factory=list)


class IndexState:
    """event_index continuity across micro-batches and restarts.

    Maps batch_id → base index, JSON on disk next to the checkpoint
    (the engine's analog of the reference's pos cache, util.go:11-57).
    Replayed batch ⇒ same base ⇒ identical event_index values.
    """

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {"next": 0, "batches": {}}

    def base_for(self, batch_id: int, n_rows: int) -> int:
        state = self._load()
        key = str(batch_id)
        if key in state["batches"]:
            return state["batches"][key]
        base = state["next"]
        state["batches"][key] = base
        state["next"] = base + n_rows
        # only recent batches can replay — prune older entries so the
        # state file stays O(1) instead of growing with stream lifetime
        state["batches"] = {
            k: v for k, v in state["batches"].items() if int(k) >= batch_id - 10
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
            # fsync BEFORE the rename: os.replace is atomic against
            # process crash, but after power loss a renamed-but-unsynced
            # file can surface stale or empty — and a reverted "next"
            # would hand a later batch an already-used index range
            # (duplicate event_index = wrong LWW winners downstream).
            # This matches the durability of the reference's O_SYNC pos
            # write (util.go:11-57), not just its atomicity.
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)
        return base


def route_batch(env: DataFrame, routes: list[Route], batch_id: int) -> None:
    for r in routes:
        r.writer(env.filter(match_filters("full_table", r.filters)), batch_id)


def run_pipeline(
    spark: SparkSession,
    changelog_dir: str,
    routes: list[Route],
    checkpoint_dir: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    available_now: bool = True,
    source: str = "files",
    txn_atomic: bool = False,
    max_files_per_trigger: int = 10,
    dead_letter_dir: str | None = None,
):
    """Start the CDC pipeline; returns the StreamingQuery.

    include/exclude are the reference's table allow/deny regexes (O6),
    applied before envelope shaping — the cheap-early-filter the
    reference applies before row decode (canal.go:283-288).

    ``source`` selects the ingest path over the same CHANGE_SCHEMA:
    "files" = JSON file stream (default), "binlog" = the custom Python
    DataSource with (file, pos, row) offsets (sources.binlog).

    ``max_files_per_trigger`` bounds micro-batch size for the files
    source (the reference's bounded-queue backpressure analog, O18).
    Profiling at 100k-event batches puts ~0.3 s of per-batch fixed cost
    (job scheduling, range-boundary sampling, offset commit) against
    ~1.4 s of data-proportional work — larger batches amortize the
    fixed part, at the cost of per-event latency; tune to the
    latency/throughput point the deployment needs.

    ``dead_letter_dir`` captures malformed change records instead of
    letting them corrupt envelopes: rows missing their binlog
    coordinates or carrying an unknown action (including the all-NULL
    rows Spark's PERMISSIVE JSON mode produces for unparseable lines)
    are appended there as parquet tagged with the batch id, and only
    valid rows continue into shaping. The reference logs-and-drops bad
    input (handler.go error paths); a dead-letter table is the
    no-silent-caps version — every excluded record is queryable.
    Default None preserves pass-through behavior.

    ``txn_atomic`` inserts the transaction gate (streaming/txn.py):
    every batch the routes see is transaction-closed — no consumer ever
    observes half a transaction (exceeds the reference, which pushes
    per-event). The gate sits BEFORE the include/exclude filters: the
    commit marker rides on whatever table the transaction touched last,
    and filtering first could strand a multi-table transaction whose
    committing row belongs to an excluded table.
    """
    state = IndexState(os.path.join(checkpoint_dir, "event_index.json"))
    if source == "binlog":
        from wing_binlog_go_spark.sources.binlog import BinlogDataSource

        spark.dataSource.register(BinlogDataSource)
        changes = (
            spark.readStream.format("binlog").option("path", changelog_dir).load()
        )
    elif source == "files":
        changes = stream_changelog(spark, changelog_dir, max_files=max_files_per_trigger)
    else:
        raise ValueError(f"unknown source {source!r}; expected 'files' or 'binlog'")
    if txn_atomic:
        from wing_binlog_go_spark.streaming.txn import txn_gate

        changes = txn_gate(changes)
    if include or exclude:
        pre = F.concat_ws(".", "database", "table")
        changes = changes.filter(match_filters(pre, include or []))
        if exclude:
            changes = changes.filter(~match_filters(pre, exclude))

    _valid = (
        F.col("binlog_file").isNotNull()
        & F.col("binlog_pos").isNotNull()
        & F.col("action").isin("insert", "update", "delete", "ddl")
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # Single-pass shaping: the envelope's dense-index build already
        # materializes the batch once (range shuffle + localCheckpoint)
        # and collects per-partition counts, so the batch row count —
        # needed to reserve this batch's event_index range — falls out
        # of that same job via the callable base. No separate count()
        # job, no second parse of the source.
        #
        # persist() still matters: repartitionByRange runs a sampling
        # job over the input to pick range boundaries before the
        # shuffle job; the cache fills during sampling so the JSON
        # parse happens once, not twice.
        batch_df.persist()
        shaped = batch_df
        try:
            if dead_letter_dir is not None:
                bad = batch_df.filter(~F.coalesce(_valid, F.lit(False)))
                if not bad.isEmpty():
                    # per-batch partition dir, overwritten in place: a
                    # replayed batch rewrites the same records instead
                    # of appending duplicates (idempotent like every
                    # other sink here)
                    bad.write.mode("overwrite").parquet(
                        os.path.join(dead_letter_dir, f"batch_id={batch_id}")
                    )
                shaped = batch_df.filter(F.coalesce(_valid, F.lit(False)))
            # size the index build's range shuffle to the BATCH, not the
            # table default: a ~100k-event micro-batch sorted across 32
            # tiny tasks pays more in scheduling than sorting (measured:
            # the whole two-phase build 1209 → 681 ms at the bench's
            # 10-file batch). Input partition count tracks batch bytes
            # (maxPartitionBytes), so it is the right proxy; clamp to
            # the session default so a huge replay batch still spreads.
            _np = max(2, min(
                int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
                shaped.rdd.getNumPartitions(),
            ))
            env, n = to_envelopes_counted(
                shaped,
                index_base=lambda total: state.base_for(batch_id, total),
                num_partitions=_np,
            )
            if n == 0:
                return
            # env reads from the dense-index localCheckpoint — each
            # route's pass is a cheap projection, no persist needed.
            route_batch(env, routes, batch_id)
        finally:
            batch_df.unpersist()

    writer = (
        changes.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    if txn_atomic and available_now:
        # without this the gate's ProcessingTimeTimeout keeps the
        # availableNow run constructing empty micro-batches forever
        # (see gate_drain_conf) — the drain would never terminate
        from wing_binlog_go_spark.streaming.txn import gate_drain_conf

        with gate_drain_conf(spark):
            return writer.start()
    return writer.start()


# ---------------------------------------------------------------------------
# Upsert materializer (O25 PK extraction + S8 CDC materialization)
# ---------------------------------------------------------------------------


def _pk_key(img, pk_cols: list[str]):
    """Injective string key over PK components of a map image.

    Each component is tagged ``n`` (NULL) or ``v<len>:<value>`` — the
    null tag and the length prefix make the encoding injective, so
    ('1', NULL) vs ('1', '') cannot collide and a separator byte inside
    a value cannot re-align component boundaries.
    """
    parts = []
    for c in pk_cols:
        v = F.element_at(img, c)
        parts.append(
            F.when(v.isNull(), F.lit("n")).otherwise(
                F.concat(F.lit("v"), F.length(v).cast("string"), F.lit(":"), v)
            )
        )
    return F.concat_ws("\x1f", *parts)


def pk_str(*values) -> str:
    """Python-side mirror of ``_pk_key``'s encoding (tests/debugging)."""
    return "\x1f".join(
        "n" if v is None else f"v{len(str(v))}:{v}" for v in values
    )


def change_rows_per_pk(env: DataFrame, pk: str | list[str] = "id") -> DataFrame:
    """Every change event keyed by primary key: one row per
    insert/update/delete envelope → (_pk, row, is_delete, event_index).

    ``pk`` may be a single column or a composite key list (injective
    encoding via ``_pk_key``). A MySQL UPDATE may change the PK itself
    (canal delivers it as one before/after row pair, rows.go:17-27); for
    those events an extra tombstone is emitted under the OLD key at the
    same event_index, so the old logical row always sees a terminating
    event. This is the shared uncollapsed form: ``latest_image_per_pk``
    collapses it last-writer-wins for the replica;
    ``scd2_upsert_parquet`` keeps every version for the history table.
    """
    pk_cols = [pk] if isinstance(pk, str) else list(pk)
    img = (
        F.when(F.col("event_type") == "update", F.col("event.new_data"))
        .when(F.col("event_type") == "insert", F.col("event.data"))
        .otherwise(F.col("event.data"))  # delete: the removed row
    )
    key = _pk_key(img, pk_cols)
    changes = env.filter(F.col("event_type").isin("insert", "update", "delete"))
    rows = changes.select(
        key.alias("_pk"),
        img.alias("row"),
        (F.col("event_type") == "delete").alias("is_delete"),
        F.col("event_index"),
    )
    old_key = _pk_key(F.col("event.old_data"), pk_cols)
    pk_moves = (
        changes.filter(F.col("event_type") == "update")
        # a foreign feed may omit the before-image entirely; without it
        # there is no old key to tombstone (and the all-NULL key would
        # otherwise produce a phantom tombstone row)
        .filter(F.col("event.old_data").isNotNull())
        .filter(~old_key.eqNullSafe(key))
        .select(
            old_key.alias("_pk"),
            F.col("event.old_data").alias("row"),
            F.lit(True).alias("is_delete"),
            F.col("event_index"),
        )
    )
    return rows.unionByName(pk_moves)


def _collapse_lww(rows: DataFrame) -> DataFrame:
    """THE last-writer-wins rule: one (row, is_delete, event_index)
    winner per _pk by max event_index. Every LWW collapse in this
    module goes through here — the winner rule (and any future
    tie-break change) must never diverge between the batch collapse
    and the two table merges."""
    return (
        rows.groupBy("_pk")
        .agg(
            F.max_by(
                F.struct("row", "is_delete", "event_index"), "event_index"
            ).alias("w")
        )
        .select("_pk", "w.row", "w.is_delete", "w.event_index")
    )


def latest_image_per_pk(env: DataFrame, pk: str | list[str] = "id") -> DataFrame:
    """Newest row image (or tombstone) per primary key in the batch —
    ``change_rows_per_pk`` collapsed last-writer-wins by event_index."""
    return _collapse_lww(change_rows_per_pk(env, pk))


def upsert_parquet(
    env: DataFrame, target_dir: str, pk: str | list[str] = "id"
) -> None:
    """Apply a batch of envelopes to a parquet table, last-writer-wins by
    event_index; idempotent under replay (re-applying the same envelopes
    yields the same table). The commit is a staged write + atomic rename
    swap (swap_dir), so a crash never leaves a half-written or deleted
    table. Production: Delta ``MERGE INTO t USING u ON t.pk = u.pk WHEN
    MATCHED ... WHEN NOT MATCHED INSERT`` — same keys, same winner rule.
    """
    from wing_binlog_go_spark.streaming.maintenance import recover_swap, swap_dir

    spark = env.sparkSession
    recover_swap(target_dir)
    updates = latest_image_per_pk(env, pk)
    if os.path.exists(target_dir):
        # empty-batch short-circuit: a multi-table replica route calls
        # this once per registered table per micro-batch, and a table
        # with no events must not pay a full read-and-rewrite of its
        # accumulated replica (the scd2 writer's growth guard, applied
        # here too)
        if updates.isEmpty():
            return
        current = spark.read.parquet(target_dir)
        merged = _collapse_lww(
            current.select("_pk", "row", "is_delete", "event_index").unionByName(
                updates
            )
        )
    else:
        merged = updates
    result = merged.filter(~F.col("is_delete"))
    # stage the full new table (also avoids the plan clobbering its own
    # parquet input mid-scan), then swap directories atomically
    tmp = target_dir + "._staging"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    result.write.mode("overwrite").parquet(tmp)
    swap_dir(tmp, target_dir)


def scd2_upsert_parquet(
    env: DataFrame, target_dir: str, pk: str | list[str] = "id"
) -> None:
    """Apply a batch of envelopes to an SCD Type-2 dimension-history
    table: instead of last-writer-wins (``upsert_parquet``), EVERY
    change event opens a version row and closes its predecessor —
    the "slowly changing dimension" consumer of the CDC stream
    (the reference leaves this to downstream consumers,
    readme.md:40-43; ours materializes it).

    Stored schema: (_pk, row, is_delete, valid_from_index,
    valid_to_index, is_current) where the version ordinate is the
    deterministic dense ``event_index`` (replay-stable by the O10
    contract, so re-applied batches re-derive byte-identical
    versions). valid_to_index / is_current are recomputed from the
    merged open-form rows on every write: a version's end is simply
    the NEXT version's start under the same key, which makes the merge
    a union + (_pk, valid_from_index) dedupe — idempotent under
    at-least-once replay by construction. Delete events store a
    tombstone version (is_delete, row = the removed image) so the
    history records WHEN the key vanished; a tombstone tail is never
    is_current.

    Scale: the per-key window is keyed on _pk (real cardinality — each
    key's history is short, never a calendar or a global sort) and the
    commit is the same staged-write + atomic-rename swap as
    ``upsert_parquet``. At 100 TB the same bucketed-manifest treatment
    as ``upsert_parquet_bucketed`` applies (only buckets with affected
    keys rewrite); closed versions of untouched keys are immutable so
    a production layout would additionally tier them into append-only
    closed-history partitions.
    """
    from wing_binlog_go_spark.streaming.maintenance import recover_swap, swap_dir

    spark = env.sparkSession
    recover_swap(target_dir)
    fresh = change_rows_per_pk(env, pk).withColumnRenamed(
        "event_index", "valid_from_index"
    )
    exists = os.path.exists(target_dir)
    # An empty batch subset (a multi-table route where this table saw no
    # events) must not re-read and rewrite the whole accumulated history
    # — that cost grows unboundedly with history size for zero benefit.
    if exists and fresh.isEmpty():
        return
    if exists:
        current = spark.read.parquet(target_dir).select(
            "_pk", "row", "is_delete", "valid_from_index"
        )
        merged = current.unionByName(fresh)
    else:
        merged = fresh
    result = _scd2_versions(merged)
    tmp = target_dir + "._staging"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    result.write.mode("overwrite").parquet(tmp)
    swap_dir(tmp, target_dir)


def _scd2_versions(merged: DataFrame) -> DataFrame:
    """Open-form rows → closed SCD2 versions, shared by the full-table
    and bucketed writers.

    Replay dedupe: a re-delivered event re-derives the identical
    (_pk, valid_from_index) version, so the tie-break is a pure
    tie-keep.  Break ties on the CONTENT (sorted map entries +
    is_delete, a total order) rather than the constant
    valid_from_index, so if a feed ever violates the O10 contract and
    delivers two DIFFERENT images at one (pk, event_index), the stored
    version is still deterministic across replays instead of an
    arbitrary partition-order pick.  Version closing keys on _pk (real
    cardinality, short per-key history — never a global sort)."""
    open_form = (
        merged.withColumn(
            "_w",
            F.struct(
                F.array_sort(F.map_entries("row")).alias("entries"),
                F.col("is_delete").alias("is_delete"),
            ),
        )
        .groupBy("_pk", "valid_from_index")
        .agg(F.max("_w").alias("w"))
        .select(
            "_pk",
            "valid_from_index",
            F.map_from_entries("w.entries").alias("row"),
            F.col("w.is_delete").alias("is_delete"),
        )
    )
    w = Window.partitionBy("_pk").orderBy("valid_from_index")
    return (
        open_form.withColumn("valid_to_index", F.lead("valid_from_index").over(w))
        .withColumn(
            "is_current",
            F.col("valid_to_index").isNull() & ~F.col("is_delete"),
        )
        .withColumn("version_n", F.row_number().over(w))
    )


def _bucket_manifest_path(target_dir: str) -> str:
    return os.path.join(target_dir, "_commit_manifest.json")


@contextmanager
def _commit_lock(target_dir: str):
    """Exclusive advisory lock serializing the commit-critical section
    (manifest write → swaps → manifest removal) against concurrent
    ``recover_bucket_commit`` callers.

    Without it, a reader that sees the manifest DURING a live writer's
    phase 3 would re-run the same swaps: the writer's own swap then
    renames the just-committed bucket out to the backup and crashes on
    the now-missing staging dir. flock is per-host — matching the
    single-writer deployment (the reference is a singleton binlog reader
    too); multi-host shared storage needs Delta/Iceberg commit logs,
    as documented on ``upsert_parquet_bucketed``.
    """
    fd = os.open(
        os.path.join(target_dir, "._commit_lock"), os.O_CREAT | os.O_RDWR, 0o644
    )
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def recover_bucket_commit(target_dir: str) -> bool:
    """Roll an interrupted multi-bucket commit FORWARD.

    The commit protocol (``upsert_parquet_bucketed``) stages every
    changed bucket first, then atomically writes a manifest naming them,
    then swaps each bucket in. A manifest on disk therefore means all
    staging data is complete: recovery finishes the remaining swaps so
    the table converges to the all-new state — never a mix that stays.
    No manifest means the crash happened before the point of commit:
    stale staging dirs are discarded and the table is the all-old state.
    Returns True if a commit was rolled forward.

    Takes the commit lock, so a live writer's phase 3 and a reader's
    recovery never interleave; the manifest is re-checked under the
    lock (a blocked reader usually finds it already gone).
    """
    import shutil

    from wing_binlog_go_spark.streaming.maintenance import (
        backup_path,
        recover_swap,
        swap_dir,
    )

    manifest = _bucket_manifest_path(target_dir)
    if not os.path.exists(manifest):  # cheap pre-check without the lock
        return False
    with _commit_lock(target_dir):
        if not os.path.exists(manifest):  # writer finished while we waited
            return False
        with open(manifest) as f:
            buckets = json.load(f)["buckets"]
        for b in buckets:
            bdir = os.path.join(target_dir, f"bucket={b}")
            staged = os.path.join(target_dir, f".staging_bucket_{b}")
            if os.path.exists(staged):
                swap_dir(staged, bdir)  # not yet (or half) swapped: finish it
            else:
                recover_swap(bdir)  # crashed mid-rename inside swap_dir
                shutil.rmtree(backup_path(bdir), ignore_errors=True)
        os.remove(manifest)
    return True


def upsert_parquet_bucketed(
    env: DataFrame, target_dir: str, pk: str | list[str] = "id", num_buckets: int = 16
) -> None:
    """Bucket-pruned upsert: the MERGE cost model on plain parquet.

    The table is stored as hash(pk)-bucketed subdirectories
    (``bucket=N/``); a batch only reads and rewrites the buckets that
    contain changed keys, so per-batch IO is O(changed buckets), not
    O(table) — the same reason Delta MERGE + clustering touches few
    files. With uniform keys and B buckets, a batch touching k keys
    rewrites ≈ min(k, B)/B of the table.

    Multi-bucket commits are atomic-on-recovery: every staging dir is
    written BEFORE an atomically-renamed manifest names the swap set;
    a crash before the manifest leaves the all-old table, after it the
    next writer (or reader via ``recover_bucket_commit``) rolls the
    whole set forward. Delta/Iceberg commit logs give the same
    write-visibility point with real snapshot isolation at scale.

    Deterministic bucket fn (pmod(xxhash64(pk), B)) means replays hit
    the same buckets — idempotence is preserved per bucket.
    """
    import shutil

    from wing_binlog_go_spark.streaming.maintenance import recover_swap, swap_dir

    spark = env.sparkSession
    os.makedirs(target_dir, exist_ok=True)
    recover_bucket_commit(target_dir)
    _discard_stale_staging(target_dir)
    bucket = F.pmod(F.xxhash64(F.col("_pk")), F.lit(num_buckets)).cast("int")
    # persist: the distinct-buckets collect AND every per-bucket filter
    # read this; without it each pass recomputes the full aggregation
    updates = latest_image_per_pk(env, pk).withColumn("_bucket", bucket).persist()
    try:
        changed = [r._bucket for r in updates.select("_bucket").distinct().collect()]
        if not changed:  # empty batch: no staging, no manifest churn
            return
        # phase 1: stage every changed bucket (reads see the old table)
        for b in changed:
            bdir = os.path.join(target_dir, f"bucket={b}")
            recover_swap(bdir)
            u = updates.filter(F.col("_bucket") == b).drop("_bucket")
            if os.path.exists(bdir):
                current = spark.read.parquet(bdir)
                merged = _collapse_lww(
                    current.select(
                        "_pk", "row", "is_delete", "event_index"
                    ).unionByName(u)
                )
            else:
                merged = u
            result = merged.filter(~F.col("is_delete"))
            # dot-prefixed staging dir: invisible to hive partition discovery
            tmp = os.path.join(target_dir, f".staging_bucket_{b}")
            shutil.rmtree(tmp, ignore_errors=True)
            result.write.mode("overwrite").parquet(tmp)
        _commit_staged_buckets(target_dir, changed)
    finally:
        updates.unpersist()


def repair_buckets(
    spark: SparkSession,
    target_dir: str,
    snapshot_env: DataFrame,
    pk: str | list[str] = "id",
    buckets: "list[int] | None" = None,
    num_buckets: int = 16,
) -> None:
    """Rewrite diverged buckets of a bucketed replica WHOLESALE from a
    fresh source snapshot — the repair step after `operators.stats.
    checksum_diff` run with ``chunk = pmod(xxhash64(_pk), B)`` (chunk
    == bucket, so the diff's worklist is exactly ``buckets``).

    Unlike ``upsert_parquet_bucketed`` (which MERGES — a stale phantom
    row the snapshot no longer contains would survive a merge), each
    listed bucket's content is REPLACED by the snapshot's rows for that
    bucket; rows carry the snapshot's event_index, so later CDC events
    still win by the last-writer rule and replayed older events cannot
    resurrect. Untouched buckets are never read or written. Commit =
    the same staged-dirs + atomic manifest protocol (crash before the
    manifest leaves the all-old table; after it, roll-forward).
    """
    import shutil

    if not buckets:
        return
    os.makedirs(target_dir, exist_ok=True)
    recover_bucket_commit(target_dir)
    _discard_stale_staging(target_dir)
    bucket = F.pmod(F.xxhash64(F.col("_pk")), F.lit(num_buckets)).cast("int")
    fresh = (
        latest_image_per_pk(snapshot_env, pk)
        .withColumn("_bucket", bucket)
        .filter(F.col("_bucket").isin(list(buckets)))
        .persist()
    )
    try:
        for b in buckets:
            u = fresh.filter(F.col("_bucket") == b).drop("_bucket").filter(
                ~F.col("is_delete")
            )
            tmp = os.path.join(target_dir, f".staging_bucket_{b}")
            shutil.rmtree(tmp, ignore_errors=True)
            u.write.mode("overwrite").parquet(tmp)
        _commit_staged_buckets(target_dir, list(buckets))
    finally:
        fresh.unpersist()


def _discard_stale_staging(target_dir: str) -> None:
    """Writer-side cleanup of staging dirs orphaned by a crash BEFORE
    the point of commit (no manifest ⇒ the staged data is dead weight:
    each orphan is a complete bucket copy that would otherwise persist
    until some batch happens to touch that exact bucket). Called only
    from writers at the START of their own commit sequence — the
    single-writer contract means no live phase-1 staging can be
    deleted; reader-side recovery must NOT do this (it races a live
    writer's staging). Under the commit lock so a roll-forward's swaps
    never interleave."""
    import glob as _glob
    import shutil

    with _commit_lock(target_dir):
        if os.path.exists(_bucket_manifest_path(target_dir)):
            return  # committed: these dirs belong to a roll-forward
        for staged in _glob.glob(os.path.join(target_dir, ".staging_bucket_*")):
            shutil.rmtree(staged, ignore_errors=True)


def _commit_staged_buckets(target_dir: str, changed: list[int]) -> None:
    """Phases 2+3 of the multi-bucket commit, under the commit lock so
    a concurrent reader's recover_bucket_commit cannot replay our swaps
    mid-flight: the manifest lands atomically (the point of commit),
    then every staged bucket swaps in; any crash after the manifest is
    rolled forward."""
    from wing_binlog_go_spark.streaming.maintenance import swap_dir

    with _commit_lock(target_dir):
        manifest = _bucket_manifest_path(target_dir)
        with open(manifest + ".tmp", "w") as f:
            json.dump({"buckets": [int(b) for b in changed]}, f)
            # fsync before the rename: bucket renames below can reach
            # disk while an unsynced manifest does not — after power
            # loss recovery would then see "no manifest = crash before
            # commit" and leave a lasting old/new bucket mix, exactly
            # what this protocol exists to prevent
            f.flush()
            os.fsync(f.fileno())
        os.replace(manifest + ".tmp", manifest)
        for b in changed:
            swap_dir(
                os.path.join(target_dir, f".staging_bucket_{b}"),
                os.path.join(target_dir, f"bucket={b}"),
            )
        os.remove(manifest)


def scd2_vacuum(
    spark: SparkSession, target_dir: str, retain_from_index: int
) -> dict:
    """Retention for the ever-growing SCD2 history (the ADVICE-r5
    growth concern's other half): drop versions CLOSED before
    ``retain_from_index``. A version survives iff it is current, still
    open, or its ``valid_to_index`` >= the horizon — so point-in-time
    queries at or after the horizon are unaffected, and each key's
    remaining chain stays contiguous (vacuum removes only a PREFIX of
    the chain; every surviving version's successor survives with it,
    which keeps the writers' per-key valid_to/is_current recomputation
    correct on later batches — test-asserted by upserting after a
    vacuum).

    Works on both layouts: flat (staged-write + atomic-rename swap) and
    bucketed (per-bucket staging + the manifest commit, only buckets
    actually holding expired versions rewrite). Returns
    {"kept": n, "dropped": n}.
    """
    import glob as _glob
    import shutil

    from wing_binlog_go_spark.streaming.maintenance import recover_swap, swap_dir

    keep = (
        F.col("is_current")
        | F.col("valid_to_index").isNull()
        | (F.col("valid_to_index") >= retain_from_index)
    )
    if _glob.glob(os.path.join(target_dir, "bucket=*")):
        recover_bucket_commit(target_dir)
        _discard_stale_staging(target_dir)
        kept = dropped = 0
        changed = []
        for bdir in sorted(_glob.glob(os.path.join(target_dir, "bucket=*"))):
            b = int(bdir.rsplit("=", 1)[1])
            recover_swap(bdir)
            cur = spark.read.parquet(bdir)
            n_all = cur.count()
            survivors = cur.filter(keep).localCheckpoint(eager=True)
            n_keep = survivors.count()
            kept += n_keep
            dropped += n_all - n_keep
            if n_keep == n_all:
                continue  # nothing expired in this bucket — never rewrite
            tmp = os.path.join(target_dir, f".staging_bucket_{b}")
            shutil.rmtree(tmp, ignore_errors=True)
            survivors.write.mode("overwrite").parquet(tmp)
            changed.append(b)
        if changed:
            _commit_staged_buckets(target_dir, changed)
        return {"kept": kept, "dropped": dropped}

    recover_swap(target_dir)
    cur = spark.read.parquet(target_dir)
    n_all = cur.count()
    survivors = cur.filter(keep).localCheckpoint(eager=True)
    n_keep = survivors.count()
    if n_keep != n_all:
        tmp = target_dir + "._staging"
        shutil.rmtree(tmp, ignore_errors=True)
        survivors.write.mode("overwrite").parquet(tmp)
        swap_dir(tmp, target_dir)
    return {"kept": n_keep, "dropped": n_all - n_keep}


def scd2_upsert_parquet_bucketed(
    env: DataFrame, target_dir: str, pk: str | list[str] = "id", num_buckets: int = 16
) -> None:
    """Bucket-pruned SCD Type-2 history writer: the scale form of
    ``scd2_upsert_parquet`` (ADVICE r5) — history is stored as
    hash(pk)-bucketed subdirectories and a batch only re-reads and
    rewrites the buckets whose keys actually changed, so per-batch IO
    is O(changed buckets' history), not O(total history). Closed
    versions of untouched keys sit in untouched buckets and are never
    rewritten.

    Version recomputation is safe per-bucket because every key's whole
    history lives in exactly one bucket (deterministic
    pmod(xxhash64(_pk), B)), so the per-key windows in
    ``_scd2_versions`` see complete histories. Same empty-batch
    short-circuit, content tie-break, and manifest commit protocol
    (stage → manifest → swap, rolled forward on crash) as the replica's
    ``upsert_parquet_bucketed``; read back with ``read_bucketed_table``.
    """
    import shutil

    from wing_binlog_go_spark.streaming.maintenance import recover_swap

    spark = env.sparkSession
    os.makedirs(target_dir, exist_ok=True)
    recover_bucket_commit(target_dir)
    _discard_stale_staging(target_dir)
    bucket = F.pmod(F.xxhash64(F.col("_pk")), F.lit(num_buckets)).cast("int")
    fresh = (
        change_rows_per_pk(env, pk)
        .withColumnRenamed("event_index", "valid_from_index")
        .withColumn("_bucket", bucket)
        .persist()
    )
    try:
        changed = [r._bucket for r in fresh.select("_bucket").distinct().collect()]
        if not changed:  # nothing for this table in the batch
            return
        for b in changed:
            bdir = os.path.join(target_dir, f"bucket={b}")
            recover_swap(bdir)
            u = fresh.filter(F.col("_bucket") == b).drop("_bucket")
            if os.path.exists(bdir):
                current = spark.read.parquet(bdir).select(
                    "_pk", "row", "is_delete", "valid_from_index"
                )
                merged = current.unionByName(u)
            else:
                merged = u
            result = _scd2_versions(merged)
            tmp = os.path.join(target_dir, f".staging_bucket_{b}")
            shutil.rmtree(tmp, ignore_errors=True)
            result.write.mode("overwrite").parquet(tmp)
        _commit_staged_buckets(target_dir, changed)
    finally:
        fresh.unpersist()


def read_bucketed_table(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read a bucketed upsert table; hive-style partition discovery turns
    bucket=N dirs into a prunable `bucket` column. A manifest left by an
    interrupted commit is rolled forward first, so readers never observe
    a lasting mix of old and new buckets; a bucket dir lost mid-swap
    (only its hidden backup on disk — invisible to partition discovery)
    is restored so its rows cannot silently vanish from the read."""
    from wing_binlog_go_spark.streaming.maintenance import recover_bucket_swaps

    recover_bucket_commit(target_dir)
    recover_bucket_swaps(target_dir)
    return spark.read.parquet(target_dir).drop("bucket")


def upsert_delta(
    env: DataFrame, target_path: str, pk: str | list[str] = "id"
) -> None:
    """The production form of ``upsert_parquet``: Delta ``MERGE INTO``
    on the same injective key and last-writer-wins rule — per-batch IO
    is O(touched files) via Delta's file-level pruning instead of the
    plain-parquet full rewrite, and concurrent readers get snapshot
    isolation from the commit log instead of the rename-swap protocol.

    Import-gated: delta-spark is not in this environment, so the writer
    raises loudly at call time (same pattern as the MySQL and protobuf
    hooks); ``tests/test_streaming.py`` skip-gates the e2e on the same
    probe and activates the day the dependency appears. The session
    must be built with the Delta SQL extension + catalog configs.

    Semantics parity with ``upsert_parquet`` (both reduce the batch with
    ``latest_image_per_pk`` first, so PK-moving updates tombstone the
    old key and replay is idempotent):

    - matched + newer event_index + tombstone → DELETE
    - matched + newer event_index → UPDATE row image
    - not matched + not tombstone → INSERT
    """
    try:
        from delta.tables import DeltaTable
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "upsert_delta requires the delta-spark package; use "
            "upsert_parquet (same semantics, staged-swap commit) instead"
        ) from e

    spark = env.sparkSession
    updates = latest_image_per_pk(env, pk)
    if not DeltaTable.isDeltaTable(spark, target_path):
        updates.filter(~F.col("is_delete")).write.format("delta").mode(
            "overwrite"
        ).save(target_path)
        return
    tgt = DeltaTable.forPath(spark, target_path)
    (
        tgt.alias("t")
        .merge(updates.alias("u"), "t._pk = u._pk")
        .whenMatchedDelete("u.is_delete AND u.event_index >= t.event_index")
        .whenMatchedUpdateAll("NOT u.is_delete AND u.event_index >= t.event_index")
        .whenNotMatchedInsertAll("NOT u.is_delete")
        .execute()
    )
