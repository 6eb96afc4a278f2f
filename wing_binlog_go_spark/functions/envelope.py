"""CDC event-envelope shaping + MySQL value-decode rules, as column
expressions.

Reference semantics being reproduced (jilieryuyi/wing-binlog-go):

- Envelope shape {database, table, event_type, time, event_index,
  event:{data | old_data+new_data}} — src/library/binlog/handler.go:113-184,
  payload examples examples/subscribe.php:40-100.
- insert/delete carry the full row in ``event.data``; update carries the
  before/after pair in ``event.data.old_data`` / ``new_data``
  (handler.go:137-181); DDL emits an ``alter`` envelope with no ``event``
  (handler.go:101-110).
- ``event_index``: monotonic per-event counter (handler.go:139,168). The
  reference uses a process-wide atomic restored from its pos file — an
  anti-pattern on a distributed engine, so we derive a deterministic
  equivalent: dense order over (binlog_file, binlog_pos, row_no). Replays
  produce identical indexes (the reference can duplicate indexes on crash
  replay; ours cannot).
- ``time``: the reference stamps wall-clock at processing (handler.go:133);
  we stamp the binlog header time for determinism — documented divergence.
- Field decode rules — src/library/binlog/util.go:61-146: unsigned
  widening (+256/+65536/+2^24/+2^32, uint64 wrap), ENUM ordinal→label,
  SET bitmask→CSV labels; zero-date → NULL mirrors the go-mysql decoder
  (vendor/.../replication/row_event.go:456-463).

Everything is a plain Column expression usable identically on batch and
streaming DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# Raw change record (what a binlog-shaped source emits before shaping) —
# FIXTURES.md §3; field provenance: position vendor/.../mysql/position.go:8-11,
# action constants vendor/.../canal/rows.go:11-15, update before/after pairing
# vendor/.../canal/rows.go:17-27.
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("binlog_file", T.StringType()),
        T.StructField("binlog_pos", T.LongType()),
        T.StructField("xid_commit", T.BooleanType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("action", T.StringType()),  # insert|update|delete|ddl
        T.StructField("row_no", T.IntegerType()),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ddl_query", T.StringType()),
        T.StructField("ts_header", T.TimestampType()),
        # GTID of the enclosing transaction ("uuid:txno"), when the
        # upstream runs with gtid_mode=ON (O2, canal.go:180-184). NULL
        # for coordinate-only streams.
        T.StructField("gtid", T.StringType()),
    ]
)

# Envelope schema (SURVEY §1.1). `time` is unix seconds (long) to match the
# reference's JSON payload exactly (examples/subscribe.php: "time":1524115287).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("time", T.LongType()),
        T.StructField("event_index", T.LongType()),
        T.StructField(
            "event",
            T.StructType(
                [
                    T.StructField("data", T.MapType(T.StringType(), T.StringType())),
                    T.StructField("old_data", T.MapType(T.StringType(), T.StringType())),
                    T.StructField("new_data", T.MapType(T.StringType(), T.StringType())),
                ]
            ),
        ),
    ]
)


def event_type_col(action=None) -> Column:
    """canal action → envelope event_type (rows.go:11-15, handler.go:104)."""
    if action is None:
        action = F.col("action")
    return F.when(action == "ddl", F.lit("alter")).otherwise(action)


# Sentinel for NULL partition-key values in the driver-side offset map.
# A real value equal to this would collide; \x00 can't appear in the
# corpus columns this is used with (shard/lang keys).
_NULL_KEY = "\x00null\x00"
_KEY_SEP = "\x1f"


def with_running_total(
    df: DataFrame,
    order_cols: list,
    value_col: Column,
    out: str = "_running",
    base: int = 0,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """See ``_with_running_total``; this keeps the historical signature
    (DataFrame in, DataFrame out) for the many batch-query callers."""
    result, _total = _with_running_total(
        df, order_cols, value_col, out=out, base=base, partition_cols=partition_cols
    )
    return result


def _with_running_total(
    df: DataFrame,
    order_cols: list,
    value_col: Column,
    out: str = "_running",
    base: "int | Callable[[int], int]" = 0,
    partition_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> "tuple[DataFrame, int]":
    """Inclusive running SUM(value) in ``order_cols`` order — WITHOUT a
    single-partition global sort.

    The two-phase zipWithIndex pattern generalized to any additive
    value: range-repartition on the order (each partition holds a
    contiguous key range; partition ids increase along the sort), cumsum
    within partitions, then add each partition's prefix offset from a
    tiny driver-side sum map (O(#partitions) scalars). Range boundaries
    may vary run-to-run, but the result depends only on the total order,
    which is unique when ``order_cols`` are.

    ``partition_cols`` restarts the total at every distinct key (the
    per-shard form): the range partitioning is prefixed with the key, so
    one shard spans a contiguous run of partitions and parallelizes
    across MANY tasks even when the key has few distinct values — the
    scale-safe replacement for ``Window.partitionBy(shard)`` over a
    low-cardinality shard column, which would serialize each shard onto
    a single task. The driver-side map grows to O(#partitions +
    #distinct keys) entries, so keys must be low-cardinality (languages,
    sources, buckets) — for high-cardinality keys use a plain Window,
    which is already parallel there.

    ``with_dense_index`` (the event_index builder) is this with value=1.

    Returns ``(result, total)`` where ``total`` is the grand total of
    ``value_col`` over the whole frame — a free by-product of the
    per-partition sums collect, so callers that also need a COUNT/SUM
    (the CDC pipeline needs the batch row count to reserve its
    event_index range) get it without a second job over the input.

    ``base`` may be a callable ``total -> base``: it is invoked once,
    after the partition sums are collected (so the input has already
    been materialized exactly once), letting the caller derive the base
    FROM the total — the single-pass form of "count, then index from a
    checkpoint-reserved offset". A callable base requires
    ``partition_cols`` to be empty (per-key totals would need per-key
    bases, which no caller wants).

    ``num_partitions`` sizes the range shuffle explicitly. The default
    (spark.sql.shuffle.partitions) is right for table-sized inputs, but
    a CDC micro-batch of ~100k rows sorted across 32 tiny tasks pays
    more in task scheduling than in sorting — measured 1209 → 681 ms
    for the whole two-phase build at 8 partitions on the 100k bench
    batch. The streaming pipeline passes its batch's input partition
    count (a bytes-tracking proxy via maxPartitionBytes); batch-query
    callers keep the default.
    """
    pcols = list(partition_cols or [])
    if callable(base) and pcols:
        raise ValueError("callable base is only supported without partition_cols")
    _np = [int(num_partitions)] if num_partitions else []
    ranged = (
        df.withColumn("_val", value_col)
        .repartitionByRange(*_np, *pcols, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid", *pcols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # materialize once: the sums collect below and the caller's action
    # are separate jobs — without this the range shuffle+sort runs twice
    # AND result stability would rest on both jobs choosing identical
    # range boundaries
    summed = ranged.withColumn("_cum", F.sum("_val").over(w)).localCheckpoint(
        eager=True
    )
    # group on the SPARK string form of each key column (not the raw
    # value): the driver-side map below is probed with key_expr's
    # cast("string"), and Python's str() disagrees with Spark's cast for
    # e.g. booleans ("True" vs "true") — raw-value grouping would build
    # keys element_at can never find, silently NULLing the whole output
    _kcols = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_KEY)).alias(f"_k{i}")
        for i, c in enumerate(pcols)
    ]
    sums = summed.groupBy("_pid", *_kcols).agg(F.sum("_val").alias("s")).collect()
    if not sums:
        return df.withColumn(out, F.lit(None).cast("long")), 0
    total = sum(r.s or 0 for r in sums)
    if not pcols:
        acc = base(total) if callable(base) else base
        offsets: dict[int, int] = {}
        for r in sorted(sums, key=lambda r: r._pid):
            offsets[r._pid] = acc
            acc += r.s or 0
        mapping = F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        )
        return (
            summed.withColumn(
                out,
                (F.element_at(mapping, F.col("_pid")) + F.col("_cum")).cast("long"),
            ).drop("_pid", "_val", "_cum"),
            total,
        )

    # Per-key prefix offsets: accumulate along pid order WITHIN each key
    # (a key's rows are contiguous across pids under the prefixed range
    # partitioning, but the offset must reset at every key boundary).
    groups: dict[tuple, list[tuple[int, int]]] = {}
    for r in sums:
        key = tuple(r[f"_k{i}"] for i in range(len(pcols)))
        groups.setdefault(key, []).append((r._pid, r.s or 0))
    key_offsets: dict[str, int] = {}
    for key, parts in groups.items():
        acc = base
        for pid, s in sorted(parts):
            key_offsets[_KEY_SEP.join((*key, str(pid)))] = acc
            acc += s
    key_expr = F.concat_ws(
        _KEY_SEP,
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL_KEY)) for c in pcols],
        F.col("_pid").cast("string"),
    )
    mapping = F.create_map(
        *[F.lit(x) for kv in sorted(key_offsets.items()) for x in kv]
    )
    return (
        summed.withColumn(
            out,
            (F.element_at(mapping, key_expr) + F.col("_cum")).cast("long"),
        ).drop("_pid", "_val", "_cum"),
        total,
    )


def with_dense_index(
    df: DataFrame, order_cols: list[str], out: str = "_dense_index", base: int = 0
) -> DataFrame:
    """Global dense 1-based index in ``order_cols`` order — WITHOUT a
    single-partition global sort: the running total of 1 per row (see
    ``with_running_total``). The index depends only on the total order,
    which is unique when ``order_cols`` are (binlog coordinates are).
    """
    result, _total = _with_dense_index_counted(df, order_cols, out=out, base=base)
    return result


def _with_dense_index_counted(
    df: DataFrame,
    order_cols: list[str],
    out: str = "_dense_index",
    base: "int | Callable[[int], int]" = 0,
    num_partitions: int | None = None,
) -> "tuple[DataFrame, int]":
    """``with_dense_index`` + the row count for free (see
    ``_with_running_total``); callable ``base`` receives the count."""
    return _with_running_total(
        df, list(order_cols), F.lit(1).cast("long"), out=out, base=base,
        num_partitions=num_partitions,
    )


def to_envelopes(changes: DataFrame, index_base: int = 0) -> DataFrame:
    """``to_envelopes_counted`` without the count (see below)."""
    env, _n = to_envelopes_counted(changes, index_base=index_base)
    return env


def to_envelopes_counted(
    changes: DataFrame,
    index_base: "int | Callable[[int], int]" = 0,
    num_partitions: int | None = None,
) -> "tuple[DataFrame, int]":
    """Shape raw change records into the reference envelope.

    ``event_index`` = index_base + dense position in (binlog_file,
    binlog_pos, row_no) order, computed with ``with_dense_index`` — the
    range-partitioned zipWithIndex, so no single-partition global sort
    even on large batches. In streaming, pass the running count from the
    checkpoint as ``index_base`` per micro-batch (see streaming.pipeline);
    ordering within a batch is total because binlog coordinates are
    unique per row event.
    """
    coords = ["binlog_file", "binlog_pos", "row_no"]
    indexed, n_rows = _with_dense_index_counted(
        changes, coords, out="_ei", base=index_base,
        num_partitions=num_partitions,
    )
    is_upd = F.col("action") == "update"
    is_del = F.col("action") == "delete"
    is_ddl = F.col("action") == "ddl"
    data = (
        F.when(is_ddl, F.lit(None).cast("map<string,string>"))
        .when(is_upd, F.lit(None).cast("map<string,string>"))
        .when(is_del, F.col("before"))
        .otherwise(F.col("after"))
    )
    env = indexed.select(
        F.col("database"),
        F.col("table"),
        event_type_col().alias("event_type"),
        F.unix_timestamp("ts_header").alias("time"),
        F.col("_ei").alias("event_index"),
        F.struct(
            data.alias("data"),
            F.when(is_upd, F.col("before")).alias("old_data"),
            F.when(is_upd, F.col("after")).alias("new_data"),
        ).alias("event"),
        # passthroughs used by routing/sinks, not part of the JSON payload
        F.concat_ws(".", "database", "table").alias("full_table"),
        F.col("binlog_file"),
        F.col("binlog_pos"),
        F.col("xid_commit"),
    )
    return env, n_rows


def envelope_json(env: DataFrame = None) -> Column:
    """Envelope → JSON payload, reference wire shape (handler.go:83).

    The reference's JSON is polymorphic: insert/delete carry
    ``event.data = {col: val}`` while update nests the pair at
    ``event.data.old_data`` / ``event.data.new_data``
    (handler.go:137-181, examples/subscribe.php:40-100), and ``alter``
    has no ``event`` member at all (handler.go:101-110). A single Spark
    struct can't express that, so serialize per event_type; the
    DataFrame-side schema stays the normalized EVENT_SCHEMA.
    """
    head = ("database", "table", "event_type", "time", "event_index")
    upd = F.to_json(
        F.struct(
            *head,
            F.struct(
                F.struct(
                    F.col("event.old_data").alias("old_data"),
                    F.col("event.new_data").alias("new_data"),
                ).alias("data")
            ).alias("event"),
        )
    )
    ins_del = F.to_json(
        F.struct(*head, F.struct(F.col("event.data").alias("data")).alias("event"))
    )
    alter = F.to_json(F.struct(*head))
    return (
        F.when(F.col("event_type") == "update", upd)
        .when(F.col("event_type") == "alter", alter)
        .otherwise(ins_del)
    )


def parse_envelope_json(col) -> Column:
    """Inverse of envelope_json (consumer side, client/tcp.go:444-449)."""
    return F.from_json(col, EVENT_SCHEMA)


# ---------------------------------------------------------------------------
# Field decode rules (util.go:61-146)
# ---------------------------------------------------------------------------

_UNSIGNED_WIDEN = {
    8: 1 << 8,  # tinyint  → +256        (util.go:69-75)
    16: 1 << 16,  # smallint → +65536     (util.go:76-82)
    24: 1 << 24,  # mediumint             (util.go:83-93)
    32: 1 << 32,  # int                   (util.go:83-93)
}


def widen_unsigned(col, bits: int) -> Column:
    """Signed-decoded unsigned column → true unsigned value.

    The binlog decodes unsigned ints through signed Go types; negative
    values mean the high bit was set (util.go:61-122). 64-bit uses the
    uint64 reinterpretation, which exceeds LongType → Decimal(20,0).
    """
    c = F.col(col) if isinstance(col, str) else col
    if bits == 64:
        # 2^64 exceeds a JVM long literal → decimal-from-string
        two64 = F.expr("CAST('18446744073709551616' AS DECIMAL(21,0))")
        neg = (c.cast("decimal(21,0)") + two64).cast("decimal(20,0)")
        return F.when(c < 0, neg).otherwise(c.cast("decimal(20,0)"))
    add = _UNSIGNED_WIDEN[bits]
    return (F.when(c < 0, c.cast("long") + add).otherwise(c.cast("long"))).alias(
        f"u{bits}"
    )


def decode_enum(ordinal, labels: list[str]) -> Column:
    """1-based ENUM ordinal → label; 0 (invalid/empty) → ''
    (util.go:96-100). SQL NULL stays NULL — the go-mysql decoder never
    conflates nil with the zero value, and neither may we (the
    ``otherwise('')`` branch would otherwise swallow it)."""
    c = F.col(ordinal) if isinstance(ordinal, str) else ordinal
    arr = F.array(*[F.lit(x) for x in labels])
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c >= 1, F.element_at(arr, c.cast("int")))
        .otherwise(F.lit(""))
    )


def decode_set(bitmask, labels: list[str]) -> Column:
    """SET bitmask → comma-joined member labels (util.go:101-113);
    NULL bitmask stays NULL (same nil/zero distinction as
    ``decode_enum``), while an empty/zero mask is ''."""
    c = F.col(bitmask) if isinstance(bitmask, str) else bitmask
    members = [
        F.when(c.bitwiseAND(F.lit(1 << i)) != 0, F.lit(lab)) for i, lab in enumerate(labels)
    ]
    joined = F.array_join(F.array_compact(F.array(*members)), ",")
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(joined)


def decode_date(col) -> Column:
    """'0000-00-00' zero-dates → NULL, else DateType (row_event.go:456-463)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "0000-00-00", F.lit(None).cast("date")).otherwise(
        c.cast("date")
    )


def decode_year(col) -> Column:
    """YEAR stored as offset from 1900 (row_event.go:465-467)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == 0, F.lit(0)).otherwise(c.cast("int") + F.lit(1900))


# ---------------------------------------------------------------------------
# Table filters / routing (O6, O12)
# ---------------------------------------------------------------------------


def match_filters(table_col, patterns: list[str]) -> Column:
    """OR of regexes; empty list ⇒ match-all (service/util.go:9-22).

    Reference topics are lowercased before matching (subscribe/node.go:44-53).
    """
    c = F.col(table_col) if isinstance(table_col, str) else table_col
    if not patterns:
        return F.lit(True)
    out = F.lit(False)
    for p in patterns:
        # lowercase the SUBJECT only — lowercasing the pattern corrupts
        # uppercase metacharacter classes (\D, \W, \S become their
        # inverses). The reference stores topics lowercased, so patterns
        # are expected lowercase; uppercase literals in a pattern simply
        # never match, same as the reference.
        out = out | F.lower(c).rlike(p)
    return out


def table_filter(df: DataFrame, include: list[str], exclude: list[str]) -> DataFrame:
    """include/exclude regex filter on db.table (canal.go:87-111,245-281)."""
    col = F.col("full_table")
    out = df.filter(match_filters(col, include))
    if exclude:
        out = out.filter(~match_filters(col, exclude))
    return out
