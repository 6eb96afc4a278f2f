"""SCD Type-2 dimension-history materializer.

The reference's headline use case is feeding downstream consumers that
materialize state from the change stream (readme.md:40-43);
``scd2_upsert_parquet`` is the history-keeping sibling of the
last-writer-wins replica: every change event opens a version row with
[valid_from_index, valid_to_index) bounds derived from the
replay-stable event_index, so the table answers point-in-time queries.
"""

from __future__ import annotations

from wing_binlog_go_spark.functions.schema_registry import (
    ColumnSpec,
    SchemaRegistry,
    TableSpec,
)
from wing_binlog_go_spark.sources.changelog import write_fixture_changelog
from wing_binlog_go_spark.streaming.pipeline import (
    Route,
    pk_str,
    run_pipeline,
    scd2_upsert_parquet,
)
from wing_binlog_go_spark.streaming.sinks import (
    read_scd2_history,
    scd2_history_writer,
)
from tests.streamwait import await_done

ENV_SCHEMA = (
    "event_type string, event_index long, "
    "event struct<data:map<string,string>, old_data:map<string,string>, "
    "new_data:map<string,string>>"
)


def _env(spark, rows):
    return spark.createDataFrame(rows, ENV_SCHEMA)


def _history(spark, target):
    out = {}
    for r in spark.read.parquet(target).collect():
        out.setdefault(r._pk, []).append(r)
    for versions in out.values():
        versions.sort(key=lambda r: r.valid_from_index)
    return out


def test_versions_open_and_close(spark, tmp_path):
    env = _env(
        spark,
        [
            ("insert", 1, ({"id": "1", "v": "a"}, None, None)),
            ("update", 2, (None, {"id": "1", "v": "a"}, {"id": "1", "v": "b"})),
            ("update", 3, (None, {"id": "1", "v": "b"}, {"id": "1", "v": "c"})),
        ],
    )
    target = str(tmp_path / "t")
    scd2_upsert_parquet(env, target, pk="id")
    h = _history(spark, target)[pk_str("1")]
    assert [r.row["v"] for r in h] == ["a", "b", "c"]
    assert [r.valid_from_index for r in h] == [1, 2, 3]
    assert [r.valid_to_index for r in h] == [2, 3, None]
    assert [r.version_n for r in h] == [1, 2, 3]
    assert [r.is_current for r in h] == [False, False, True]


def test_delete_closes_without_current(spark, tmp_path):
    env = _env(
        spark,
        [
            ("insert", 1, ({"id": "1", "v": "a"}, None, None)),
            ("delete", 2, ({"id": "1", "v": "a"}, None, None)),
        ],
    )
    target = str(tmp_path / "t")
    scd2_upsert_parquet(env, target, pk="id")
    h = _history(spark, target)[pk_str("1")]
    assert [r.is_delete for r in h] == [False, True]
    # the tombstone tail is a recorded version but never "current"
    assert [r.is_current for r in h] == [False, False]
    assert h[0].valid_to_index == 2 and h[1].valid_to_index is None


def test_pk_move_tombstones_old_and_opens_new(spark, tmp_path):
    env = _env(
        spark,
        [
            ("insert", 1, ({"id": "1", "v": "a"}, None, None)),
            ("update", 2, (None, {"id": "1", "v": "a"}, {"id": "2", "v": "b"})),
        ],
    )
    target = str(tmp_path / "t")
    scd2_upsert_parquet(env, target, pk="id")
    h = _history(spark, target)
    old = h[pk_str("1")]
    assert [r.is_delete for r in old] == [False, True]
    assert old[1].valid_from_index == 2  # closed AT the move event
    new = h[pk_str("2")]
    assert len(new) == 1 and new[0].is_current and new[0].row["v"] == "b"


def test_replay_and_cross_batch_idempotent(spark, tmp_path):
    b1 = _env(
        spark,
        [
            ("insert", 1, ({"id": "1", "v": "a"}, None, None)),
            ("update", 2, (None, {"id": "1", "v": "a"}, {"id": "1", "v": "b"})),
        ],
    )
    b2 = _env(
        spark,
        [("update", 3, (None, {"id": "1", "v": "b"}, {"id": "1", "v": "c"}))],
    )
    target = str(tmp_path / "t")
    scd2_upsert_parquet(b1, target, pk="id")
    scd2_upsert_parquet(b1, target, pk="id")  # at-least-once replay
    scd2_upsert_parquet(b2, target, pk="id")
    scd2_upsert_parquet(b2, target, pk="id")
    h = _history(spark, target)[pk_str("1")]
    assert [r.row["v"] for r in h] == ["a", "b", "c"]
    assert [r.is_current for r in h] == [False, False, True]
    # replays created no extra versions
    assert len(h) == 3


def test_scd2_history_route_end_to_end(spark, tmp_path):
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
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=False)
    base = str(tmp_path / "scd2")
    q = run_pipeline(
        spark,
        str(log),
        [Route("scd2", scd2_history_writer(reg, ["fixtures.cdc_typed_all"], base))],
        str(tmp_path / "ckpt"),
    )
    await_done(q)
    hist = read_scd2_history(spark, reg, "fixtures.cdc_typed_all", base)
    rows = {}
    for r in hist.collect():
        rows.setdefault(r.id, []).append(r)
    for versions in rows.values():
        versions.sort(key=lambda r: r.version_n)
    # id 1: insert then update → two versions, update wins the tail
    assert [r.c_vchar for r in rows[1]] == ["row1", "row1v2"]
    assert [bool(r.is_current) for r in rows[1]] == [False, True]
    assert rows[1][0].valid_to_index == rows[1][1].valid_from_index
    # id 5: bare delete → single non-current tombstone version
    assert [bool(r.is_delete) for r in rows[5]] == [True]
    assert [bool(r.is_current) for r in rows[5]] == [False]
    # id 3: untouched insert stays the single current version
    assert [bool(r.is_current) for r in rows[3]] == [True]


def test_empty_batch_does_not_rewrite_history(spark, tmp_path):
    """A batch with zero events for this table must leave the stored
    history files untouched — per-batch I/O must not grow with
    accumulated history when nothing changed (ADVICE r5)."""
    import os

    env = _env(spark, [("insert", 1, ({"id": "1", "v": "a"}, None, None))])
    target = str(tmp_path / "t")
    scd2_upsert_parquet(env, target, pk="id")

    def snapshot():
        out = {}
        for root, _dirs, files in os.walk(target):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns, st.st_ino)
        return out

    before = snapshot()
    empty = _env(spark, []).limit(0)
    scd2_upsert_parquet(empty, target, pk="id")
    assert snapshot() == before  # no staging rewrite happened
    # and the short-circuit only fires when history already exists:
    # first write to a fresh dir with an empty batch still materializes
    fresh = str(tmp_path / "t2")
    scd2_upsert_parquet(empty, fresh, pk="id")
    assert spark.read.parquet(fresh).count() == 0


def test_contract_violation_tiebreak_is_deterministic(spark, tmp_path):
    """Two DIFFERENT images at one (pk, event_index) violate the O10
    contract; the stored version must still be a deterministic content
    pick (max over sorted map entries), not a partition-order artifact."""
    rows = [
        ("insert", 1, ({"id": "1", "v": "a"}, None, None)),
        ("insert", 1, ({"id": "1", "v": "b"}, None, None)),
    ]
    picks = set()
    for flip in (False, True):
        target = str(tmp_path / f"t_{flip}")
        env = _env(spark, list(reversed(rows)) if flip else rows).repartition(4)
        scd2_upsert_parquet(env, target, pk="id")
        h = _history(spark, target)[pk_str("1")]
        assert len(h) == 1
        picks.add(h[0].row["v"])
    assert picks == {"b"}  # max over content, independent of input order


def test_point_in_time_lookup_against_materialized_history(spark, tmp_path):
    """Composition check (q115's pattern against the REAL materializer):
    probing read-back validity windows [valid_from_index, valid_to_index)
    answers "what did the row look like when event N happened" for every
    N — one version hit per in-range probe, none before the first."""
    env = _env(
        spark,
        [
            ("insert", 10, ({"id": "1", "v": "a"}, None, None)),
            ("update", 20, (None, {"id": "1", "v": "a"}, {"id": "1", "v": "b"})),
            ("update", 30, (None, {"id": "1", "v": "b"}, {"id": "1", "v": "c"})),
        ],
    )
    target = str(tmp_path / "t")
    scd2_upsert_parquet(env, target, pk="id")
    hist = spark.read.parquet(target)
    probes = spark.createDataFrame([(5,), (10,), (25,), (99,)], "at long")
    got = (
        probes.join(
            hist,
            (hist.valid_from_index <= probes.at)
            & ((hist.valid_to_index > probes.at) | hist.valid_to_index.isNull()),
        )
        .select("at", hist.row["v"].alias("v"))
        .collect()
    )
    assert {(r.at, r.v) for r in got} == {(10, "a"), (25, "b"), (99, "c")}


def test_bucketed_scd2_matches_flat_history(spark, tmp_path):
    """scd2_upsert_parquet_bucketed must produce the identical version
    set as the flat writer across multiple batches (per-key histories
    are complete within their bucket, so the windows agree)."""
    from wing_binlog_go_spark.streaming.pipeline import (
        scd2_upsert_parquet_bucketed,
    )

    b1 = _env(
        spark,
        [
            ("insert", 1, ({"id": str(i), "v": "a"}, None, None))
            for i in range(20)
        ],
    )
    b2 = _env(
        spark,
        [
            ("update", 30 + i, (None, {"id": str(i), "v": "a"}, {"id": str(i), "v": "b"}))
            for i in range(0, 20, 3)
        ]
        + [("delete", 99, ({"id": "1", "v": "b"}, None, None))],
    )
    flat, bucketed = str(tmp_path / "flat"), str(tmp_path / "bkt")
    for env in (b1, b2):
        scd2_upsert_parquet(env, flat, pk="id")
        scd2_upsert_parquet_bucketed(env, bucketed, pk="id", num_buckets=4)

    from wing_binlog_go_spark.streaming.pipeline import read_bucketed_table

    cols = ["_pk", "row", "is_delete", "valid_from_index",
            "valid_to_index", "is_current", "version_n"]
    a = sorted(map(str, spark.read.parquet(flat).select(cols).collect()))
    b = sorted(map(str, read_bucketed_table(spark, bucketed).select(cols).collect()))
    assert a == b and len(a) > 20


def test_bucketed_scd2_touches_only_changed_buckets(spark, tmp_path):
    """A batch touching one key must rewrite only that key's bucket —
    the whole point of the ADVICE r5 ask: per-batch IO must not grow
    with total accumulated history."""
    import os

    from wing_binlog_go_spark.streaming.pipeline import (
        scd2_upsert_parquet_bucketed,
    )

    target = str(tmp_path / "t")
    seed = _env(
        spark,
        [("insert", i, ({"id": str(i), "v": "x"}, None, None)) for i in range(40)],
    )
    scd2_upsert_parquet_bucketed(seed, target, pk="id", num_buckets=8)

    def mtimes():
        out = {}
        for d in os.listdir(target):
            if d.startswith("bucket="):
                p = os.path.join(target, d)
                out[d] = max(
                    os.stat(os.path.join(p, f)).st_mtime_ns for f in os.listdir(p)
                )
        return out

    before = mtimes()
    one = _env(
        spark,
        [("update", 100, (None, {"id": "7", "v": "x"}, {"id": "7", "v": "y"}))],
    )
    scd2_upsert_parquet_bucketed(one, target, pk="id", num_buckets=8)
    after = mtimes()
    changed = [d for d in after if after[d] != before.get(d)]
    assert len(changed) == 1, changed  # exactly key 7's bucket


def test_bucketed_scd2_route_and_typed_read(spark, tmp_path):
    """End-to-end through the route writer with num_buckets set, read
    back typed through read_scd2_history's transparent layout probe."""
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
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=False)
    base = str(tmp_path / "scd2")
    q = run_pipeline(
        spark,
        str(log),
        [
            Route(
                "scd2",
                scd2_history_writer(
                    reg, ["fixtures.cdc_typed_all"], base, num_buckets=4
                ),
            )
        ],
        str(tmp_path / "ckpt"),
    )
    await_done(q)
    hist = read_scd2_history(spark, reg, "fixtures.cdc_typed_all", base)
    rows = {}
    for r in hist.collect():
        rows.setdefault(r.id, []).append(r)
    for versions in rows.values():
        versions.sort(key=lambda r: r.version_n)
    assert [r.c_vchar for r in rows[1]] == ["row1", "row1v2"]
    assert [bool(r.is_current) for r in rows[1]] == [False, True]
    assert [bool(r.is_delete) for r in rows[5]] == [True]


def test_pit_enrich_route_joins_dimension_state_at_event_time(spark, tmp_path):
    """Stream-side point-in-time enrichment: fact inserts interleaved
    with dimension updates in ONE changelog; each fact must pick up the
    dimension version current AT ITS OWN event — including a fact and
    the dimension change it follows inside the same micro-batch (route
    ordering contract), and a replayed changelog must not duplicate
    output rows (read_pit_enriched dedupes on event_index)."""
    import json as _json

    from wing_binlog_go_spark.streaming.sinks import (
        pit_enrich_writer,
        read_pit_enriched,
    )

    reg = SchemaRegistry()
    reg.register(
        TableSpec(
            "shop", "customer",
            [ColumnSpec("id", "bigint(20)", is_pk=True),
             ColumnSpec("tier", "varchar(16)")],
        )
    )
    reg.register(
        TableSpec(
            "shop", "orders",
            [ColumnSpec("id", "bigint(20)", is_pk=True),
             ColumnSpec("cust_id", "bigint(20)"),
             ColumnSpec("amount", "int(11)")],
        )
    )
    uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    log = tmp_path / "log"
    log.mkdir()

    def rec(pos, table, action, before, after):
        return {
            "binlog_file": "mysql-bin.000001", "binlog_pos": pos,
            "xid_commit": True, "database": "shop", "table": table,
            "action": action, "row_no": 0, "before": before,
            "after": after, "ddl_query": None,
            "ts_header": "2018-04-19T05:21:27.000Z", "gtid": f"{uuid}:1",
        }

    events = [
        rec(100, "customer", "insert", None, {"id": "1", "tier": "bronze"}),
        rec(200, "orders", "insert", None,
            {"id": "10", "cust_id": "1", "amount": "5"}),
        rec(300, "customer", "update", {"id": "1", "tier": "bronze"},
            {"id": "1", "tier": "gold"}),
        rec(400, "orders", "insert", None,
            {"id": "11", "cust_id": "1", "amount": "7"}),
        rec(500, "orders", "insert", None,
            {"id": "12", "cust_id": "2", "amount": "9"}),  # unknown dim
        rec(600, "customer", "delete", {"id": "1", "tier": "gold"}, None),
        rec(700, "orders", "insert", None,
            {"id": "13", "cust_id": "1", "amount": "3"}),  # after the delete
    ]
    with open(log / "part-0000.jsonl", "w") as f:
        for e in events:
            f.write(_json.dumps(e) + "\n")
    base, out = str(tmp_path / "scd2"), str(tmp_path / "enriched")
    routes = [
        Route("scd2", scd2_history_writer(reg, ["shop.customer"], base)),
        Route(
            "enrich",
            pit_enrich_writer(reg, "shop.orders", "shop.customer",
                              "cust_id", base, out),
        ),
    ]
    q = run_pipeline(spark, str(log), routes, str(tmp_path / "ckpt"))
    await_done(q)
    got = {
        r.id: (r.amount, r.dim_tier)
        for r in read_pit_enriched(spark, out).collect()
    }
    assert got == {
        10: (5, "bronze"),   # before the tier change
        11: (7, "gold"),     # after it — same batch as the change
        12: (9, None),       # no dimension row: left join keeps the fact
        13: (3, None),       # dim DELETED before the fact: absent, not
                             # the tombstone's stale image
    }

    # replay the same changelog through a fresh checkpoint: appends
    # land twice, the read view stays exactly-once on event_index
    q2 = run_pipeline(spark, str(log), routes, str(tmp_path / "ckpt2"))
    await_done(q2)
    again = {
        r.id: (r.amount, r.dim_tier)
        for r in read_pit_enriched(spark, out).collect()
    }
    assert again == got


def test_scd2_vacuum_drops_only_pre_horizon_closed_versions(spark, tmp_path):
    """Retention: versions closed before the horizon drop; versions
    closing at/after it, current rows, and open tombstones survive —
    and a post-vacuum upsert still chains correctly."""
    from wing_binlog_go_spark.streaming.pipeline import scd2_vacuum

    env = _env(
        spark,
        [
            ("insert", 1, ({"id": "1", "v": "a"}, None, None)),
            ("update", 2, (None, {"id": "1", "v": "a"}, {"id": "1", "v": "b"})),
            ("insert", 2, ({"id": "2", "v": "x"}, None, None)),
            ("update", 3, (None, {"id": "1", "v": "b"}, {"id": "1", "v": "c"})),
            ("delete", 4, ({"id": "2", "v": "x"}, None, None)),
        ],
    )
    target = str(tmp_path / "t")
    scd2_upsert_parquet(env, target, pk="id")

    stats = scd2_vacuum(spark, target, retain_from_index=3)
    assert stats == {"kept": 4, "dropped": 1}  # only key1's v-a (closed at 2)
    h = _history(spark, target)
    assert [r.row["v"] for r in h[pk_str("1")]] == ["b", "c"]
    assert [r.valid_to_index for r in h[pk_str("1")]] == [3, None]
    # key2: the closed insert (valid_to 4 >= 3) and its tombstone survive
    assert [(r.row["v"], r.is_delete) for r in h[pk_str("2")]] == [
        ("x", False), ("x", True)
    ]

    # idempotent: nothing else expires at the same horizon
    assert scd2_vacuum(spark, target, retain_from_index=3) == {
        "kept": 4, "dropped": 0
    }

    # post-vacuum writes recompute chains over the survivors
    scd2_upsert_parquet(
        _env(spark, [("update", 5, (None, {"id": "1", "v": "c"},
                                    {"id": "1", "v": "d"}))]),
        target,
        pk="id",
    )
    h2 = _history(spark, target)[pk_str("1")]
    assert [r.row["v"] for r in h2] == ["b", "c", "d"]
    assert [r.valid_to_index for r in h2] == [3, 5, None]
    assert [r.is_current for r in h2] == [False, False, True]


def test_scd2_vacuum_bucketed_rewrites_only_expired_buckets(spark, tmp_path):
    """Bucketed layout: vacuum stages + manifest-commits only buckets
    holding expired versions; untouched buckets' files are not
    rewritten."""
    import glob
    import os

    from wing_binlog_go_spark.streaming.pipeline import (
        read_bucketed_table,
        scd2_upsert_parquet_bucketed,
        scd2_vacuum,
    )

    rows = []
    for i in range(12):
        rows.append(("insert", 2 * i + 1, ({"id": str(i), "v": "old"}, None, None)))
    # close key 0's first version early (valid_to = 100 later is fine);
    # use a late index so every other key's version stays open
    rows.append(("update", 100, (None, {"id": "0", "v": "old"},
                                 {"id": "0", "v": "new"})))
    target = str(tmp_path / "t")
    scd2_upsert_parquet_bucketed(_env(spark, rows), target, pk="id", num_buckets=4)

    before = {
        d: sorted(os.listdir(d))
        for d in glob.glob(os.path.join(target, "bucket=*"))
    }
    stats = scd2_vacuum(spark, target, retain_from_index=101)
    assert stats["dropped"] == 1  # key 0's closed first version
    after = {
        d: sorted(os.listdir(d))
        for d in glob.glob(os.path.join(target, "bucket=*"))
    }
    changed_dirs = [d for d in before if before[d] != after.get(d)]
    assert len(changed_dirs) == 1  # only key 0's bucket rewrote
    h = read_bucketed_table(spark, target)
    assert h.count() == 12  # 13 versions - 1 expired
