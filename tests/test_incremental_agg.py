"""CDC incremental aggregate materialization: per-group SUM/COUNT kept
current from insert/update/delete envelopes; group-moving updates
converge; replay is a no-op; commit is crash-atomic with its mark."""

from __future__ import annotations

import os

from wing_binlog_go_spark.functions.envelope import EVENT_SCHEMA
from wing_binlog_go_spark.streaming.aggregate import (
    applied_index,
    incremental_agg_apply,
)


def _env(spark, rows):
    """rows: (event_type, event_index, data, old_data, new_data)"""
    return spark.createDataFrame(
        [
            ("db", "t", et, 0, idx, {"data": d, "old_data": o, "new_data": n})
            for et, idx, d, o, n in rows
        ],
        EVENT_SCHEMA,
    )


def _state(spark, state_dir):
    return {
        r.grp: (round(r.agg_sum, 6), r.agg_count)
        for r in spark.read.parquet(state_dir).collect()
    }


def test_incremental_agg_deltas_and_group_move(spark, tmp_path):
    state = str(tmp_path / "agg")
    b1 = _env(
        spark,
        [
            ("insert", 1, {"g": "a", "v": "10"}, None, None),
            ("insert", 2, {"g": "a", "v": "5"}, None, None),
            ("insert", 3, {"g": "b", "v": "7"}, None, None),
        ],
    )
    incremental_agg_apply(spark, b1, state, "g", "v")
    assert _state(spark, state) == {"a": (15.0, 2), "b": (7.0, 1)}

    b2 = _env(
        spark,
        [
            # in-group value update
            ("update", 4, None, {"g": "a", "v": "10"}, {"g": "a", "v": "12"}),
            # group-moving update: leaves b, joins a
            ("update", 5, None, {"g": "b", "v": "7"}, {"g": "a", "v": "7"}),
            ("delete", 6, {"g": "a", "v": "5"}, None, None),
        ],
    )
    incremental_agg_apply(spark, b2, state, "g", "v")
    # a: 15 -10 +12 -5 +7 = 19, count 2+1-1 = 2; b fully deleted -> gone
    assert _state(spark, state) == {"a": (19.0, 2)}
    assert applied_index(state) == 6


def test_incremental_agg_replay_is_noop(spark, tmp_path):
    state = str(tmp_path / "agg")
    b = _env(
        spark,
        [
            ("insert", 1, {"g": "x", "v": "3"}, None, None),
            ("update", 2, None, {"g": "x", "v": "3"}, {"g": "x", "v": "4"}),
        ],
    )
    incremental_agg_apply(spark, b, state, "g", "v")
    first = _state(spark, state)
    # at-least-once redelivery: the exact same batch applies again
    incremental_agg_apply(spark, b, state, "g", "v")
    assert _state(spark, state) == first == {"x": (4.0, 1)}
    # partial overlap: one replayed row + one new row
    b2 = _env(
        spark,
        [
            ("update", 2, None, {"g": "x", "v": "3"}, {"g": "x", "v": "4"}),
            ("insert", 3, {"g": "x", "v": "10"}, None, None),
        ],
    )
    incremental_agg_apply(spark, b2, state, "g", "v")
    assert _state(spark, state) == {"x": (14.0, 2)}


def test_incremental_agg_matches_batch_recompute(spark, tmp_path):
    """Stream of 60 mixed events applied in 3 batches equals a batch
    GROUP BY over the surviving rows."""
    import random

    rng = random.Random(42)
    live: dict[int, tuple[str, int]] = {}
    events = []
    idx = 0
    for pk in range(30):
        idx += 1
        g, v = rng.choice("pqr"), rng.randint(1, 100)
        live[pk] = (g, v)
        events.append(("insert", idx, {"g": g, "v": str(v)}, None, None))
    for pk in range(0, 30, 3):
        idx += 1
        og, ov = live[pk]
        if pk % 2:
            del live[pk]
            events.append(("delete", idx, {"g": og, "v": str(ov)}, None, None))
        else:
            ng, nv = rng.choice("pqr"), rng.randint(1, 100)
            live[pk] = (ng, nv)
            events.append(
                ("update", idx, None, {"g": og, "v": str(ov)}, {"g": ng, "v": str(nv)})
            )
    state = str(tmp_path / "agg")
    for lo in range(0, len(events), 20):
        incremental_agg_apply(
            spark, _env(spark, events[lo : lo + 20]), state, "g", "v"
        )
    expect: dict[str, list] = {}
    for g, v in live.values():
        cur = expect.setdefault(g, [0.0, 0])
        cur[0] += v
        cur[1] += 1
    assert _state(spark, state) == {g: (s, c) for g, (s, c) in expect.items()}


def test_incremental_agg_crash_before_swap_recovers(spark, tmp_path):
    """A staged-but-unswapped batch leaves the old state + mark intact;
    re-applying converges (the mark moved with the swap, not before)."""
    state = str(tmp_path / "agg")
    b1 = _env(spark, [("insert", 1, {"g": "a", "v": "1"}, None, None)])
    incremental_agg_apply(spark, b1, state, "g", "v")
    # simulate a crash that left a stale staging dir behind
    os.makedirs(state + "._staging", exist_ok=True)
    b2 = _env(spark, [("insert", 2, {"g": "a", "v": "2"}, None, None)])
    incremental_agg_apply(spark, b2, state, "g", "v")
    assert _state(spark, state) == {"a": (3.0, 2)}
    assert applied_index(state) == 2


def test_incremental_agg_route_through_pipeline(spark, tmp_path):
    """The writer as a pipeline route: envelope stream → maintained
    aggregate keyed on a column that UPDATEs move between groups
    (c_vchar changes rewrite the group), via the real changelog →
    envelope → foreachBatch path."""
    from wing_binlog_go_spark.sources.changelog import write_fixture_changelog
    from wing_binlog_go_spark.streaming.aggregate import incremental_agg_writer
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline

    log_dir = tmp_path / "log"
    write_fixture_changelog(str(log_dir), split_files=False)
    state = str(tmp_path / "agg")
    q = run_pipeline(
        spark,
        str(log_dir),
        [Route("agg", incremental_agg_writer(state, "c_vchar", "c_int"))],
        str(tmp_path / "ckpt"),
        include=[r"fixtures\.cdc_typed_all"],
    )
    q.awaitTermination(60)
    got = {
        r.grp: (r.agg_sum, r.agg_count)
        for r in spark.read.parquet(state).collect()
    }
    # updates moved row1->row1v2 and row2->row2v2 (old groups cancel to
    # zero and vanish); the unmatched delete's group never goes live
    assert got == {
        "row1v2": (11.0, 1),
        "row2v2": (21.0, 1),
        "row3": (30.0, 1),
        "committed": (0.0, 1),
        "post-ddl": (7.0, 1),
        "split-a": (1.0, 1),
        "split-b": (2.0, 1),
    }


def _minmax_state(spark, state_dir):
    return {
        r.grp: (r.agg_min, r.agg_max, r.agg_count)
        for r in spark.read.parquet(state_dir).collect()
    }


def _replica_from(rows):
    """Recompute source over an explicit live-row list [(grp, val)]."""

    def read(spark):
        if not rows:
            return spark.createDataFrame([], "grp string, val double")
        return spark.createDataFrame(
            [(g, float(v)) for g, v in rows], "grp string, val double"
        )

    return read


def test_minmax_inserts_fold_in_without_recompute(spark, tmp_path):
    from wing_binlog_go_spark.streaming.aggregate import incremental_minmax_apply

    state = str(tmp_path / "mm")
    b1 = _env(
        spark,
        [
            ("insert", 1, {"g": "a", "v": "10"}, None, None),
            ("insert", 2, {"g": "a", "v": "5"}, None, None),
            ("insert", 3, {"g": "b", "v": "7"}, None, None),
        ],
    )
    # replica deliberately WRONG: a pure-insert batch must never touch it
    incremental_minmax_apply(
        spark, b1, state, "g", "v", _replica_from([("a", 999)])
    )
    assert _minmax_state(spark, state) == {"a": (5.0, 10.0, 2), "b": (7.0, 7.0, 1)}


def test_minmax_delete_of_extreme_recomputes_from_replica(spark, tmp_path):
    from wing_binlog_go_spark.streaming.aggregate import incremental_minmax_apply

    state = str(tmp_path / "mm")
    b1 = _env(
        spark,
        [
            ("insert", 1, {"g": "a", "v": "10"}, None, None),
            ("insert", 2, {"g": "a", "v": "5"}, None, None),
            ("insert", 3, {"g": "a", "v": "8"}, None, None),
        ],
    )
    incremental_minmax_apply(spark, b1, state, "g", "v", _replica_from([]))
    # delete the min → group invalidated → rebuilt from the replica,
    # which post-batch holds {10, 8}
    b2 = _env(spark, [("delete", 4, {"g": "a", "v": "5"}, None, None)])
    incremental_minmax_apply(
        spark, b2, state, "g", "v", _replica_from([("a", 10), ("a", 8)])
    )
    assert _minmax_state(spark, state) == {"a": (8.0, 10.0, 2)}
    # interior delete folds in WITHOUT consulting the (wrong) replica
    b3 = _env(spark, [("delete", 5, {"g": "a", "v": "9"}, None, None)])
    incremental_minmax_apply(
        spark, b3, state, "g", "v", _replica_from([("a", 777)])
    )
    assert _minmax_state(spark, state) == {"a": (8.0, 10.0, 1)}


def test_minmax_group_move_and_full_delete(spark, tmp_path):
    from wing_binlog_go_spark.streaming.aggregate import incremental_minmax_apply

    state = str(tmp_path / "mm")
    b1 = _env(
        spark,
        [
            ("insert", 1, {"g": "a", "v": "3"}, None, None),
            ("insert", 2, {"g": "b", "v": "6"}, None, None),
        ],
    )
    incremental_minmax_apply(spark, b1, state, "g", "v", _replica_from([]))
    # the move removes b's only (extreme) value → b recomputes to empty
    # and vanishes; a gains 6 via the algebraic path
    b2 = _env(
        spark,
        [("update", 3, None, {"g": "b", "v": "6"}, {"g": "a", "v": "6"})],
    )
    incremental_minmax_apply(
        spark, b2, state, "g", "v", _replica_from([("a", 3), ("a", 6)])
    )
    assert _minmax_state(spark, state) == {"a": (3.0, 6.0, 2)}


def test_minmax_replay_is_noop(spark, tmp_path):
    from wing_binlog_go_spark.streaming.aggregate import incremental_minmax_apply

    state = str(tmp_path / "mm")
    b = _env(
        spark,
        [
            ("insert", 1, {"g": "x", "v": "3"}, None, None),
            ("delete", 2, {"g": "x", "v": "3"}, None, None),
            ("insert", 3, {"g": "x", "v": "4"}, None, None),
        ],
    )
    rep = _replica_from([("x", 4)])
    incremental_minmax_apply(spark, b, state, "g", "v", rep)
    first = _minmax_state(spark, state)
    incremental_minmax_apply(spark, b, state, "g", "v", rep)
    assert _minmax_state(spark, state) == first == {"x": (4.0, 4.0, 1)}


def test_minmax_matches_batch_recompute_randomized(spark, tmp_path):
    """Random insert/update/delete stream applied in batches, with the
    replica kept live alongside — final state equals a full GROUP BY
    min/max/count over surviving rows."""
    import random

    from wing_binlog_go_spark.streaming.aggregate import incremental_minmax_apply

    rng = random.Random(7)
    live: dict[int, tuple[str, int]] = {}
    events = []
    idx = 0
    for pk in range(40):
        idx += 1
        g, v = rng.choice("pqr"), rng.randint(1, 100)
        live[pk] = (g, v)
        events.append(("insert", idx, {"g": g, "v": str(v)}, None, None))
    for pk in range(0, 40, 2):
        idx += 1
        og, ov = live[pk]
        if pk % 3:
            del live[pk]
            events.append(("delete", idx, {"g": og, "v": str(ov)}, None, None))
        else:
            ng, nv = rng.choice("pqr"), rng.randint(1, 100)
            live[pk] = (ng, nv)
            events.append(
                ("update", idx, None, {"g": og, "v": str(ov)}, {"g": ng, "v": str(nv)})
            )
    state = str(tmp_path / "mm")
    # apply in 4 batches; replica snapshot = live rows AFTER each batch
    snapshot: dict[int, tuple[str, int]] = {}
    batches = [events[lo : lo + 20] for lo in range(0, len(events), 20)]
    for chunk in batches:
        for et, _i, d, o, n in chunk:
            if et == "insert":
                key = max(snapshot, default=-1) + 1
                snapshot[key] = (d["g"], int(d["v"]))
            elif et == "delete":
                k = next(k for k, gv in snapshot.items() if gv == (d["g"], int(d["v"])))
                del snapshot[k]
            else:
                k = next(k for k, gv in snapshot.items() if gv == (o["g"], int(o["v"])))
                snapshot[k] = (n["g"], int(n["v"]))
        incremental_minmax_apply(
            spark,
            _env(spark, chunk),
            state,
            "g",
            "v",
            _replica_from(list(snapshot.values())),
        )
    expect: dict[str, tuple] = {}
    for g, v in live.values():
        lo, hi, c = expect.get(g, (float("inf"), float("-inf"), 0))
        expect[g] = (min(lo, v), max(hi, v), c + 1)
    assert _minmax_state(spark, state) == {
        g: (float(lo), float(hi), c) for g, (lo, hi, c) in expect.items()
    }


def test_minmax_route_composed_with_upsert_replica(spark, tmp_path):
    """End-to-end composition through the real pipeline: the upsert
    route materializes the replica FIRST, the minmax route recomputes
    from it (routes run in list order inside one foreachBatch)."""
    from wing_binlog_go_spark.sources.changelog import write_fixture_changelog
    from wing_binlog_go_spark.streaming.aggregate import (
        incremental_minmax_writer,
        replica_minmax_source,
    )
    from wing_binlog_go_spark.streaming.pipeline import (
        Route,
        run_pipeline,
        upsert_parquet,
    )

    log_dir = tmp_path / "log"
    write_fixture_changelog(str(log_dir), split_files=False)
    replica_dir = str(tmp_path / "replica")
    state = str(tmp_path / "mm")

    def upsert_writer(env, batch_id):
        upsert_parquet(env, replica_dir, pk="id")

    q = run_pipeline(
        spark,
        str(log_dir),
        [
            Route("replica", upsert_writer),
            Route(
                "minmax",
                incremental_minmax_writer(
                    state, "c_vchar", "c_int",
                    replica_minmax_source(replica_dir, "c_vchar", "c_int"),
                ),
            ),
        ],
        str(tmp_path / "ckpt"),
        include=[r"fixtures\.cdc_typed_all"],
    )
    q.awaitTermination(60)
    got = _minmax_state(spark, state)
    # same surviving rows as the SUM/COUNT pipeline test; every group is
    # a single row so min == max == its value
    assert got == {
        "row1v2": (11.0, 11.0, 1),
        "row2v2": (21.0, 21.0, 1),
        "row3": (30.0, 30.0, 1),
        "committed": (0.0, 0.0, 1),
        "post-ddl": (7.0, 7.0, 1),
        "split-a": (1.0, 1.0, 1),
        "split-b": (2.0, 2.0, 1),
    }


def test_incremental_avg_var_match_batch_recompute(spark, tmp_path):
    """The maintained (sum, sumsq, count) moments yield AVG/VAR equal
    to a batch recompute over surviving rows, through deletes and
    group-moving updates."""
    import statistics

    from wing_binlog_go_spark.streaming.aggregate import (
        agg_view,
        incremental_agg_apply,
    )

    state = str(tmp_path / "agg")
    events = [
        ("insert", 1, {"g": "a", "v": "10"}, None, None),
        ("insert", 2, {"g": "a", "v": "14"}, None, None),
        ("insert", 3, {"g": "a", "v": "3"}, None, None),
        ("insert", 4, {"g": "b", "v": "7"}, None, None),
        ("insert", 5, {"g": "b", "v": "9"}, None, None),
        # remove a's 14, move b's 7 into a as 6
        ("delete", 6, {"g": "a", "v": "14"}, None, None),
        ("update", 7, None, {"g": "b", "v": "7"}, {"g": "a", "v": "6"}),
    ]
    for lo in range(0, len(events), 3):
        incremental_agg_apply(
            spark, _env(spark, events[lo : lo + 3]), state, "g", "v"
        )
    live = {"a": [10.0, 3.0, 6.0], "b": [9.0]}
    got = {r.grp: r for r in agg_view(spark.read.parquet(state)).collect()}
    for g, vals in live.items():
        assert got[g].agg_count == len(vals)
        assert abs(got[g].agg_avg - statistics.mean(vals)) < 1e-9, g
        assert abs(got[g].agg_var - statistics.pvariance(vals)) < 1e-9, g


def test_incremental_agg_rejects_legacy_state_without_sumsq(spark, tmp_path):
    """State written without the sumsq column must fail loudly, not
    silently produce wrong variances."""
    import pytest as _pytest

    state = str(tmp_path / "agg")
    spark.createDataFrame(
        [("a", 1.0, 1)], "grp string, agg_sum double, agg_count bigint"
    ).write.parquet(state)
    b = _env(spark, [("insert", 1, {"g": "a", "v": "1"}, None, None)])
    with _pytest.raises(ValueError, match="agg_sumsq"):
        incremental_agg_apply(spark, b, state, "g", "v")


def test_incremental_distinct_hll_maintenance(spark, tmp_path):
    """Approximate COUNT(DISTINCT) maintenance: per-group HLL sketches
    union across batches (exact at these cardinalities), replays are
    no-ops, repeated values don't inflate the estimate, and any
    non-insert envelope raises loudly (sketches cannot retract)."""
    import pytest as _pytest

    from wing_binlog_go_spark.streaming.aggregate import (
        distinct_view,
        incremental_distinct_apply,
    )

    state = str(tmp_path / "ndv")
    b1 = _env(
        spark,
        [
            ("insert", 1, {"g": "a", "v": "u1"}, None, None),
            ("insert", 2, {"g": "a", "v": "u2"}, None, None),
            ("insert", 3, {"g": "a", "v": "u1"}, None, None),  # repeat
            ("insert", 4, {"g": "b", "v": "u1"}, None, None),
        ],
    )
    incremental_distinct_apply(spark, b1, state, "g", "v")
    ndv = {
        r.grp: r.approx_ndv
        for r in distinct_view(spark.read.parquet(state)).collect()
    }
    assert ndv == {"a": 2, "b": 1}

    # batch 2: new value for a, repeat-across-batch for b
    b2 = _env(
        spark,
        [
            ("insert", 5, {"g": "a", "v": "u3"}, None, None),
            ("insert", 6, {"g": "b", "v": "u1"}, None, None),
        ],
    )
    incremental_distinct_apply(spark, b2, state, "g", "v")
    ndv = {
        r.grp: r.approx_ndv
        for r in distinct_view(spark.read.parquet(state)).collect()
    }
    assert ndv == {"a": 3, "b": 1}

    # replay of batch 2 (event_index <= high-water mark): no-op
    incremental_distinct_apply(spark, b2, state, "g", "v")
    ndv2 = {
        r.grp: r.approx_ndv
        for r in distinct_view(spark.read.parquet(state)).collect()
    }
    assert ndv2 == ndv

    # deletes/updates cannot be retracted from a sketch → loud failure
    b3 = _env(
        spark,
        [("delete", 7, {"g": "a", "v": "u3"}, None, None)],
    )
    with _pytest.raises(ValueError, match="insert-only"):
        incremental_distinct_apply(spark, b3, state, "g", "v")
