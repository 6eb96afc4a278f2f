"""O20 leader election: at most one active reader, stale-lease failover,
renewal heartbeat, OnLeader start/stop wiring, fencing epochs."""

from __future__ import annotations

import os
import time

from wing_binlog_go_spark.streaming.leader import FileLeaderElector
from tests.streamwait import await_done


def _lease(tmp_path):
    return str(tmp_path / "pipeline.lease")


def test_single_winner_and_fresh_lease_blocks(tmp_path):
    a = FileLeaderElector(_lease(tmp_path), node_id="A", ttl_seconds=30)
    b = FileLeaderElector(_lease(tmp_path), node_id="B", ttl_seconds=30)
    assert a.try_acquire() is True
    assert b.try_acquire() is False
    # idempotent re-acquire by the holder
    assert a.try_acquire() is True
    assert a.epoch == 1


def test_stale_lease_is_stolen_with_bumped_epoch(tmp_path):
    a = FileLeaderElector(_lease(tmp_path), node_id="A", ttl_seconds=5)
    b = FileLeaderElector(_lease(tmp_path), node_id="B", ttl_seconds=5)
    assert a.try_acquire()
    # A dies; its lease goes stale (rewind mtime past the TTL)
    old = time.time() - 60
    os.utime(_lease(tmp_path), (old, old))
    assert b.try_acquire() is True
    assert b.epoch == 2  # fencing token advanced
    # A comes back as a zombie: lease is fresh and not A's -> follower
    assert a.try_acquire() is False


def test_release_hands_over(tmp_path):
    a = FileLeaderElector(_lease(tmp_path), node_id="A")
    b = FileLeaderElector(_lease(tmp_path), node_id="B")
    assert a.try_acquire()
    a.release()
    assert b.try_acquire() is True
    # release by a non-holder must not clobber the new leader's lease
    a.release()
    assert b.renew() is True


def test_renew_refreshes_and_detects_loss(tmp_path):
    a = FileLeaderElector(_lease(tmp_path), node_id="A", ttl_seconds=5)
    b = FileLeaderElector(_lease(tmp_path), node_id="B", ttl_seconds=5)
    assert a.try_acquire()
    before = os.stat(_lease(tmp_path)).st_mtime
    time.sleep(0.05)
    assert a.renew() is True
    assert os.stat(_lease(tmp_path)).st_mtime >= before
    # B steals after staleness; A's next renew reports loss
    old = time.time() - 60
    os.utime(_lease(tmp_path), (old, old))
    assert b.try_acquire()
    assert a.renew() is False


def test_run_guarded_start_stop_cycle(tmp_path):
    events: list = []
    a = FileLeaderElector(_lease(tmp_path), node_id="A", ttl_seconds=2)
    a.run_guarded(
        start_fn=lambda epoch: events.append(("start", epoch)),
        stop_fn=lambda: events.append(("stop",)),
        poll_seconds=0.01,
        rounds=3,
    )
    # gained on round 1, held, stopped+released on exit
    assert events == [("start", 1), ("stop",)]
    # lease released -> another node can take over immediately
    b = FileLeaderElector(_lease(tmp_path), node_id="B", ttl_seconds=2)
    assert b.try_acquire() is True


def test_concurrent_steal_cannot_evict_fresh_winner(tmp_path, monkeypatch):
    """Round-3 ADVICE race: stealers A and B both observe a stale lease;
    A steals first (fresh lease, epoch 2). B — still acting on its stale
    observation — must NOT be able to remove A's fresh lease and mint
    the same epoch. With rename-exclusive stealing, B grabs the lease,
    sees from the preserved mtime that it is live, restores it, and
    stays follower."""
    lease = _lease(tmp_path)
    dead = FileLeaderElector(lease, node_id="DEAD", ttl_seconds=5)
    assert dead.try_acquire()
    old = time.time() - 60
    os.utime(lease, (old, old))

    a = FileLeaderElector(lease, node_id="A", ttl_seconds=5)
    b = FileLeaderElector(lease, node_id="B", ttl_seconds=5)
    assert a.try_acquire() is True and a.epoch == 2
    # Simulate B having passed the staleness check BEFORE A's steal: its
    # _age() observation says stale even though the file is now fresh.
    monkeypatch.setattr(b, "_age", lambda: 61.0)
    assert b.try_acquire() is False
    monkeypatch.undo()
    # A's lease survived intact: A still renews, B still follower
    assert a.renew() is True
    assert b.try_acquire() is False
    with open(lease) as f:
        import json as _json

        cur = _json.load(f)
    assert cur == {"owner": "A", "epoch": 2}


def test_renew_forfeits_on_stale_lease_instead_of_clobbering(tmp_path):
    """Round-3 ADVICE TOCTOU: a holder that wakes up past its own TTL
    must forfeit, not rewrite — the lease may be mid-steal and the
    rewrite would clobber the new leader."""
    lease = _lease(tmp_path)
    a = FileLeaderElector(lease, node_id="A", ttl_seconds=5)
    assert a.try_acquire()
    old = time.time() - 60
    os.utime(lease, (old, old))
    assert a.renew() is False
    # the stale lease was left untouched for stealers
    assert os.stat(lease).st_mtime <= old + 1
    b = FileLeaderElector(lease, node_id="B", ttl_seconds=5)
    assert b.try_acquire() is True and b.epoch == 2


def test_sequential_steals_mint_strictly_increasing_epochs(tmp_path):
    lease = _lease(tmp_path)
    epochs = []
    for node in ("A", "B", "C"):
        e = FileLeaderElector(lease, node_id=node, ttl_seconds=5)
        assert e.try_acquire() is True
        epochs.append(e.epoch)
        old = time.time() - 60
        os.utime(lease, (old, old))
    assert epochs == [1, 2, 3]


def test_zombie_release_does_not_remove_new_leaders_lease(tmp_path):
    lease = _lease(tmp_path)
    a = FileLeaderElector(lease, node_id="A", ttl_seconds=5)
    assert a.try_acquire()
    old = time.time() - 60
    os.utime(lease, (old, old))
    b = FileLeaderElector(lease, node_id="B", ttl_seconds=5)
    assert b.try_acquire()
    a.release()  # zombie A releasing must be a no-op
    assert os.path.exists(lease)
    assert b.renew() is True


def test_ha_failover_continues_pipeline_from_shared_checkpoint(spark, tmp_path):
    """O20+O21 end-to-end: leader A runs the CDC pipeline and dies; the
    standby wins the stale lease (with a higher fencing epoch) and
    resumes from the SAME shared checkpoint — event_index continues with
    no gap and no reuse, which is the pos-replication guarantee."""
    import json as _json

    from wing_binlog_go_spark.sources.changelog import fixture_records
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import collecting_writer

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    shared = str(tmp_path / "shared-ckpt")
    lease = str(tmp_path / "shared-ckpt.lease")
    recs = fixture_records()
    f1 = [r for r in recs if r["binlog_file"] == "mysql-bin.000003"]
    f2 = [r for r in recs if r["binlog_file"] == "mysql-bin.000004"]
    with open(log_dir / "a.jsonl", "w") as f:
        for r in f1:
            f.write(_json.dumps(r) + "\n")

    # node A: leader, processes the first file
    a = FileLeaderElector(lease, node_id="A", ttl_seconds=5)
    assert a.try_acquire()
    got_a: list = []
    q = run_pipeline(spark, str(log_dir), [Route("m", collecting_writer(got_a))], shared)
    await_done(q)
    idx_a = [_json.loads(p)["event_index"] for _, p in got_a]
    assert idx_a == list(range(1, len(f1) + 1))

    # A dies without releasing; its lease goes stale
    old = time.time() - 60
    os.utime(lease, (old, old))

    # node B: wins the election with a bumped epoch, resumes the SAME
    # checkpoint as new data arrives
    b = FileLeaderElector(lease, node_id="B", ttl_seconds=5)
    assert b.try_acquire() is True and b.epoch == 2
    with open(log_dir / "b.jsonl", "w") as f:
        for r in f2:
            f.write(_json.dumps(r) + "\n")
    got_b: list = []
    q2 = run_pipeline(spark, str(log_dir), [Route("m", collecting_writer(got_b))], shared)
    await_done(q2)
    idx_b = [_json.loads(p)["event_index"] for _, p in got_b]
    assert idx_b == list(range(len(f1) + 1, len(f1) + len(f2) + 1))
    # zombie A cannot reacquire while B's lease is fresh
    assert a.try_acquire() is False


def test_torn_commit_failover_neither_skips_nor_duplicates_index(spark, tmp_path):
    """O20+O21 adversarial restart: the leader dies BETWEEN the sink
    write and Spark's checkpoint commit (the torn-commit window in
    ``run_pipeline.process`` — IndexState.base_for persists before the
    routes write, the offset log commits after). The standby must
    replay the batch with IDENTICAL event_index values: no gap, no new
    indexes — so an idempotent sink keyed on event_index converges.
    The reference can duplicate indexes on crash replay (handler.go:
    32-55, SURVEY §7); replay-stable bases are the improvement."""
    import json as _json

    from wing_binlog_go_spark.sources.changelog import fixture_records
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import collecting_writer

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    shared = str(tmp_path / "shared-ckpt")
    lease = str(tmp_path / "shared-ckpt.lease")
    recs = fixture_records()
    f1 = [r for r in recs if r["binlog_file"] == "mysql-bin.000003"]
    f2 = [r for r in recs if r["binlog_file"] == "mysql-bin.000004"]
    with open(log_dir / "a.jsonl", "w") as f:
        for r in f1:
            f.write(_json.dumps(r) + "\n")

    # Leader A: the sink write SUCCEEDS, then the process "dies" before
    # Spark can commit the batch to the offset/commit logs.
    a = FileLeaderElector(lease, node_id="A", ttl_seconds=5)
    assert a.try_acquire()
    got_a: list = []
    inner = collecting_writer(got_a)

    def crash_after_write(env, batch_id):
        inner(env, batch_id)
        raise RuntimeError("simulated crash between sink write and commit")

    q = run_pipeline(spark, str(log_dir), [Route("m", crash_after_write)], shared)
    try:
        await_done(q)
    except Exception:
        pass  # the simulated crash surfaces through the query
    assert not q.isActive
    idx_a = [_json.loads(p)["event_index"] for _, p in got_a]
    assert idx_a == list(range(1, len(f1) + 1))  # sink DID apply

    # A's lease goes stale; standby B wins with a bumped fencing epoch
    # and resumes the SAME checkpoint.
    old = time.time() - 60
    os.utime(lease, (old, old))
    b = FileLeaderElector(lease, node_id="B", ttl_seconds=5)
    assert b.try_acquire() is True and b.epoch == 2

    got_b: list = []
    q2 = run_pipeline(spark, str(log_dir), [Route("m", collecting_writer(got_b))], shared)
    await_done(q2)
    idx_b = [_json.loads(p)["event_index"] for _, p in got_b]
    # The torn batch REPLAYS with byte-identical indexes (no skip — the
    # stream did not advance past it; no fresh indexes — base_for hands
    # back the recorded base), so union-by-index == exactly 1..n.
    assert idx_b == idx_a
    payloads_a = {(_json.loads(p)["event_index"], p) for _, p in got_a}
    payloads_b = {(_json.loads(p)["event_index"], p) for _, p in got_b}
    assert payloads_a == payloads_b  # idempotent upsert converges

    # New data after failover continues the sequence with no gap/reuse.
    with open(log_dir / "b.jsonl", "w") as f:
        for r in f2:
            f.write(_json.dumps(r) + "\n")
    got_c: list = []
    q3 = run_pipeline(spark, str(log_dir), [Route("m", collecting_writer(got_c))], shared)
    await_done(q3)
    idx_c = [_json.loads(p)["event_index"] for _, p in got_c]
    assert idx_c == list(range(len(f1) + 1, len(f1) + len(f2) + 1))


def test_epoch_never_regresses_for_an_observer_during_steal_gap(tmp_path):
    """A contender that reads the lease path during another stealer's
    rename→link gap sees 'no lease'. If it ever observed a prior epoch
    it must mint ABOVE it, not restart at 1 — fencing tokens compare
    across leaders."""
    lease = _lease(tmp_path)
    a = FileLeaderElector(lease, node_id="A", ttl_seconds=5)
    b = FileLeaderElector(lease, node_id="B", ttl_seconds=5)
    assert a.try_acquire() and a.epoch == 1
    assert b.try_acquire() is False  # B observed epoch 1
    # simulate the mid-steal gap: the lease path is momentarily empty
    os.unlink(lease)
    assert b.try_acquire() is True
    assert b.epoch == 2  # floored by the observed epoch, not reset to 1


def test_non_object_lease_json_reads_as_no_lease(tmp_path):
    """Valid JSON that is not an object (external corruption) must not
    AttributeError-kill the election loop — it reads as 'no lease' and
    a node simply acquires over it."""
    lease = _lease(tmp_path)
    with open(lease, "w") as f:
        f.write("[1, 2]")
    old = time.time() - 60
    os.utime(lease, (old, old))
    a = FileLeaderElector(lease, node_id="A", ttl_seconds=5)
    assert a.try_acquire()
    assert a.renew() is True
