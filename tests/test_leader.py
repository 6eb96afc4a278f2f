"""O20 leader election: at most one active reader, stale-lease failover,
renewal heartbeat, OnLeader start/stop wiring, fencing epochs."""

from __future__ import annotations

import os
import time

from wing_binlog_go_spark.streaming.leader import FileLeaderElector


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
