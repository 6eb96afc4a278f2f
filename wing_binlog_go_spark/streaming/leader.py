"""O20: single-active-reader leader election on shared storage.

The reference elects exactly one binlog reader per cluster through a
Consul session lock (`vendor/.../wing-go/consul/leader.go:118-151`,
wired in `src/library/agent/server.go:197-247`): hold the lock → run
the canal source; lose it → stop. Spark's driver is already a
singleton per application, so within one app no election is needed —
this module covers the deployment the reference actually targets, TWO+
driver processes pointed at the same pipeline (active/standby), using
the storage they already share (the checkpoint dir) instead of a
Consul dependency.

Mechanics — a TTL lease file:

- acquire: atomic ``link(tmp, lease)`` (fails iff the lease exists);
  a lease whose mtime is older than the TTL is stale and may be
  stolen (unlink + link, then READ BACK to confirm the win — two
  concurrent stealers both link, exactly one's payload survives).
- renew: the holder rewrites payload + mtime every ``ttl/3``; missing
  two renewals forfeits.
- fencing: every acquisition increments a monotonic epoch persisted in
  the lease payload. Downstream writers that record the epoch can
  reject a zombie leader's writes (the classic fencing-token pattern);
  the bucketed-upsert manifest is the natural place to stamp it.

Honest limits (same class as the reference's Consul TTL sessions):
stolen-lease races narrow to the read-back window but clock skew
beyond the TTL or a paused-then-resumed process can still produce a
zombie interval — which is why the epoch exists. On NFS, mtime
granularity and attribute caching widen the windows; production-grade
alternatives are a Delta/Iceberg commit log, a ZooKeeper/etcd lease,
or the cluster manager's own HA restart (SURVEY §2a O20 note). The
point here is the reference's *semantic* — at most one active reader,
automatic failover — expressed against shared storage.
"""

from __future__ import annotations

import json
import os
import socket
import tempfile
import time


class FileLeaderElector:
    """TTL-lease leader election over a shared filesystem path."""

    def __init__(
        self,
        lease_path: str,
        node_id: str | None = None,
        ttl_seconds: float = 10.0,
    ):
        self.lease_path = lease_path
        self.node_id = node_id or f"{socket.gethostname()}:{os.getpid()}"
        self.ttl = float(ttl_seconds)
        self.epoch: int | None = None

    # -- internals --------------------------------------------------------

    def _read(self) -> dict | None:
        try:
            with open(self.lease_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _age(self) -> float | None:
        try:
            return time.time() - os.stat(self.lease_path).st_mtime
        except OSError:
            return None

    def _write_tmp(self, epoch: int) -> str:
        d = os.path.dirname(self.lease_path) or "."
        fd, tmp = tempfile.mkstemp(prefix=".lease.", dir=d)
        with os.fdopen(fd, "w") as f:
            json.dump({"owner": self.node_id, "epoch": epoch}, f)
        return tmp

    def _try_link(self, epoch: int) -> bool:
        tmp = self._write_tmp(epoch)
        try:
            os.link(tmp, self.lease_path)  # atomic: fails iff lease exists
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    # -- protocol ---------------------------------------------------------

    def try_acquire(self) -> bool:
        """One acquisition attempt; returns leadership. Non-blocking."""
        cur = self._read()
        age = self._age()
        next_epoch = (cur.get("epoch", 0) if cur else 0) + 1
        if age is None:
            # no lease on disk — contend for it
            if not self._try_link(next_epoch):
                return self._confirm(next_epoch)
        elif age > self.ttl:
            # stale: steal. Both stealers may pass the staleness check;
            # unlink is idempotent-ish (ignore missing) and exactly one
            # link succeeds; the read-back settles any interleaving.
            try:
                os.unlink(self.lease_path)
            except FileNotFoundError:
                pass
            if not self._try_link(next_epoch):
                return self._confirm(next_epoch)
        else:
            # fresh lease: leader iff it is already ours
            if cur and cur.get("owner") == self.node_id:
                self.epoch = cur.get("epoch")
                return True
            return False
        return self._confirm(next_epoch)

    def _confirm(self, epoch: int) -> bool:
        cur = self._read()
        if cur and cur.get("owner") == self.node_id and cur.get("epoch") == epoch:
            self.epoch = epoch
            return True
        return False

    def renew(self) -> bool:
        """Refresh the lease; returns False (leadership lost) if the
        lease is no longer ours — the caller must stop its pipeline."""
        cur = self._read()
        if not cur or cur.get("owner") != self.node_id:
            self.epoch = None
            return False
        # rewrite-in-place via rename keeps the update atomic for readers
        tmp = self._write_tmp(cur.get("epoch", 0))
        os.replace(tmp, self.lease_path)
        self.epoch = cur.get("epoch")
        return True

    def release(self) -> None:
        """Give up leadership (only removes a lease we still own)."""
        cur = self._read()
        if cur and cur.get("owner") == self.node_id:
            try:
                os.unlink(self.lease_path)
            except FileNotFoundError:
                pass
        self.epoch = None

    # -- the reference's OnLeader contract --------------------------------

    def run_guarded(
        self,
        start_fn,
        stop_fn,
        poll_seconds: float | None = None,
        rounds: int | None = None,
    ) -> None:
        """OnLeader(true) → start, OnLeader(false) → stop
        (`src/library/binlog/binlog.go:198-215` semantics): poll the
        lease, start the pipeline on gaining it, stop on losing it.
        ``rounds`` bounds the loop for tests; production passes None."""
        poll = poll_seconds if poll_seconds is not None else self.ttl / 3.0
        leading = False
        n = 0
        try:
            while rounds is None or n < rounds:
                n += 1
                ok = self.renew() if leading else self.try_acquire()
                if ok and not leading:
                    leading = True
                    start_fn(self.epoch)
                elif not ok and leading:
                    leading = False
                    stop_fn()
                time.sleep(poll)
        finally:
            if leading:
                stop_fn()
                self.release()
