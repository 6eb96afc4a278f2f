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

- acquire: atomic ``link(tmp, lease)`` (fails iff the lease exists).
- steal: a lease whose mtime is older than the TTL is stale. Stealing
  is made MUTUALLY EXCLUSIVE by ``rename``-ing the lease to a
  per-node tombstone first — rename is atomic, so exactly one
  contender removes the old lease and the losers fall back to the
  link race. The winner re-checks the tombstone's mtime (rename
  preserves it): if the lease was renewed between the staleness check
  and the rename, it links the tombstone straight back and withdraws.
  This closes the round-3 TOCTOU where a second stealer's unlink
  could delete the first stealer's FRESH lease and both confirmed the
  same epoch.
- confirm: after linking, the winner verifies the lease payload is
  (owner == self, epoch == claimed) AND the file's inode is the very
  inode it linked — the fencing identity is (owner, epoch, own
  write), never epoch alone.
- renew: the holder rewrites payload + mtime every ``ttl/3``. Renew
  FORFEITS (returns False) if the lease is missing, owned by someone
  else, carries a different epoch than this holder acquired, or has
  already gone stale — a stale lease may be mid-steal, so rewriting
  it could clobber the new leader (the round-3 renew TOCTOU).
- fencing: every acquisition increments a monotonic epoch persisted in
  the lease payload (the steal path re-reads it from the tombstone
  AFTER winning the rename, so the increment is over the true latest
  value). Downstream writers that record (owner, epoch) can reject a
  zombie leader's writes (the classic fencing-token pattern); the
  bucketed-upsert manifest is the natural place to stamp it.

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
        # Highest epoch this node has ever OBSERVED (its own or read
        # from any lease). Minting uses max(observed-now, seen) + 1, so
        # a contender that happens to read the path during another
        # stealer's rename→link gap (lease momentarily absent) cannot
        # regress the fencing token to 1. A brand-new process in that
        # exact gap still can — the residual window the module
        # docstring's honest-limits paragraph covers.
        self._seen_epoch = 0

    # -- internals --------------------------------------------------------

    def _read(self) -> dict | None:
        try:
            with open(self.lease_path) as f:
                cur = json.load(f)
        except (OSError, ValueError):
            return None
        if not isinstance(cur, dict):
            # valid JSON that is not an object (external corruption or a
            # mis-pointed lease_path) must read as "no lease", not leak
            # into every caller's .get() as an AttributeError that kills
            # the election loop
            return None
        self._seen_epoch = max(self._seen_epoch, cur.get("epoch", 0))
        return cur

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
            # Record the inode of OUR write: link shares the tmp's inode,
            # so _confirm can verify the surviving file is the very one
            # we created, not a same-(owner, epoch) lookalike.
            self._last_ino = os.stat(tmp).st_ino
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
        if age is None:
            # no lease on disk — contend for it via the atomic link;
            # _seen_epoch floors the mint against the momentarily-empty
            # path of a concurrent steal
            next_epoch = max(cur.get("epoch", 0) if cur else 0, self._seen_epoch) + 1
            if self._try_link(next_epoch):
                return self._confirm(next_epoch)
            return False  # lost the race; follower this round
        if age <= self.ttl:
            # fresh lease: leader iff it is already ours (same owner AND,
            # if we think we hold it, the same epoch we acquired)
            if (
                cur
                and cur.get("owner") == self.node_id
                and (self.epoch is None or cur.get("epoch") == self.epoch)
            ):
                self.epoch = cur.get("epoch")
                return True
            return False
        # Stale: steal, exclusively. rename is atomic — exactly one
        # contender moves the old lease aside; everyone else sees
        # FileNotFoundError and retries next poll (by then the winner's
        # fresh lease blocks them).
        tomb = f"{self.lease_path}.tomb.{os.getpid()}.{id(self)}"
        try:
            os.rename(self.lease_path, tomb)
        except OSError:
            return False
        try:
            try:
                t_age = time.time() - os.stat(tomb).st_mtime
                with open(tomb) as f:
                    prev = json.load(f)
                if not isinstance(prev, dict):
                    prev = None  # non-object JSON: corrupt, treat as none
            except (OSError, ValueError):
                prev, t_age = None, None
            if t_age is not None and t_age <= self.ttl:
                # The lease was renewed between our staleness check and
                # the rename — we grabbed a LIVE leader's lease. Put it
                # back (link restores the original inode+mtime); if a
                # contender linked a new lease in the gap, the displaced
                # holder's next renew() detects the loss via the epoch
                # check and steps down.
                try:
                    os.link(tomb, self.lease_path)
                except FileExistsError:
                    pass
                return False
            # Epoch increments over the TRUE latest value (read from the
            # tombstone we exclusively own), not a pre-rename snapshot —
            # two sequential stealers can never mint the same epoch.
            prev_epoch = prev.get("epoch", 0) if prev else 0
            self._seen_epoch = max(self._seen_epoch, prev_epoch)
            next_epoch = max(prev_epoch, self._seen_epoch) + 1
        finally:
            try:
                os.unlink(tomb)
            except FileNotFoundError:
                pass
        if self._try_link(next_epoch):
            return self._confirm(next_epoch)
        return False

    def _confirm(self, epoch: int) -> bool:
        cur = self._read()
        try:
            ino = os.stat(self.lease_path).st_ino
        except OSError:
            return False
        if (
            cur
            and cur.get("owner") == self.node_id
            and cur.get("epoch") == epoch
            and ino == getattr(self, "_last_ino", None)
        ):
            self.epoch = epoch
            return True
        return False

    def renew(self) -> bool:
        """Refresh the lease; returns False (leadership lost) if the
        lease is no longer ours — the caller must stop its pipeline."""
        cur = self._read()
        age = self._age()
        if (
            not cur
            or cur.get("owner") != self.node_id
            or (self.epoch is not None and cur.get("epoch") != self.epoch)
            or age is None
            or age > self.ttl
        ):
            # Missing, stolen (owner/epoch moved on), or already stale.
            # A stale lease may be mid-steal by another node; rewriting
            # it could clobber the new leader — forfeit instead and let
            # the caller stop the pipeline.
            self.epoch = None
            return False
        # rewrite-in-place via rename keeps the update atomic for readers
        tmp = self._write_tmp(cur.get("epoch", 0))
        ino = os.stat(tmp).st_ino
        os.replace(tmp, self.lease_path)
        self._last_ino = ino
        self.epoch = cur.get("epoch")
        return True

    def release(self) -> None:
        """Give up leadership (only removes a lease we still own, at the
        epoch we acquired — a zombie's release must not clobber the new
        leader's lease).

        ATOMIC via the steal path's rename trick: a plain check-then-
        unlink races a concurrent steal (zombie reads its own stale
        lease, new leader replaces it, zombie unlinks the NEW lease →
        two actives). Renaming to a private tombstone takes the file
        exclusively; the content check then runs on what we actually
        took, and a lease that turns out not to be ours is restored by
        re-link (same residual as the steal path: a contender linking
        into the momentarily-empty window displaces the holder, who
        steps down on its next renew's epoch check)."""
        tomb = f"{self.lease_path}.tomb.{os.getpid()}.{id(self)}"
        try:
            os.rename(self.lease_path, tomb)
        except OSError:
            self.epoch = None
            return
        try:
            try:
                with open(tomb) as f:
                    cur = json.load(f)
            except (OSError, ValueError):
                cur = None
            ours = (
                isinstance(cur, dict)
                and cur.get("owner") == self.node_id
                and (self.epoch is None or cur.get("epoch") == self.epoch)
            )
            if not ours:
                try:
                    os.link(tomb, self.lease_path)  # not ours: put it back
                except FileExistsError:
                    pass
        finally:
            try:
                os.unlink(tomb)
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
