"""O22: service discovery + least-connections load balancing.

The reference registers every subscribe gateway in Consul with its live
connection count in KV (`src/services/subscribe/service.go:132-224`);
clients watch the service list and dial the server with the fewest
connections (`src/library/client/watcher.go:57-146`,
`src/library/client/tcp.go:319-344`). This module keeps the semantic —
advertise, discover fresh members, pick min-connections — against the
shared storage the deployment already has (same posture as the O20
lease), dropping the Consul dependency.

Each gateway heartbeats an ``svc-<id>.json`` (atomic tmp+rename) with
its address and connection count; entries whose mtime is older than the
TTL are dead and ignored — the file-level analog of Consul's session
TTL health checks. Tie-break on the lowest (host, port) keeps selection
deterministic. Kafka consumer groups remain the recommended fan-out at
cluster scale (SURVEY §2a O22); this covers the reference's native
push-TCP topology.
"""

from __future__ import annotations

import json
import os
import tempfile
import time


class ServiceRegistry:
    """Directory-backed service registry with TTL liveness."""

    def __init__(self, root: str, ttl_seconds: float = 10.0):
        self.root = root
        self.ttl = float(ttl_seconds)
        os.makedirs(root, exist_ok=True)

    def _path(self, service_id: str) -> str:
        return os.path.join(self.root, f"svc-{service_id}.json")

    def advertise(
        self, service_id: str, host: str, port: int, connections: int
    ) -> None:
        """Publish/refresh one gateway's entry (atomic replace — readers
        never see a torn file; the rename also bumps mtime = heartbeat).
        """
        fd, tmp = tempfile.mkstemp(prefix=".svc.", dir=self.root)
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {
                        "service_id": service_id,
                        "host": host,
                        "port": port,
                        "connections": connections,
                    },
                    f,
                )
            # mkstemp creates 0600; on a SHARED registry dir (gateways
            # under different service accounts) clients couldn't read
            # the entry and would silently treat a live gateway as dead
            os.chmod(tmp, 0o644)
            os.replace(tmp, self._path(service_id))
        except BaseException:
            try:
                os.unlink(tmp)  # don't accumulate orphaned temp files
            except FileNotFoundError:
                pass
            raise

    def withdraw(self, service_id: str) -> None:
        try:
            os.unlink(self._path(service_id))
        except FileNotFoundError:
            pass

    def discover(self) -> list[dict]:
        """Live members only (mtime within TTL), deterministic order."""
        out = []
        now = time.time()
        for name in sorted(os.listdir(self.root)):
            if not name.startswith("svc-") or not name.endswith(".json"):
                continue
            path = os.path.join(self.root, name)
            try:
                if now - os.stat(path).st_mtime > self.ttl:
                    continue
                with open(path) as f:
                    out.append(json.load(f))
            except (OSError, ValueError):
                continue  # torn/vanished entry = not a live member
        return out

    def pick_min_connections(self) -> dict | None:
        """The reference's LB rule (`client/tcp.go:319-344`): fewest
        connections wins; ties break on (host, port) for determinism."""
        members = self.discover()
        if not members:
            return None
        return min(
            members,
            key=lambda m: (m.get("connections", 0), m.get("host", ""), m.get("port", 0)),
        )


def advertise_subscribe_server(
    registry: ServiceRegistry, server, service_id: str | None = None
) -> str:
    """Publish a running ``SubscribeServer``'s address + live connection
    count (what the reference exports to Consul KV). Call again on a
    timer to heartbeat; returns the service id used."""
    host, port = server.address
    sid = service_id or f"{host}:{port}"
    registry.advertise(sid, host, port, len(server.members()))
    return sid


def connect_min_connections(registry: ServiceRegistry, timeout: float = 5.0):
    """Discover and dial the least-loaded gateway; returns a connected
    ``SubscribeClient`` (raises LookupError with the registry path when
    no live gateway exists — an empty registry is an operator error,
    not a silent no-op)."""
    from wing_binlog_go_spark.streaming.subscribe import SubscribeClient

    pick = registry.pick_min_connections()
    if pick is None:
        raise LookupError(f"no live subscribe gateways registered in {registry.root}")
    return SubscribeClient(pick["host"], pick["port"], timeout=timeout)
