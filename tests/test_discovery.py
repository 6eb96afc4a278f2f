"""O22 discovery/LB: advertise + TTL liveness + least-connections pick,
end-to-end against real subscribe gateways."""

from __future__ import annotations

import os
import time

import pytest

from wing_binlog_go_spark.streaming.discovery import (
    ServiceRegistry,
    advertise_subscribe_server,
    connect_min_connections,
)


def test_pick_min_connections_with_ttl_and_ties(tmp_path):
    reg = ServiceRegistry(str(tmp_path), ttl_seconds=5)
    reg.advertise("a", "hostA", 7001, connections=2)
    reg.advertise("b", "hostB", 7002, connections=0)
    reg.advertise("c", "hostC", 7003, connections=5)
    assert reg.pick_min_connections()["service_id"] == "b"
    # b dies: its heartbeat goes stale -> excluded from discovery
    stale = time.time() - 60
    os.utime(os.path.join(str(tmp_path), "svc-b.json"), (stale, stale))
    assert [m["service_id"] for m in reg.discover()] == ["a", "c"]
    assert reg.pick_min_connections()["service_id"] == "a"
    # tie at equal connections: deterministic (host, port) order
    reg.advertise("d", "hostA", 6000, connections=2)
    assert reg.pick_min_connections()["service_id"] == "d"
    reg.withdraw("d")
    assert reg.pick_min_connections()["service_id"] == "a"


def test_empty_registry_fails_loudly(tmp_path):
    reg = ServiceRegistry(str(tmp_path))
    assert reg.pick_min_connections() is None
    with pytest.raises(LookupError):
        connect_min_connections(reg)


def test_client_dials_least_loaded_gateway(tmp_path):
    from wing_binlog_go_spark.streaming.subscribe import (
        SubscribeClient,
        SubscribeServer,
    )

    busy = SubscribeServer()
    idle = SubscribeServer()
    pin = None
    try:
        # one client pins the busy gateway
        pin = SubscribeClient(*busy.address)
        pin.subscribe("db\\..*")
        deadline = time.time() + 5
        while not busy.members() and time.time() < deadline:
            time.sleep(0.05)
        assert busy.members()

        reg = ServiceRegistry(str(tmp_path))
        advertise_subscribe_server(reg, busy)
        advertise_subscribe_server(reg, idle)

        cli = connect_min_connections(reg)
        try:
            cli.subscribe("db\\..*")
            deadline = time.time() + 5
            while not idle.members() and time.time() < deadline:
                time.sleep(0.05)
            # the new client landed on the idle gateway
            assert len(idle.members()) == 1
            assert len(busy.members()) == 1
        finally:
            cli.close()
    finally:
        if pin is not None:
            pin.close()
        busy.close()
        idle.close()
