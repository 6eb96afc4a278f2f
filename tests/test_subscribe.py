"""TCP pub/sub gateway (O17) + keepalive (O24) + control wire form (O23).

Covers the r2 verdict's top gap: FrameParser vs hand-packed frames
(including partial feeds, unknown commands, and hostile length fields),
a real localhost-socket e2e (changelog source → pipeline →
subscribe_route_writer → SubscribeClient), the SET_PRO handshake, topic
filtering, event_index ordering, TICK keepalive, FlagPing probe,
stalled-client eviction, and the framed-TCP control endpoint.
"""

from __future__ import annotations

import json
import socket
import time

import pytest

from wing_binlog_go_spark.sources.changelog import (
    fixture_records,
    write_fixture_changelog,
)
from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
from wing_binlog_go_spark.streaming.subscribe import (
    CMD_ERROR,
    CMD_EVENT,
    CMD_RELOAD,
    CMD_SET_PRO,
    CMD_SHOW_MEMBERS,
    CMD_STOP,
    CMD_TICK,
    FLAG_PING,
    FLAG_SET_PRO,
    MAX_FRAME_LEN,
    ControlTcpServer,
    FrameError,
    FrameParser,
    SubscribeClient,
    SubscribeServer,
    pack,
)
from tests.streamwait import await_done


# ---------------------------------------------------------------------------
# wire format / parser units
# ---------------------------------------------------------------------------


def test_pack_is_byte_exact_vs_reference_layout():
    # library/service/util.go:24-38: 4B LE len(payload)+2, 2B LE cmd
    assert pack(CMD_EVENT, b"abc") == b"\x05\x00\x00\x00\x04\x00abc"
    assert pack(CMD_TICK, b"ok") == b"\x04\x00\x00\x00\x03\x00ok"
    assert pack(CMD_SET_PRO, b"") == b"\x02\x00\x00\x00\x00\x00"


def test_frame_parser_roundtrip_incremental_and_batched():
    frames = [
        (CMD_SET_PRO, bytes([FLAG_SET_PRO]) + b"db\\.t1"),
        (CMD_EVENT, b'{"x": 1}'),
        (CMD_TICK, b""),
    ]
    wire = b"".join(pack(c, p) for c, p in frames)
    # byte-at-a-time: partial frames stay buffered, order preserved
    p = FrameParser()
    got = []
    for i in range(len(wire)):
        got.extend(p.feed(wire[i : i + 1]))
    assert got == frames
    # all-at-once
    p2 = FrameParser()
    assert p2.feed(wire) == frames


def test_frame_parser_unknown_cmd_discards_buffer():
    # node.go:146: unknown command reports and resets the recv buffer —
    # bytes after it in the same read are dropped with it
    wire = pack(99, b"???") + pack(CMD_TICK, b"")
    p = FrameParser()
    assert p.feed(wire) == [(99, None)]
    # parser still usable for the NEXT read
    assert p.feed(pack(CMD_TICK, b"")) == [(CMD_TICK, b"")]


def test_frame_parser_rejects_hostile_lengths():
    # clen < 2 can't hold the cmd bytes: consuming them would
    # desynchronize every later frame
    p = FrameParser()
    with pytest.raises(FrameError):
        p.feed((0).to_bytes(4, "little") + b"\x03\x00extra")
    # clen=1 likewise
    p = FrameParser()
    with pytest.raises(FrameError):
        p.feed((1).to_bytes(4, "little") + b"\x03\x00")
    # a ~4 GiB declared length must NOT buffer unboundedly
    p = FrameParser()
    with pytest.raises(FrameError):
        p.feed((MAX_FRAME_LEN + 1).to_bytes(4, "little"))
    # boundary: exactly MAX_FRAME_LEN is accepted (stays buffered)
    p = FrameParser()
    assert p.feed(MAX_FRAME_LEN.to_bytes(4, "little") + b"\x04\x00") == []


def test_server_closes_connection_on_protocol_violation():
    server = SubscribeServer()
    try:
        with socket.create_connection(server.address, timeout=5) as s:
            s.sendall((0).to_bytes(4, "little") + b"\x00\x00")
            s.settimeout(5)
            assert s.recv(1024) == b""  # server hung up
        deadline = time.monotonic() + 5
        while server.members() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert server.members() == []
    finally:
        server.close()


# ---------------------------------------------------------------------------
# handshake / keepalive / ping over a real socket
# ---------------------------------------------------------------------------


def test_set_pro_handshake_registers_topic_and_acks():
    server = SubscribeServer()
    try:
        client = SubscribeClient(*server.address)
        client.subscribe("FIXTURES\\.cdc_typed_all")  # lowercased server-side
        deadline = time.monotonic() + 5
        while not server.members() and time.monotonic() < deadline:
            time.sleep(0.02)
        members = server.members()
        assert len(members) == 1
        assert members[0]["topics"] == ["fixtures\\.cdc_typed_all"]
        # duplicate subscribe acks but doesn't duplicate the topic
        client.subscribe("fixtures\\.cdc_typed_all")
        assert server.members()[0]["topics"] == ["fixtures\\.cdc_typed_all"]
        client.close()
    finally:
        server.close()


def test_keepalive_tick_broadcast_and_echo():
    server = SubscribeServer(keepalive_sec=0.3)
    try:
        client = SubscribeClient(*server.address)
        # broadcast TICK arrives within the keepalive period regardless
        # of any subscription (tcp.go:230-245)
        cmd, payload = client.recv_frame(timeout=3)
        assert (cmd, payload) == (CMD_TICK, b"ok")
        # client-initiated CMD_TICK echoes the same frame back
        client.tick()
        deadline = time.monotonic() + 5
        saw_echo = 0
        while time.monotonic() < deadline and saw_echo < 2:
            cmd, payload = client.recv_frame(timeout=5)
            assert (cmd, payload) == (CMD_TICK, b"ok")
            saw_echo += 1
        assert saw_echo == 2
        client.close()
    finally:
        server.close()


def test_flag_ping_acks_then_closes():
    server = SubscribeServer()
    try:
        client = SubscribeClient(*server.address)
        assert client.ping() is True
        # node.go:113-168 semantics: after the ack the server hangs up
        with pytest.raises((ConnectionError, OSError)):
            client.recv_frame(timeout=5)
        client.close()
        deadline = time.monotonic() + 5
        while server.members() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert server.members() == []
    finally:
        server.close()


def test_empty_set_pro_payload_closes_connection():
    server = SubscribeServer()
    try:
        with socket.create_connection(server.address, timeout=5) as s:
            s.sendall(pack(CMD_SET_PRO, b""))
            s.settimeout(5)
            assert s.recv(1024) == b""
    finally:
        server.close()


def test_unsupported_cmd_gets_error_frame():
    server = SubscribeServer()
    try:
        client = SubscribeClient(*server.address)
        client.sock.sendall(pack(CMD_AUTH_LIKE := 1, b"whatever"))
        cmd, payload = client._recv_skipping_ticks()
        assert cmd == CMD_ERROR
        assert b"does not support cmd: 1" in payload
        client.close()
    finally:
        server.close()


# ---------------------------------------------------------------------------
# e2e: changelog source → pipeline → gateway → clients
# ---------------------------------------------------------------------------


def test_pipeline_to_subscribers_end_to_end(spark, tmp_path):
    """The reference's binlog→subscribe hand-off (handler.go:83 →
    subscribe/tcp.go:118): a topic-filtered client receives exactly its
    tables' events, in event_index order; an unfiltered client receives
    everything; both keep receiving TICKs."""
    log_dir = tmp_path / "log"
    write_fixture_changelog(str(log_dir), split_files=False)
    server = SubscribeServer(keepalive_sec=0.5)
    try:
        filtered = SubscribeClient(*server.address)
        filtered.subscribe(r"^fixtures\.cdc_typed_all$")
        firehose = SubscribeClient(*server.address)  # no topics ⇒ all

        from wing_binlog_go_spark.streaming.subscribe import (
            subscribe_route_writer,
        )

        q = run_pipeline(
            spark,
            str(log_dir),
            [Route("tcp", subscribe_route_writer(server))],
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        await_done(q)
        n_all = len(fixture_records())
        all_events = [json.loads(p) for p in firehose.events(n_all, timeout=30)]
        assert len(all_events) == n_all
        # binlog order per connection (O10/O19)
        idx = [e["event_index"] for e in all_events]
        assert idx == sorted(idx)
        # reference envelope wire shape rides through intact
        assert {"database", "table", "event_type", "time", "event_index", "event"} <= set(
            all_events[0]
        )

        want = [e for e in all_events if e["table"] == "cdc_typed_all"]
        assert want, "fixture must exercise the filtered table"
        got = [json.loads(p) for p in filtered.events(len(want), timeout=30)]
        assert [e["event_index"] for e in got] == [e["event_index"] for e in want]
        assert {e["table"] for e in got} == {"cdc_typed_all"}

        filtered.close()
        firehose.close()
    finally:
        server.close()


def test_stalled_client_is_evicted_not_blocking_the_batch():
    """Backpressure divergence (documented): a client that stops reading
    fills its bounded queue; the producer blocks at most full_timeout
    and then evicts it — the micro-batch never stalls indefinitely
    (the reference busy-waits the producer; node.go:77-92)."""
    server = SubscribeServer(
        max_send_queue=2, full_timeout=0.2, write_timeout=0.5
    )
    try:
        stalled = socket.create_connection(server.address, timeout=5)
        # shrink receive buffer so the OS absorbs little on the dead side
        stalled.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        deadline = time.monotonic() + 5
        while not server.members() and time.monotonic() < deadline:
            time.sleep(0.02)
        assert len(server.members()) == 1

        payload = b"x" * (1 << 20)  # 1 MiB events overwhelm the buffers
        t0 = time.monotonic()
        for _ in range(40):
            server.send_all("db.t", payload)
            if not server.members():
                break
        elapsed = time.monotonic() - t0
        deadline = time.monotonic() + 10
        while server.members() and time.monotonic() < deadline:
            time.sleep(0.05)
        assert server.members() == [], "stalled client must be evicted"
        # the producer was never wedged: bounded by queue×timeout plus
        # slack, nowhere near the reference's unbounded busy-wait
        assert elapsed < 30
        stalled.close()
    finally:
        server.close()


# ---------------------------------------------------------------------------
# control endpoint (O23 wire form)
# ---------------------------------------------------------------------------


def test_control_tcp_stop_reload_members_tick_and_unknown():
    calls = {"stop": 0, "reload": []}

    def do_stop():
        calls["stop"] += 1

    def do_reload(arg: str):
        calls["reload"].append(arg)

    srv = ControlTcpServer(
        stop=do_stop,
        reload=do_reload,
        show_members=lambda: json.dumps([{"id": "q1", "is_active": True}]),
    )
    try:
        with socket.create_connection(srv.address, timeout=5) as s:
            parser = FrameParser()

            def rpc(cmd, payload=b""):
                s.sendall(pack(cmd, payload))
                while True:
                    data = s.recv(4096)
                    assert data, "control server hung up unexpectedly"
                    frames = parser.feed(data)
                    if frames:
                        return frames[0]

            assert rpc(CMD_TICK) == (CMD_TICK, b"ok")
            assert rpc(CMD_STOP) == (CMD_STOP, b"ok")
            assert calls["stop"] == 1
            assert rpc(CMD_RELOAD, b"kafka") == (CMD_RELOAD, b"ok")
            assert calls["reload"] == ["kafka"]
            cmd, payload = rpc(CMD_SHOW_MEMBERS)
            assert cmd == CMD_SHOW_MEMBERS
            assert json.loads(payload) == [{"id": "q1", "is_active": True}]
            cmd, payload = rpc(CMD_EVENT)  # not a control command
            assert cmd == CMD_ERROR and b"does not support" in payload
    finally:
        srv.close()


def test_chaos_stalled_set_pro_subscriber_under_event_flood():
    """Chaos composition (r3 verdict #7): a subscriber completes the
    SET_PRO handshake and then stalls (never reads again) while 20k
    events flow. Eviction (bounded queue + full_timeout) must shed the
    dead connection WITHOUT costing the live subscriber anything: the
    live client receives every event in order, stays the only member,
    and the server still answers its CMD_TICK echo within the
    keepalive period."""
    import threading

    # queue/timeout sized so the STALLED side still must evict (it never
    # reads: 2000 × 2 KiB ≈ 4 MB of queue + kernel buffers << 40 MB of
    # flood) while the LIVE side tolerates ~1 s scheduler stalls — this
    # box runs noisy co-tenants, and at 500/0.2 s a GIL-starved drain
    # thread got itself evicted under load (flaked in the r6 full run,
    # passed in isolation)
    server = SubscribeServer(
        keepalive_sec=0.5, max_send_queue=2000, full_timeout=1.0, write_timeout=0.5
    )
    n_events = 20_000
    try:
        host, port = server.address
        # stalled subscriber: real handshake, then silence
        stalled = SubscribeClient(host, port)
        stalled.subscribe(r"db\.t")
        stalled.sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)

        live = SubscribeClient(host, port)
        live.subscribe(r"db\.t")
        got: list[bytes] = []
        err: list[BaseException] = []

        def drain():
            try:
                got.extend(live.events(n_events, timeout=60))
            except BaseException as e:  # surfaced in the main thread
                err.append(e)

        t = threading.Thread(target=drain, daemon=True)
        t.start()
        assert len(server.members()) == 2

        # ~2 KiB payloads: 20k × 2 KiB ≈ 40 MB — far past what kernel
        # socket buffers can absorb for the stalled side, so its bounded
        # queue genuinely fills and eviction MUST fire
        t0 = time.monotonic()
        for i in range(n_events):
            server.send_all("db.t", b"%d|" % i + b"x" * 2048)
        publish_sec = time.monotonic() - t0
        t.join(60)
        assert not err, err
        # every event delivered to the live client, in publish order
        assert len(got) == n_events
        assert [int(p.split(b"|")[0]) for p in got[:100]] == list(range(100))
        assert int(got[-1].split(b"|")[0]) == n_events - 1

        # the stalled connection was evicted; the live one remains
        deadline = time.monotonic() + 10
        while len(server.members()) > 1 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert len(server.members()) == 1

        # responsiveness: TICK echo round-trips within the keepalive
        # period even right after the flood
        live.tick()
        t1 = time.monotonic()
        cmd, payload = live.recv_frame(timeout=server.keepalive_sec + 1)
        rtt = time.monotonic() - t1
        assert cmd == CMD_TICK and payload == b"ok"
        assert rtt < server.keepalive_sec + 1
        # eviction kept the publisher loop bounded: the flood cost at
        # most ~queue x full_timeout extra, not a per-event stall
        assert publish_sec < 30
        live.close()
        stalled.close()
    finally:
        server.close()


def test_passive_subscriber_survives_past_write_timeout():
    """A client that subscribes and then only RECEIVES (never sends —
    ticking is optional) must not be evicted when the socket-wide
    timeout set for the write deadline fires on the reader's recv."""
    server = SubscribeServer(keepalive_sec=30.0, write_timeout=0.3)
    try:
        host, port = server.address
        c = SubscribeClient(host, port)
        c.subscribe(r"db\.t")
        time.sleep(1.0)  # > 3x write_timeout of pure inbound silence
        assert len(server.members()) == 1  # still connected
        server.send_all("db.t", b"after-silence")
        assert c.events(1, timeout=5) == [b"after-silence"]
        c.close()
    finally:
        server.close()


def test_subscribe_ack_survives_preceding_event_frames():
    """A just-connected client has empty topics (match-all), so a busy
    server can push CMD_EVENT frames ahead of the SET_PRO ack; the ack
    wait must buffer them for events(), not fail the subscribe."""
    server = SubscribeServer()
    try:
        host, port = server.address
        c = SubscribeClient(host, port)
        deadline = time.monotonic() + 5
        while not server.members() and time.monotonic() < deadline:
            time.sleep(0.01)  # wait for the accept to land
        server.send_all("db.t", b"early-1")
        server.send_all("db.t", b"early-2")
        time.sleep(0.2)  # let the frames reach the socket buffer
        c.subscribe(r"db\.t")  # must not raise on the queued events
        assert c.events(2, timeout=5) == [b"early-1", b"early-2"]
        server.send_all("db.t", b"later")
        assert c.events(1, timeout=5) == [b"later"]
        c.close()
    finally:
        server.close()
