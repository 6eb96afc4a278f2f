"""O16 HTTP webhook sink against a real local HTTP server: every
envelope is POSTed as JSON to every node URL, and a dead node doesn't
fail the batch (at-least-once drop semantics, http/node.go:66-75)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from wing_binlog_go_spark.functions.envelope import to_envelopes
from wing_binlog_go_spark.sources.changelog import read_changelog, write_fixture_changelog
from wing_binlog_go_spark.streaming.sinks import http_route_writer


class _Recorder(BaseHTTPRequestHandler):
    received: list = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        type(self).received.append(json.loads(body))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"ok")

    def log_message(self, *args):
        pass


def test_http_sink_posts_envelopes_and_survives_dead_node(spark, tmp_path):
    server = HTTPServer(("127.0.0.1", 0), _Recorder)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        log = tmp_path / "log"
        write_fixture_changelog(str(log), split_files=False)
        env = to_envelopes(read_changelog(spark, str(log))).coalesce(2)
        # one live node + one dead node: delivery to the live node must
        # succeed; the dead node is dropped without failing the batch
        writer = http_route_writer(
            [f"http://127.0.0.1:{port}/hook", "http://127.0.0.1:1/dead"]
        )
        writer(env, batch_id=0)
        got = _Recorder.received
        assert len(got) == env.count()
        by_index = {p["event_index"]: p for p in got}
        assert by_index[1]["event_type"] == "insert"
        assert by_index[1]["event"]["data"]["c_vchar"] == "row1"
        upd = next(p for p in got if p["event_type"] == "update")
        assert set(upd["event"]["data"]) == {"old_data", "new_data"}
    finally:
        server.shutdown()


class _SlowRecorder(BaseHTTPRequestHandler):
    received: list = []
    delay: float = 0.5

    def do_POST(self):
        import time

        body = self.rfile.read(int(self.headers["Content-Length"]))
        time.sleep(type(self).delay)
        type(self).received.append(json.loads(body))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"ok")

    def log_message(self, *args):
        pass


def test_http_sink_slow_node_does_not_serialize_batch(spark, tmp_path):
    """Reference parity (http/node.go:47-54, NumCPU+2 senders): with a
    0.5 s-per-request node, N events delivered serially would take
    N*0.5 s; the pooled sender must land well under that."""
    import time
    from http.server import ThreadingHTTPServer

    _SlowRecorder.received = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), _SlowRecorder)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        log = tmp_path / "log"
        write_fixture_changelog(str(log), split_files=False)
        env = to_envelopes(read_changelog(spark, str(log))).coalesce(1)
        n = env.count()
        assert n >= 8
        writer = http_route_writer([f"http://127.0.0.1:{port}/hook"], max_workers=8)
        start = time.monotonic()
        writer(env, batch_id=0)
        elapsed = time.monotonic() - start
        assert len(_SlowRecorder.received) == n
        # serial would be ≥ n*0.5 s of pure sleep; pooled should take
        # ~ceil(n/8)*0.5 s (+ spark overhead). Assert a comfortable bound.
        assert elapsed < n * 0.5 * 0.6, f"{elapsed=} vs serial {n * 0.5}"
    finally:
        server.shutdown()
