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
