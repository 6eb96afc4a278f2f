"""Subscribe to the TCP push gateway — the engine-side equivalent of the
reference's `examples/subscribe.go` / `examples/Client.php` demos.

Run a pipeline with a gateway route somewhere (see
`examples/cdc_pipeline.py`), then:

    python examples/subscribe_client.py HOST PORT 'mydb\\..*'

Prints each envelope JSON as it is pushed. Topics are regexes over
`database.table` (empty = everything), exactly the reference's
CMD_SET_PRO semantics.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from wing_binlog_go_spark.streaming.subscribe import CMD_EVENT, SubscribeClient


def main() -> None:
    host = sys.argv[1] if len(sys.argv) > 1 else "127.0.0.1"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 9998
    topic = sys.argv[3] if len(sys.argv) > 3 else ""
    cli = SubscribeClient(host, port)
    try:
        if topic:
            cli.subscribe(topic)
        print(f"subscribed to {topic or '<all>'} on {host}:{port}", file=sys.stderr)
        while True:
            cmd, payload = cli.recv_frame(timeout=60.0)
            if cmd == CMD_EVENT and payload:
                print(json.dumps(json.loads(payload)))
    finally:
        cli.close()


if __name__ == "__main__":
    main()
