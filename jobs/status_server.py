"""Read-only HTTP status server — the cdc server's status API over the
engine's file-backed state (cdc/http_status.go:50-56 route table,
re-expressed; every write/admin route stays on the CLI, jobs/
changefeed_ctl.py, exactly like `cdc cli` wraps the same state).

Endpoints (all GET, all JSON):

  /status                          — server identity {version, id, pid,
                                     is_owner} (http_status.go:94-100
                                     `status` struct)
  /capture/owner/changefeed/query?id=<feed>
                                   — one changefeed's registry info
                                     (http_status.go:56 handleChangefeedQuery)
  /changefeeds                     — `changefeed list` analog
  /captures                        — capture list from the scheduler state
                                     (cmd/client_capture.go:34-57)
  /processors                      — processor list (capture, table) pairs
  /processors/<capture>            — per-table replication positions
                                     (processor query; reads each lake
                                     table's own manifest)
  /debug/info                      — plain-text dump of every stored
                                     (key, value) pair (handleDebugInfo +
                                     writeEtcdInfo, http_status.go:114-134)
  /health                          — 200 {"ok": true} liveness probe

State sources: --admin-dir (FeedRegistry json files) and/or
--scheduler-state (TableScheduler state file). Both optional — endpoints
over absent state return 404 with a reason. No Spark session is ever
created (the same Spark-free reads the CLI uses).

    python jobs/status_server.py --admin-dir /state/admin \
        --scheduler-state /state/sched.json --port 8300
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VERSION = "ticdc-spark-0.4"


def _routes(admin_dir: str | None, scheduler_state: str | None):
    """Build the route table as pure functions path → (code, payload)."""
    from ticdc_spark.streaming.admin import FeedRegistry
    from ticdc_spark.streaming.scheduler import (
        capture_list,
        processor_list,
        processor_query,
    )

    def need(what: str):
        return 404, {"error": f"{what} not configured on this server"}

    def status(_q):
        return 200, {
            "version": VERSION,
            "git_hash": "",
            "id": "status-server",
            "pid": os.getpid(),
            # single-owner deployment: whoever serves status IS the owner's
            # state reader (etcd election is out of scope, SURVEY §2.11)
            "is_owner": True,
        }

    def health(_q):
        return 200, {"ok": True}

    def changefeeds(_q):
        if not admin_dir:
            return need("--admin-dir")
        return 200, FeedRegistry(admin_dir).list()

    def changefeed_query(q):
        if not admin_dir:
            return need("--admin-dir")
        feed = (q.get("id") or [None])[0]
        if not feed:
            return 400, {"error": "missing ?id=<changefeed>"}
        info = FeedRegistry(admin_dir).query(feed)
        if info is None:
            return 404, {"error": f"changefeed {feed!r} not found"}
        return 200, info

    def captures(_q):
        if not scheduler_state:
            return need("--scheduler-state")
        try:
            return 200, capture_list(scheduler_state)
        except (OSError, KeyError) as e:
            return 404, {"error": str(e)}

    def processors(_q):
        if not scheduler_state:
            return need("--scheduler-state")
        try:
            return 200, processor_list(scheduler_state)
        except (OSError, KeyError) as e:
            return 404, {"error": str(e)}

    def processor_one(capture_id):
        def run(q):
            if not scheduler_state:
                return need("--scheduler-state")
            table = (q.get("table") or [None])[0]
            try:
                return 200, processor_query(scheduler_state, capture_id, table=table)
            except (OSError, KeyError) as e:
                return 404, {"error": str(e)}

        return run

    def debug_info(_q):
        # plain-text (key, value) dump like writeEtcdInfo
        lines = []
        if admin_dir and os.path.isdir(admin_dir):
            for path, info in FeedRegistry(admin_dir).dump_metadata():
                lines.append(f"{path}\n\t{json.dumps(info, sort_keys=True)}\n")
        if scheduler_state and os.path.exists(scheduler_state):
            with open(scheduler_state) as f:
                lines.append(
                    f"{scheduler_state}\n\t{json.dumps(json.load(f), sort_keys=True)}\n"
                )
        return 200, "\n".join(lines) or "no state configured\n"

    return {
        "/status": status,
        "/health": health,
        "/changefeeds": changefeeds,
        "/capture/owner/changefeed/query": changefeed_query,
        "/captures": captures,
        "/processors": processors,
        "/debug/info": debug_info,
    }, processor_one


def make_server(
    admin_dir: str | None, scheduler_state: str | None, port: int = 0
) -> ThreadingHTTPServer:
    routes, processor_one = _routes(admin_dir, scheduler_state)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def do_GET(self):
            u = urlparse(self.path)
            q = parse_qs(u.query)
            fn = routes.get(u.path)
            if fn is None and u.path.startswith("/processors/"):
                fn = processor_one(u.path.split("/processors/", 1)[1])
            if fn is None:
                self._send(404, {"error": f"no route {u.path!r}"})
                return
            try:
                code, payload = fn(q)
            except Exception as e:  # pragma: no cover - defensive
                code, payload = 500, {"error": f"{type(e).__name__}: {e}"}
            self._send(code, payload)

        def _send(self, code, payload):
            text = isinstance(payload, str)
            body = (payload if text else json.dumps(payload, sort_keys=True)).encode()
            self.send_response(code)
            self.send_header(
                "Content-Type", "text/plain" if text else "application/json"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def serve_background(
    admin_dir: str | None, scheduler_state: str | None, port: int = 0
):
    """Start in a daemon thread; returns (server, bound_port) — the test/
    embedding surface."""
    srv = make_server(admin_dir, scheduler_state, port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--admin-dir", default=None)
    p.add_argument("--scheduler-state", default=None)
    p.add_argument("--port", type=int, default=8300)
    args = p.parse_args()
    srv = make_server(args.admin_dir, args.scheduler_state, args.port)
    print(
        json.dumps(
            {"listening": srv.server_address[1], "pid": os.getpid()},
            sort_keys=True,
        ),
        flush=True,
    )
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
