"""Read-only HTTP status server (jobs/status_server.py) — the
cdc/http_status.go:50-56 route table over file-backed state. Spark-free."""

import json
import urllib.request

import pytest

from jobs.status_server import serve_background
from ticdc_spark.streaming.admin import FeedRegistry


@pytest.fixture()
def server(tmp_path):
    admin = str(tmp_path / "admin")
    reg = FeedRegistry(admin)
    reg.create("feed-a", start_ts=100, check_gc_safe_point=False,
               sink_uri="lake:///tmp/a")
    reg.create("feed-b", check_gc_safe_point=False)
    reg.pause("feed-b", error="operator pause")
    state = str(tmp_path / "sched.json")
    with open(state, "w") as f:
        json.dump({"jobs": [], "captures": {"c1": {}}}, f)
    srv, port = serve_background(admin, state)
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, r.read().decode(), r.headers.get("Content-Type")


def test_status_and_health(server):
    code, body, ct = _get(server + "/status")
    assert code == 200 and ct == "application/json"
    st = json.loads(body)
    assert st["is_owner"] is True and st["pid"] > 0 and "version" in st
    code, body, _ = _get(server + "/health")
    assert code == 200 and json.loads(body) == {"ok": True}


def test_changefeed_list_and_query(server):
    code, body, _ = _get(server + "/changefeeds")
    assert code == 200
    feeds = {f["feed"]: f for f in json.loads(body)}
    assert set(feeds) == {"feed-a", "feed-b"}
    assert feeds["feed-b"]["state"] == "stopped"
    code, body, _ = _get(server + "/capture/owner/changefeed/query?id=feed-a")
    assert code == 200
    assert json.loads(body)["config"]["start_ts"] == 100 or json.loads(body).get("start_ts") == 100


def test_query_errors(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/capture/owner/changefeed/query?id=nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/capture/owner/changefeed/query")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/no/such/route")
    assert e.value.code == 404


def test_captures_and_debug_info(server):
    code, body, _ = _get(server + "/captures")
    assert code == 200
    assert [c["id"] for c in json.loads(body)] == ["c1"]
    code, body, ct = _get(server + "/debug/info")
    assert code == 200 and ct == "text/plain"
    assert "feed-a" in body and "sched.json" in body


def test_unconfigured_state_is_404(tmp_path):
    srv, port = serve_background(None, None)
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"http://127.0.0.1:{port}/changefeeds")
        assert e.value.code == 404
        code, _, _ = _get(f"http://127.0.0.1:{port}/health")
        assert code == 200
    finally:
        srv.shutdown()
