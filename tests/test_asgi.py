"""ASGI adapter tests — drive the ASGI 3.0 protocol directly (no uvicorn
needed)."""
import asyncio
import json

import pytest

from recommendit_tpu.serving.asgi import make_asgi_app
from tests.test_api import make_mock_pipeline
from recommendit_tpu.serving.app import RecommendItApp


def run_request(asgi, method, path, body=None):
    sent = []
    received = [
        {"type": "http.request",
         "body": json.dumps(body).encode() if body is not None else b"",
         "more_body": False},
    ]

    async def receive():
        return received.pop(0)

    async def send(msg):
        sent.append(msg)

    scope = {"type": "http", "method": method, "path": path}
    asyncio.run(asgi(scope, receive, send))
    status = next(m["status"] for m in sent if m["type"] == "http.response.start")
    raw = b"".join(m.get("body", b"") for m in sent
                   if m["type"] == "http.response.body")
    try:
        payload = json.loads(raw)
    except json.JSONDecodeError:
        payload = raw.decode()
    return status, payload


@pytest.fixture
def asgi():
    return make_asgi_app(RecommendItApp(pipeline=make_mock_pipeline()))


class TestASGI:
    def test_health(self, asgi):
        status, body = run_request(asgi, "GET", "/health")
        assert status == 200 and body["status"] == "healthy"

    def test_recommend(self, asgi):
        status, body = run_request(asgi, "POST", "/recommend",
                                   {"user_id": 1, "k": 3})
        assert status == 200
        assert len(body["recommendations"]) == 3

    def test_invalid_json(self, asgi):
        sent = []

        async def receive():
            return {"type": "http.request", "body": b"{nope", "more_body": False}

        async def send(msg):
            sent.append(msg)

        asyncio.run(asgi({"type": "http", "method": "POST",
                          "path": "/recommend"}, receive, send))
        status = next(m["status"] for m in sent
                      if m["type"] == "http.response.start")
        assert status == 422

    def test_chunked_body(self, asgi):
        sent = []
        chunks = [
            {"type": "http.request", "body": b'{"user_id": 2', "more_body": True},
            {"type": "http.request", "body": b', "k": 2}', "more_body": False},
        ]

        async def receive():
            return chunks.pop(0)

        async def send(msg):
            sent.append(msg)

        asyncio.run(asgi({"type": "http", "method": "POST",
                          "path": "/recommend"}, receive, send))
        raw = b"".join(m.get("body", b"") for m in sent
                       if m["type"] == "http.response.body")
        assert len(json.loads(raw)["recommendations"]) == 2

    def test_lifespan(self, asgi):
        msgs = [{"type": "lifespan.startup"}, {"type": "lifespan.shutdown"}]
        sent = []

        async def receive():
            return msgs.pop(0)

        async def send(m):
            sent.append(m)

        asyncio.run(asgi({"type": "lifespan"}, receive, send))
        types = [m["type"] for m in sent]
        assert types == ["lifespan.startup.complete",
                         "lifespan.shutdown.complete"]

    def test_metrics_text(self, asgi):
        status, body = run_request(asgi, "GET", "/metrics")
        assert status == 200 and isinstance(body, str)


class TestASGIServer:
    """The asyncio HTTP/1.1 server hosting the ASGI app (the uvicorn-free
    serving topology for air-gapped images)."""

    @pytest.fixture
    def server(self, asgi):
        import socket
        import threading
        import time as _time

        from recommendit_tpu.serving.asgi_server import ASGIServer

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        srv = ASGIServer(asgi, "127.0.0.1", port, workers=8)
        t = threading.Thread(target=srv.run, daemon=True)
        t.start()
        # wait for the listener
        deadline = _time.time() + 10
        while _time.time() < deadline:
            try:
                with socket.create_connection(("127.0.0.1", port), 0.2):
                    break
            except OSError:
                _time.sleep(0.05)
        yield f"http://127.0.0.1:{port}"

    def test_health_and_recommend_over_http(self, server):
        import json as _json
        import urllib.request

        with urllib.request.urlopen(f"{server}/health", timeout=10) as r:
            assert r.status == 200
            assert _json.loads(r.read())["status"] == "healthy"
        req = urllib.request.Request(
            f"{server}/recommend",
            data=_json.dumps({"user_id": 1, "k": 3}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            body = _json.loads(r.read())
            assert len(body["recommendations"]) == 3

    def test_keep_alive_multiple_requests(self, server):
        import http.client
        import json as _json

        host = server.split("//")[1]
        conn = http.client.HTTPConnection(host, timeout=10)
        for uid in (1, 2, 3):
            conn.request(
                "POST", "/recommend",
                body=_json.dumps({"user_id": uid, "k": 2}),
                headers={"Content-Type": "application/json"},
            )
            resp = conn.getresponse()
            assert resp.status == 200
            assert _json.loads(resp.read())["user_id"] == uid
        conn.close()

    def test_validation_and_404_status(self, server):
        import json as _json
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            f"{server}/recommend",
            data=_json.dumps({"user_id": -5}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 422
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{server}/nope", timeout=10)
        assert e.value.code == 404

    def test_concurrent_clients(self, server):
        import json as _json
        import threading
        import urllib.request

        errs = []

        def hit(uid):
            try:
                req = urllib.request.Request(
                    f"{server}/recommend",
                    data=_json.dumps({"user_id": uid, "k": 2}).encode(),
                    headers={"Content-Type": "application/json"},
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=15) as r:
                    assert r.status == 200
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        ts = [threading.Thread(target=hit, args=(u + 1,)) for u in range(12)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
