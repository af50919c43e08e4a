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
