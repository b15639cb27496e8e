"""Tests for the hf-hub-equivalent weight fetch (birefnet_tpu/hub.py).

The real endpoint (huggingface.co) is unreachable in this environment, so
the full download path — including Range resume and cache reuse — is
exercised against a local HTTP server, matching the reference's contract
(reference: examples/infer_image.rs:30-32: fetch once, cached after).
"""

import http.server
import os
import threading

import pytest

from birefnet_tpu import hub

PAYLOAD = os.urandom(3 << 20)  # 3 MiB, spans multiple chunks


class _RangeHandler(http.server.BaseHTTPRequestHandler):
    hits = 0

    def do_GET(self):
        type(self).hits += 1
        rng = self.headers.get("Range")
        if rng:
            start = int(rng.split("=")[1].rstrip("-"))
            body = PAYLOAD[start:]
            self.send_response(206)
        else:
            body = PAYLOAD
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    httpd = http.server.HTTPServer(("127.0.0.1", 0), _RangeHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    _RangeHandler.hits = 0
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_download_and_cache_layout(tmp_path, server):
    path = hub.download("Org/Repo", "model.safetensors", root=str(tmp_path),
                        endpoint=server, progress=False)
    # hf-hub cache layout (reference: examples/bench_inference.rs:19-20)
    assert "models--Org--Repo" in path and "snapshots" in path
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD
    assert hub.cached_file("Org/Repo", "model.safetensors",
                           root=str(tmp_path)) == path


def test_second_call_uses_cache(tmp_path, server):
    hub.download("Org/Repo", "model.safetensors", root=str(tmp_path),
                 endpoint=server, progress=False)
    hits = _RangeHandler.hits
    p2 = hub.download("Org/Repo", "model.safetensors", root=str(tmp_path),
                      endpoint=server, progress=False)
    assert _RangeHandler.hits == hits  # no new network traffic
    with open(p2, "rb") as f:
        assert f.read() == PAYLOAD


def test_resume_from_partial(tmp_path, server):
    snap = os.path.join(hub.cache_dir("Org/Repo", str(tmp_path)),
                        "snapshots", "main")
    os.makedirs(snap)
    with open(os.path.join(snap, "model.safetensors.partial"), "wb") as f:
        f.write(PAYLOAD[: 1 << 20])  # first 1 MiB already fetched
    path = hub.download("Org/Repo", "model.safetensors", root=str(tmp_path),
                        endpoint=server, progress=False)
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD
    assert not os.path.exists(os.path.join(snap, "model.safetensors.partial"))


def test_offline_raises_actionable_error(tmp_path):
    with pytest.raises(hub.HubUnavailableError, match="--checkpoint"):
        hub.download("Org/Repo", "model.safetensors", root=str(tmp_path),
                     endpoint="http://127.0.0.1:9", progress=False)
