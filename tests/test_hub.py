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
    ranged_hits = 0
    etag = '"payload-v1"'

    def do_GET(self):
        type(self).hits += 1
        rng = self.headers.get("Range")
        if_range = self.headers.get("If-Range")
        # RFC 7233 If-Range: honor Range only when the validator matches.
        if rng and (if_range is None or if_range == self.etag):
            type(self).ranged_hits += 1
            start = int(rng.split("=")[1].rstrip("-"))
            body = PAYLOAD[start:]
            self.send_response(206)
        else:
            body = PAYLOAD
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("ETag", self.etag)
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
    _RangeHandler.ranged_hits = 0
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


def _write_partial(tmp_path, etag=None):
    snap = os.path.join(hub.cache_dir("Org/Repo", str(tmp_path)),
                        "snapshots", "main")
    os.makedirs(snap)
    partial = os.path.join(snap, "model.safetensors.partial")
    with open(partial, "wb") as f:
        f.write(PAYLOAD[: 1 << 20])  # first 1 MiB already fetched
    if etag is not None:
        with open(partial + ".etag", "w") as f:
            f.write(etag)
    return snap


def test_resume_from_partial(tmp_path, server):
    snap = _write_partial(tmp_path, etag=_RangeHandler.etag)
    path = hub.download("Org/Repo", "model.safetensors", root=str(tmp_path),
                        endpoint=server, progress=False)
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD
    assert _RangeHandler.ranged_hits == 1  # genuinely resumed (206)
    assert not os.path.exists(os.path.join(snap, "model.safetensors.partial"))
    assert not os.path.exists(
        os.path.join(snap, "model.safetensors.partial.etag"))


def test_resume_stale_etag_restarts(tmp_path, server):
    """If the remote file changed since the partial (ETag mismatch), the
    server's If-Range answers 200 and the download restarts clean instead of
    stitching a corrupt file (round-2 advisor finding)."""
    _write_partial(tmp_path, etag='"payload-v0-outdated"')
    path = hub.download("Org/Repo", "model.safetensors", root=str(tmp_path),
                        endpoint=server, progress=False)
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD  # NOT 1MiB of old + tail of new
    assert _RangeHandler.ranged_hits == 0


def test_resume_without_validator_discards_partial(tmp_path, server):
    """A partial with no stored ETag cannot be validated: re-fetch in full."""
    _write_partial(tmp_path, etag=None)
    path = hub.download("Org/Repo", "model.safetensors", root=str(tmp_path),
                        endpoint=server, progress=False)
    with open(path, "rb") as f:
        assert f.read() == PAYLOAD
    assert _RangeHandler.ranged_hits == 0  # no Range request was trusted


def test_offline_raises_actionable_error(tmp_path):
    with pytest.raises(hub.HubUnavailableError, match="--checkpoint"):
        hub.download("Org/Repo", "model.safetensors", root=str(tmp_path),
                     endpoint="http://127.0.0.1:9", progress=False)
