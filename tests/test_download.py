"""HTTP downloader (ref: common/download.cpp): resume, ETag
revalidation, retry — exercised against a loopback HTTP server with
Range/ETag support (this environment has zero egress; the protocol
machinery is what's under test)."""

import hashlib
import http.server
import json
import threading

import pytest

from sparkinfer_tpu.tools.download import download_file, hf_file_url

PAYLOAD = bytes(range(256)) * 512  # 128 KiB
ETAG = '"' + hashlib.md5(PAYLOAD).hexdigest() + '"'


class Handler(http.server.BaseHTTPRequestHandler):
    requests = []

    def log_message(self, *a):
        pass

    def _serve(self, head=False):
        Handler.requests.append((self.command, self.headers.get("Range")))
        rng = self.headers.get("Range")
        body = PAYLOAD
        status = 200
        start = 0
        if rng and rng.startswith("bytes="):
            start = int(rng[6:].rstrip("-"))
            body = PAYLOAD[start:]
            status = 206
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("ETag", ETAG)
        self.send_header("Last-Modified", "Thu, 01 Jan 2026 00:00:00 GMT")
        if status == 206:
            self.send_header(
                "Content-Range",
                f"bytes {start}-{len(PAYLOAD)-1}/{len(PAYLOAD)}")
        self.end_headers()
        if not head:
            self.wfile.write(body)

    def do_GET(self):
        self._serve()

    def do_HEAD(self):
        self._serve(head=True)


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_full_download_and_sidecar(server, tmp_path):
    dst = tmp_path / "m.gguf"
    seen = []
    out = download_file(server + "/m.gguf", dst,
                        progress=lambda d, t: seen.append((d, t)))
    assert out.read_bytes() == PAYLOAD
    meta = json.loads((tmp_path / "m.gguf.json").read_text())
    assert meta["etag"] == ETAG
    assert seen[-1] == (len(PAYLOAD), len(PAYLOAD))


def test_etag_revalidation_skips_transfer(server, tmp_path):
    dst = tmp_path / "m.gguf"
    download_file(server + "/m.gguf", dst)
    Handler.requests.clear()
    download_file(server + "/m.gguf", dst)
    # only the HEAD revalidation hits the wire
    assert Handler.requests == [("HEAD", None)]


def test_resume_from_partial(server, tmp_path):
    dst = tmp_path / "m.gguf"
    # simulate an interrupted transfer
    (tmp_path / "m.gguf.partial").write_bytes(PAYLOAD[: 40000])
    Handler.requests.clear()
    out = download_file(server + "/m.gguf", dst)
    assert out.read_bytes() == PAYLOAD
    gets = [r for r in Handler.requests if r[0] == "GET"]
    assert gets == [("GET", "bytes=40000-")]


def test_hf_resolution_downloads_when_enabled(server, tmp_path, monkeypatch):
    from sparkinfer_tpu.tools.hf import resolve_hf_gguf

    monkeypatch.setenv("HF_ENDPOINT", server)
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    # default: offline error
    with pytest.raises(FileNotFoundError):
        resolve_hf_gguf("acme/tiny-net")
    # opt-in: fetched into the hub-cache layout resolve_hf_gguf reads
    monkeypatch.setenv("SPARK_ALLOW_DOWNLOAD", "1")
    monkeypatch.setenv("SPARK_HF_FILE", "tiny-net.gguf")
    path = resolve_hf_gguf("acme/tiny-net")
    assert path.endswith("tiny-net.gguf")
    assert open(path, "rb").read() == PAYLOAD
    # now cached: offline resolution finds it
    monkeypatch.delenv("SPARK_ALLOW_DOWNLOAD")
    assert resolve_hf_gguf("acme/tiny-net") == path


def test_hf_url():
    assert hf_file_url("a/b", "m.gguf") == \
        "https://huggingface.co/a/b/resolve/main/m.gguf"
