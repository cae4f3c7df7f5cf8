"""Launcher web UI (tools/launcher.py — reference tools/launcher/server.js).

Exercises the endpoint surface with the spawned server stubbed to a
sleeper process: file listing, idempotent start (server.js:53-59 returns
the existing targetUrl instead of erroring), status, stop.
"""

import json
import subprocess
import sys
import threading
import urllib.request

from http.server import ThreadingHTTPServer

from sparkinfer_tpu.tools import launcher as L


def _serve(models_dir):
    args = type("A", (), {"models_dir": str(models_dir), "port": 0,
                          "server_port": 18099, "host": "127.0.0.1"})()
    state = L._State(args)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), L.make_handler(state))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, state, f"http://127.0.0.1:{httpd.server_address[1]}"


def _req(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    r = urllib.request.Request(url, data=data, method=method,
                               headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(r, timeout=10) as resp:
        return json.loads(resp.read())


def test_launcher_endpoints(tmp_path, monkeypatch):
    (tmp_path / "a.gguf").write_bytes(b"x")
    (tmp_path / "a.split.gguf").write_bytes(b"x")
    (tmp_path / "notes.txt").write_bytes(b"x")
    httpd, state, base = _serve(tmp_path)
    try:
        files = _req(base + "/api/files")["files"]
        assert files == ["a.gguf", "a.split.gguf"]

        st = _req(base + "/api/status")
        assert st["running"] is False

        # stub the server subprocess with a sleeper
        real_popen = subprocess.Popen

        def fake_popen(cmd, env=None, **kw):
            assert "-m" in cmd and str(tmp_path / "a.gguf") in cmd
            assert "--spif-ms" in cmd and "-vb" in cmd
            assert env["SPIF_INIT_DFR_DECAY"] == "67"
            return real_popen([sys.executable, "-c",
                               "import time; time.sleep(60)"])

        monkeypatch.setattr(L.subprocess, "Popen", fake_popen)
        d = _req(base + "/start-server", "POST",
                 {"model": "a.gguf", "model_split": "a.split.gguf",
                  "vram_budget": 4.0})
        assert d["targetUrl"].endswith(":18099")
        assert _req(base + "/api/status")["running"] is True

        # idempotent second start: existing targetUrl, no second spawn
        d2 = _req(base + "/start-server", "POST", {"model": "a.gguf"})
        assert d2["targetUrl"] == d["targetUrl"]
        assert "already running" in d2["message"]

        assert "stopped" in _req(base + "/stop-server", "POST", {})["message"]
        assert _req(base + "/api/status")["running"] is False

        # index page served
        with urllib.request.urlopen(base + "/", timeout=10) as resp:
            assert b"SparkInfer-TPU launcher" in resp.read()
    finally:
        state.stop()
        httpd.shutdown()
