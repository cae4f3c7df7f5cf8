"""sparkinfer-launcher — web launcher for the inference server.

TPU analogue of the reference's Node/Express launcher
(tools/launcher/server.js): a small web UI on its own port that lists
the GGUF files in a models directory, lets the user pick a main model,
a SparkInfer model split and an HBM budget, then spawns the inference
server as a subprocess with the canonical SPIF_* environment
(run_demo.sh:3-10 analogue) and redirects the browser to it. Endpoints
mirror server.js: GET /api/files, POST /start-server (idempotent — if a
server is already running it returns the existing targetUrl instead of
erroring, server.js:53-59), POST /stop-server, GET /api/status.

Implemented on stdlib http.server — no web framework dependency.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!doctype html><html><head><meta charset="utf-8">
<title>SparkInfer-TPU launcher</title><style>
body{font-family:system-ui,sans-serif;max-width:640px;margin:3em auto;padding:0 1em}
label{display:block;margin:.8em 0 .2em}select,input{width:100%;padding:.4em}
button{margin-top:1.2em;padding:.5em 1.4em}#msg{margin-top:1em;color:#444}
</style></head><body>
<h1>SparkInfer-TPU launcher</h1>
<label>Model (.gguf)</label><select id="model"></select>
<label>Model split (-spif-ms, optional)</label><select id="split"><option value="">none (dense / all-HBM)</option></select>
<label>HBM budget GiB (-vb, 0 = auto)</label><input id="vb" type="number" value="0" step="0.5">
<button onclick="start()">Start server</button>
<button onclick="stop()">Stop</button>
<div id="msg"></div>
<script>
async function refresh(){
  const r = await fetch('/api/files'); const d = await r.json();
  for (const id of ['model','split']){
    const s = document.getElementById(id);
    for (const f of d.files){const o=document.createElement('option');o.value=o.textContent=f;s.appendChild(o);}
  }
}
async function start(){
  const body={model:model.value,model_split:split.value,vram_budget:parseFloat(vb.value)};
  msg.textContent='starting...';
  const r=await fetch('/start-server',{method:'POST',headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
  const d=await r.json(); msg.textContent=d.message||JSON.stringify(d);
  if(d.targetUrl){ poll(d.targetUrl); }
}
async function poll(url){
  for(let i=0;i<600;i++){
    try{const h=await fetch(url+'/health');if(h.ok){location.href=url;return;}}catch(e){}
    await new Promise(r=>setTimeout(r,1000));
    msg.textContent='waiting for server (model load/compile)... '+i+'s';
  }
}
async function stop(){
  const r=await fetch('/stop-server',{method:'POST'});msg.textContent=(await r.json()).message;
}
refresh();
</script></body></html>"""

# canonical SparkInfer runtime env, the run_demo.sh:3-10 analogue
_SPIF_ENV = {
    "SPIF_DFR_EMA": "1",
    "SPIF_INIT_DFR_DECAY": "67",
    "SPIF_RELOAD_WINDOW_SIZE": "4",
}


class _State:
    def __init__(self, args):
        self.args = args
        self.proc: subprocess.Popen | None = None
        self.lock = threading.Lock()

    @property
    def target_url(self) -> str:
        return f"http://localhost:{self.args.server_port}"

    def running(self) -> bool:
        return self.proc is not None and self.proc.poll() is None

    def start(self, model: str, split: str, vb: float) -> dict:
        with self.lock:
            if self.running():
                return {"message": "server already running",
                        "targetUrl": self.target_url}
            mdir = self.args.models_dir
            if model and not os.path.isabs(model):
                model = os.path.join(mdir, model)
            if split and not os.path.isabs(split):
                split = os.path.join(mdir, split)
            cmd = [sys.executable, "-m", "sparkinfer_tpu.server",
                   "-m", model, "--port", str(self.args.server_port)]
            if split:
                cmd += ["--spif-ms", split]
            if vb:
                cmd += ["-vb", str(vb)]
            env = dict(os.environ, **_SPIF_ENV)
            self.proc = subprocess.Popen(cmd, env=env)
            return {"message": "server starting",
                    "targetUrl": self.target_url, "pid": self.proc.pid}

    def stop(self) -> dict:
        with self.lock:
            if not self.running():
                self.proc = None
                return {"message": "no server running"}
            self.proc.terminate()
            try:
                self.proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                self.proc.kill()
            self.proc = None
            return {"message": "server stopped"}


def make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/api/files":
                d = state.args.models_dir
                files = sorted(f for f in os.listdir(d)
                               if f.endswith(".gguf")) if os.path.isdir(d) \
                    else []
                self._json({"files": files})
            elif self.path == "/api/status":
                self._json({"running": state.running(),
                            "targetUrl": state.target_url,
                            "pid": state.proc.pid if state.running()
                            else None})
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
            except ValueError:
                return self._json({"error": "bad json"}, 400)
            if self.path == "/start-server":
                model = body.get("model") or ""
                if not model:
                    return self._json({"error": "model required"}, 400)
                self._json(state.start(model, body.get("model_split") or "",
                                       float(body.get("vram_budget") or 0)))
            elif self.path == "/stop-server":
                self._json(state.stop())
            else:
                self._json({"error": "not found"}, 404)

        def log_message(self, *a):  # quiet
            pass

    return Handler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="sparkinfer-launcher",
        description="web launcher: pick a model/split, spawn the server")
    ap.add_argument("--models-dir", default=os.environ.get(
        "SPARK_MODELS_DIR", os.path.expanduser("~/models")))
    ap.add_argument("--port", type=int, default=3000)
    ap.add_argument("--server-port", type=int, default=8080)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args(argv)
    state = _State(args)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(state))
    print(f"launcher on http://{args.host}:{args.port} "
          f"(models: {args.models_dir})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        state.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
