"""HTTP model downloader — parity with the reference's common/download.cpp
(curl-based `-hf`/`--model-url` fetcher): streaming download with
Range-resume, ETag/Last-Modified revalidation via a JSON metadata
sidecar (the reference writes `<file>.json` with etag+lastModified),
retry with backoff, and HF Hub URL construction with bearer-token auth.

stdlib-only (urllib): this build runs in zero-egress environments, so
the downloader is exercised in tests against a loopback HTTP server and
gated off by default in the -hf resolution path (SPARK_ALLOW_DOWNLOAD=1
enables it for network deployments).
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from pathlib import Path

CHUNK = 1 << 18


def hf_file_url(repo: str, filename: str, revision: str = "main") -> str:
    """HF Hub resolve URL (ref: common_get_hf_file endpoint convention)."""
    base = os.environ.get("HF_ENDPOINT", "https://huggingface.co").rstrip("/")
    return f"{base}/{repo}/resolve/{revision}/{filename}"


def _headers(extra: dict | None = None) -> dict:
    h = {"User-Agent": "sparkinfer-tpu/1.0"}
    tok = os.environ.get("HF_TOKEN") or os.environ.get("HUGGING_FACE_HUB_TOKEN")
    if tok:
        h["Authorization"] = f"Bearer {tok}"
    if extra:
        h.update(extra)
    return h


def download_file(
    url: str,
    dst: str | Path,
    resume: bool = True,
    retries: int = 3,
    progress=None,
    timeout: float = 30.0,
) -> Path:
    """Download `url` to `dst` with partial-file resume and ETag
    revalidation. Returns dst. Semantics mirror common/download.cpp:

    - metadata sidecar `<dst>.json` stores {url, etag, lastModified};
    - an existing complete dst with a matching ETag (HEAD check) is
      reused without transfer;
    - an existing `<dst>.partial` resumes with a Range request when the
      server cooperates (206), else restarts;
    - the file is only moved into place when the transfer completes.
    """
    dst = Path(dst)
    dst.parent.mkdir(parents=True, exist_ok=True)
    meta_path = Path(str(dst) + ".json")
    part = Path(str(dst) + ".partial")

    # revalidate an existing complete file by ETag / Last-Modified
    etag = last_mod = None
    try:
        req = urllib.request.Request(url, method="HEAD", headers=_headers())
        with urllib.request.urlopen(req, timeout=timeout) as r:
            etag = r.headers.get("ETag")
            last_mod = r.headers.get("Last-Modified")
    except (urllib.error.URLError, OSError):
        pass  # HEAD unsupported -> unconditional GET below
    if dst.exists() and meta_path.exists():
        try:
            meta = json.loads(meta_path.read_text())
        except Exception:
            meta = {}
        if etag and meta.get("etag") == etag:
            return dst
        if etag is None and meta.get("url") == url:
            return dst  # offline revalidation impossible; keep local

    last_err = None
    for attempt in range(retries):
        try:
            offset = part.stat().st_size if (resume and part.exists()) else 0
            headers = _headers({"Range": f"bytes={offset}-"} if offset else None)
            req = urllib.request.Request(url, headers=headers)
            with urllib.request.urlopen(req, timeout=timeout) as r:
                if offset and r.status != 206:
                    offset = 0  # server ignored Range: restart
                total = r.headers.get("Content-Length")
                total = (int(total) + offset) if total else None
                mode = "ab" if offset else "wb"
                done = offset
                with open(part, mode) as f:
                    while True:
                        buf = r.read(CHUNK)
                        if not buf:
                            break
                        f.write(buf)
                        done += len(buf)
                        if progress:
                            progress(done, total)
                etag = r.headers.get("ETag") or etag
                last_mod = r.headers.get("Last-Modified") or last_mod
            if total is not None and part.stat().st_size != total:
                raise OSError(f"short read: {part.stat().st_size}/{total}")
            part.replace(dst)
            meta_path.write_text(json.dumps(
                {"url": url, "etag": etag, "lastModified": last_mod}))
            return dst
        except (urllib.error.URLError, OSError) as e:
            last_err = e
            if attempt + 1 < retries:
                time.sleep(0.5 * 2 ** attempt)
    raise OSError(f"download failed after {retries} attempts: {url}: "
                  f"{last_err}")


def download_hf_gguf(repo: str, filename: str, cache_dir: str | Path | None
                     = None, progress=None) -> Path:
    """Fetch one GGUF from the HF Hub into the hub-cache layout used by
    tools/hf.resolve_hf_gguf (models--org--name/snapshots/dl/)."""
    from .hf import _hub_cache

    cache = Path(cache_dir) if cache_dir else _hub_cache()
    snap = cache / ("models--" + repo.replace("/", "--")) / "snapshots" / "dl"
    return download_file(hf_file_url(repo, filename), snap / filename,
                         progress=progress)
