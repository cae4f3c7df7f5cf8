"""HuggingFace GGUF resolution — analogue of the reference's `-hf
user/repo[:quant]` flag (common/arg.cpp curl downloader + manifest lookup).

This environment has zero egress, so resolution is strictly OFFLINE: the
repo is looked up in the local HF hub cache (HF_HUB_CACHE /
~/.cache/huggingface/hub, the layout huggingface_hub populates) and in
plain directories. Missing models produce an actionable error instead of a
download attempt; when network-enabled deployments want the reference's
behavior, `huggingface_hub.hf_hub_download` drops in at the marked point.
"""

from __future__ import annotations

import os
from pathlib import Path


def _hub_cache() -> Path:
    for env in ("HF_HUB_CACHE", "HUGGINGFACE_HUB_CACHE"):
        if os.environ.get(env):
            return Path(os.environ[env])
    home = os.environ.get("HF_HOME")
    if home:
        return Path(home) / "hub"
    return Path.home() / ".cache" / "huggingface" / "hub"


def _pick_gguf(files: list[Path], quant: str | None) -> Path | None:
    """Prefer an exact quant-tag match (case-insensitive substring, the
    reference's manifest convention), else the first non-shard gguf."""
    ggufs = sorted(f for f in files if f.suffix == ".gguf")
    if not ggufs:
        return None
    if quant:
        q = quant.lower()
        for f in ggufs:
            if q in f.name.lower():
                return f
        return None
    # skip later shards (-0000N-of-) so a sharded repo resolves to shard 1
    for f in ggufs:
        if "-of-" not in f.name or "-00001-of-" in f.name:
            return f
    return ggufs[0]


def resolve_hf_gguf(spec: str) -> str:
    """`user/repo[:quant]` -> local GGUF path, offline-only.

    Searches: (1) the HF hub cache snapshots for the repo, (2) `spec` as a
    literal directory containing GGUFs. Raises FileNotFoundError with a
    zero-egress explanation otherwise.
    """
    repo, _, quant = spec.partition(":")
    quant = quant or None

    roots: list[Path] = []
    cache = _hub_cache()
    repo_dir = cache / ("models--" + repo.replace("/", "--"))
    if repo_dir.is_dir():
        snaps = repo_dir / "snapshots"
        if snaps.is_dir():
            roots.extend(sorted(snaps.iterdir(), reverse=True))
    if Path(repo).is_dir():
        roots.append(Path(repo))

    for root in roots:
        files = [p for p in root.rglob("*") if p.is_file()]
        hit = _pick_gguf(files, quant)
        if hit:
            return str(hit)

    # network path (ref: common/download.cpp common_download_model):
    # opt-in because this build targets zero-egress environments — set
    # SPARK_ALLOW_DOWNLOAD=1 on deployments with network access
    if os.environ.get("SPARK_ALLOW_DOWNLOAD") == "1":
        from .download import download_hf_gguf

        fname = (f"{repo.rsplit('/', 1)[-1]}.gguf" if not quant
                 else f"{repo.rsplit('/', 1)[-1]}-{quant}.gguf")
        fname = os.environ.get("SPARK_HF_FILE", fname)
        return str(download_hf_gguf(repo, fname))

    raise FileNotFoundError(
        f"GGUF for '{spec}' not found in local HF cache ({cache}); this "
        f"build defaults to offline — pre-populate the cache "
        f"(huggingface-cli download {repo}), pass a local path with -m, "
        f"or set SPARK_ALLOW_DOWNLOAD=1 (+ optional SPARK_HF_FILE) on a "
        f"network-enabled deployment"
    )
