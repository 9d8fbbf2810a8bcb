"""Checkpoint resolution: local path -> cache -> HF hub -> IPB zip download.

Parity with the reference's two download paths:
  - HF hub `PRBonn/RAP` (ref rectified_point_flow/utils/checkpoint.py:64-71)
  - IPB weights.zip (ref demo.py:66-120), extracted into the cache dir.

Known artifact names (ref sample.py:27,45; app.py:46-50; demo.py:543):
rap_model.ckpt, rap_model_10.ckpt, rap_model_12.ckpt,
spinnet_3dmatch_bufferx.pth, spinnet_kitti_bufferx.pth, mini_spinnet_t.pth.

Optional sha256 verification; every network step is time-limited and failure
falls through to the next source with a clear error at the end (this build
environment has zero egress — tests exercise the local/cache/zip paths).
"""

from __future__ import annotations

import hashlib
import logging
import os
import zipfile
from pathlib import Path

logger = logging.getLogger("rap_tpu.weights")

HF_REPO = "PRBonn/RAP"
IPB_WEIGHTS_URL = "https://www.ipb.uni-bonn.de/html/projects/rap/weights.zip"
KNOWN_CHECKPOINTS = (
    "rap_model.ckpt",
    "rap_model_10.ckpt",
    "rap_model_12.ckpt",
    "spinnet_3dmatch_bufferx.pth",
    "spinnet_kitti_bufferx.pth",
    "mini_spinnet_t.pth",
)


def default_cache_dir() -> Path:
    return Path(
        os.environ.get(
            "RAP_TPU_CACHE", Path.home() / ".cache" / "rap_tpu" / "weights"
        )
    )


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _verify(path: Path, sha256: str | None) -> Path:
    if sha256:
        got = _sha256(path)
        if got != sha256:
            raise ValueError(
                f"checksum mismatch for {path}: expected {sha256}, got {got}"
            )
        logger.info("checksum OK for %s", path.name)
    return path


def _reachable(host: str, port: int = 443, timeout: float = 2.0) -> bool:
    """Fast connectivity probe: skip downloads (and their ~25 s of internal
    retries) in offline environments."""
    import socket

    try:
        socket.getaddrinfo(host, port)
        return True
    except OSError:
        return False


def _try_hf_hub(filename: str, cache_dir: Path) -> Path | None:
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        return None
    if not _reachable("huggingface.co"):
        logger.info("huggingface.co unreachable — skipping HF hub")
        return None
    try:
        p = hf_hub_download(
            repo_id=HF_REPO, filename=filename, cache_dir=str(cache_dir),
            etag_timeout=10,
        )
        return Path(p)
    except Exception as e:  # offline / missing — fall through
        logger.info("HF hub download failed (%s)", str(e)[:120])
        return None


def _try_zip(filename: str, cache_dir: Path, url: str) -> Path | None:
    """Download + extract the IPB weights.zip (once) and look inside."""
    import urllib.request
    from urllib.parse import urlparse

    zip_path = cache_dir / "weights.zip"
    if not zip_path.exists():
        host = urlparse(url).hostname or ""
        if host and not _reachable(host):
            logger.info("%s unreachable — skipping weights zip", host)
            return None
    try:
        if not zip_path.exists():
            logger.info("downloading %s ...", url)
            with urllib.request.urlopen(url, timeout=30) as r:
                cache_dir.mkdir(parents=True, exist_ok=True)
                zip_path.write_bytes(r.read())
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(cache_dir)
        hit = next(cache_dir.rglob(filename), None)
        return hit
    except Exception as e:
        logger.info("zip download failed (%s)", str(e)[:120])
        # invalidate poisoned cache entries (truncated download, non-zip
        # body) so the next resolve re-downloads instead of failing forever
        if zip_path.exists() and (
            zip_path.stat().st_size == 0 or isinstance(e, zipfile.BadZipFile)
        ):
            zip_path.unlink()
        return None


def resolve_checkpoint(
    spec: str,
    cache_dir: str | Path | None = None,
    download: bool = True,
    sha256: str | None = None,
    weights_url: str = IPB_WEIGHTS_URL,
) -> Path:
    """Resolve a checkpoint path or known artifact name to a local file.

    Order: existing path -> cache dir -> HF hub -> weights.zip. Raises
    FileNotFoundError with the attempted sources when nothing resolves.
    """
    if not spec:
        raise ValueError("empty checkpoint spec")
    p = Path(spec).expanduser()
    if p.exists():
        return _verify(p, sha256)
    cache = Path(cache_dir) if cache_dir else default_cache_dir()
    name = p.name
    cached = next(cache.rglob(name), None) if cache.exists() else None
    if cached is not None:
        return _verify(cached, sha256)
    if download:
        hit = _try_hf_hub(name, cache)
        if hit is not None:
            return _verify(hit, sha256)
        hit = _try_zip(name, cache, weights_url)
        if hit is not None:
            return _verify(hit, sha256)
    raise FileNotFoundError(
        f"checkpoint '{spec}' not found locally, in {cache}, on HF hub "
        f"({HF_REPO}), or in {weights_url}"
    )
