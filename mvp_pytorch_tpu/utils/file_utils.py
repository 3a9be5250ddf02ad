"""Artifact resolution (cached_path).

Parity target: reference `transformers/pytorch_transformers/file_utils.py:93`
cached_path — resolve a local path or URL to a local file with an on-disk
cache. This environment is zero-egress, so remote URLs raise a clear error
unless already cached; file:// and local paths pass through.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import Optional
from urllib.parse import urlparse

DEFAULT_CACHE = os.path.expanduser("~/.cache/mvp_pytorch_tpu")


def url_to_filename(url: str) -> str:
    return hashlib.sha256(url.encode()).hexdigest()


def cached_path(path_or_url: str, cache_dir: Optional[str] = None) -> str:
    cache_dir = cache_dir or DEFAULT_CACHE
    parsed = urlparse(path_or_url)
    if parsed.scheme in ("", "file"):
        local = parsed.path if parsed.scheme == "file" else path_or_url
        if not os.path.exists(local):
            raise FileNotFoundError(local)
        return local
    if parsed.scheme in ("http", "https", "s3", "gs"):
        cached = os.path.join(cache_dir, url_to_filename(path_or_url))
        if os.path.exists(cached):
            return cached
        try:
            import urllib.request
            os.makedirs(cache_dir, exist_ok=True)
            tmp = cached + ".tmp"
            with urllib.request.urlopen(path_or_url, timeout=30) as r, \
                    open(tmp, "wb") as f:
                shutil.copyfileobj(r, f)
            os.replace(tmp, cached)
            return cached
        except Exception as e:
            raise RuntimeError(
                f"cannot fetch {path_or_url}: no egress and not cached "
                f"at {cached}") from e
    raise ValueError(f"unsupported scheme: {path_or_url}")
