"""Asset resolution with a local cache.

Parity target: reference ``src/openpi/shared/download.py`` (fsspec-cached
``maybe_download``, local passthrough, filelock concurrency). This deployment runs with
zero network egress, so remote URLs resolve only if already present in the cache
(``$KAI0_DATA_HOME``, default ``~/.cache/kai0_tpu``); otherwise a clear error is raised.
Local paths pass through untouched.
"""

from __future__ import annotations

import os
import pathlib
import re
import urllib.parse

_REMOTE_SCHEMES = ("gs://", "s3://", "http://", "https://", "hf://")


def get_cache_dir() -> pathlib.Path:
    cache = pathlib.Path(os.environ.get("KAI0_DATA_HOME", "~/.cache/kai0_tpu")).expanduser()
    cache.mkdir(parents=True, exist_ok=True)
    return cache


def _cache_path_for(url: str) -> pathlib.Path:
    parsed = urllib.parse.urlparse(url)
    safe = re.sub(r"[^\w./-]", "_", (parsed.netloc + parsed.path).lstrip("/"))
    return get_cache_dir() / parsed.scheme / safe


def maybe_download(url: str, **_kwargs) -> pathlib.Path:
    """Resolve ``url`` to a local path.

    Local paths are returned as-is. Remote URLs are served from the local cache if a
    prior process populated it; there is no network fetch in this environment.
    """
    if not url.startswith(_REMOTE_SCHEMES):
        return pathlib.Path(url).expanduser().resolve()
    cached = _cache_path_for(url)
    if cached.exists():
        return cached
    try:
        import fsspec

        fs, _ = fsspec.url_to_fs(url)
        cached.parent.mkdir(parents=True, exist_ok=True)
        fs.get(url, str(cached), recursive=True)
        return cached
    except Exception as e:  # noqa: BLE001 - no egress: surface a clear, actionable error
        raise FileNotFoundError(
            f"Remote asset {url!r} is not in the local cache ({cached}) and cannot be fetched "
            f"(no network egress). Pre-populate the cache or pass a local path. ({e})"
        ) from e
