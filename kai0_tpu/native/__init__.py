"""Native (C++) robot-edge components: build-on-demand CPython extension.

``load()`` returns the compiled ``_native`` module, building it with the system
C++ toolchain on first use (cached under ``~/.cache/kai0_tpu/native``). Returns
``None`` when no toolchain is available — callers fall back to the pure-Python
implementations in :mod:`kai0_tpu.deploy.buffers`.
"""

from __future__ import annotations

import hashlib
import importlib.util
import logging
import os
import pathlib
import subprocess
import sys
import sysconfig

logger = logging.getLogger("kai0_tpu")

_SOURCE = pathlib.Path(__file__).parent / "stream_buffer.cpp"
_cached = "unset"


def _build(cache_dir: pathlib.Path) -> pathlib.Path | None:
    cache_dir.mkdir(parents=True, exist_ok=True)
    src_hash = hashlib.sha256(_SOURCE.read_bytes()).hexdigest()[:16]
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = cache_dir / f"_native_{src_hash}{ext_suffix}"
    if out.exists():
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        str(_SOURCE),
        "-o",
        str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        logger.warning(f"Native buffer build failed ({detail.strip()[:400]}); using Python fallback")
        return None
    return out


def load():
    """Import the native module (building if needed); None if unavailable."""
    global _cached
    if _cached != "unset":
        return _cached
    if os.environ.get("KAI0_DISABLE_NATIVE"):
        _cached = None
        return None
    cache_dir = pathlib.Path(
        os.environ.get("KAI0_NATIVE_CACHE", pathlib.Path.home() / ".cache" / "kai0_tpu" / "native")
    )
    so_path = _build(cache_dir)
    if so_path is None:
        _cached = None
        return None
    spec = importlib.util.spec_from_file_location("_native", so_path)
    module = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(module)
    except Exception as e:  # noqa: BLE001
        logger.warning(f"Native buffer import failed ({e}); using Python fallback")
        _cached = None
        return None
    sys.modules.setdefault("kai0_tpu_native", module)
    _cached = module
    return module
