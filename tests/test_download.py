"""shared.download: local passthrough, cache resolution, offline errors.

Parity with the reference's ``src/openpi/shared/download_test.py`` coverage, minus
network fetches (zero egress here).
"""

import pathlib

import pytest

from kai0_tpu.shared import download


def test_local_path_passthrough(tmp_path):
    f = tmp_path / "x.json"
    f.write_text("{}")
    out = download.maybe_download(str(f))
    assert out == f.resolve()
    # Tilde expansion.
    assert download.maybe_download("~/nonexistent").is_absolute()


def test_cache_hit_for_remote_url(tmp_path, monkeypatch):
    monkeypatch.setenv("KAI0_DATA_HOME", str(tmp_path))
    url = "gs://bucket/assets/norm_stats.json"
    cached = download._cache_path_for(url)
    assert str(cached).startswith(str(tmp_path))
    cached.parent.mkdir(parents=True, exist_ok=True)
    cached.write_text("data")
    assert download.maybe_download(url) == cached


def test_remote_miss_raises_actionable_error(tmp_path, monkeypatch):
    monkeypatch.setenv("KAI0_DATA_HOME", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="not in the local cache"):
        download.maybe_download("gs://bucket/definitely/missing")


def test_cache_paths_are_scheme_scoped(tmp_path, monkeypatch):
    monkeypatch.setenv("KAI0_DATA_HOME", str(tmp_path))
    a = download._cache_path_for("gs://b/x")
    b = download._cache_path_for("s3://b/x")
    assert a != b
    assert pathlib.Path(a).parts[-2] == "b_x" or "gs" in str(a)
