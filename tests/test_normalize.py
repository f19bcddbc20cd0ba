import numpy as np
import pytest

from kai0_tpu.shared import normalize


def test_running_stats_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(1000, 6)).astype(np.float64)
    stats = normalize.RunningStats()
    # Fixed batch-32 accumulation (the kai0 fast-path convention,
    # compute_norm_states_fast.py:187-198).
    for i in range(0, len(data), 32):
        stats.update(data[i : i + 32])
    result = stats.get_statistics()
    np.testing.assert_allclose(result.mean, data.mean(axis=0), atol=1e-8)
    np.testing.assert_allclose(result.std, data.std(axis=0), atol=1e-8)
    # Histogram quantiles are approximate (5000 adaptive bins, rebinned as range grows).
    np.testing.assert_allclose(result.q01, np.quantile(data, 0.01, axis=0), atol=0.15)
    np.testing.assert_allclose(result.q99, np.quantile(data, 0.99, axis=0), atol=0.15)


def test_running_stats_batch_order_invariance_of_count():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(64, 3))
    s1 = normalize.RunningStats()
    s1.update(data)
    s2 = normalize.RunningStats()
    for row in data.reshape(8, 8, 3):
        s2.update(row)
    r1, r2 = s1.get_statistics(), s2.get_statistics()
    np.testing.assert_allclose(r1.mean, r2.mean, atol=1e-12)
    np.testing.assert_allclose(r1.std, r2.std, atol=1e-12)


def test_running_stats_too_few():
    stats = normalize.RunningStats()
    stats.update(np.zeros((1, 3)))
    with pytest.raises(ValueError):
        stats.get_statistics()


def test_json_roundtrip(tmp_path):
    stats = {
        "state": normalize.NormStats(mean=np.arange(3.0), std=np.ones(3), q01=-np.ones(3), q99=np.ones(3)),
        "actions": normalize.NormStats(mean=np.zeros(2), std=np.ones(2)),
    }
    normalize.save(tmp_path, stats)
    loaded = normalize.load(tmp_path)
    assert set(loaded) == {"state", "actions"}
    np.testing.assert_array_equal(loaded["state"].mean, stats["state"].mean)
    np.testing.assert_array_equal(loaded["state"].q99, stats["state"].q99)
    assert loaded["actions"].q01 is None


def test_json_format_compatible_with_reference_layout():
    # The serialized layout must match the reference norm_stats.json structure.
    stats = {"state": normalize.NormStats(mean=np.zeros(2), std=np.ones(2))}
    import json

    parsed = json.loads(normalize.serialize_json(stats))
    assert "norm_stats" in parsed
    assert set(parsed["norm_stats"]["state"]) == {"mean", "std", "q01", "q99"}
