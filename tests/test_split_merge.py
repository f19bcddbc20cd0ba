"""Split/merge tooling + fast norm-stats parquet path."""

import numpy as np
import pandas as pd
import pytest

from kai0_tpu.data import split_merge
from kai0_tpu.data.lerobot_dataset import LeRobotDataset
from kai0_tpu.data.lerobot_writer import LeRobotDatasetWriter, feature_spec


def _make_dataset(root, n_episodes=4, state_dim=4, tasks=("fold", "hang"), seed=0):
    feats = feature_spec(state_dim=state_dim, action_dim=state_dim, cameras={"top": (32, 32)}, fps=10)
    writer = LeRobotDatasetWriter(root, feats, fps=10)
    rng = np.random.default_rng(seed)
    for ep in range(n_episodes):
        length = 8 + ep
        writer.add_episode(
            {
                "observation.state": rng.random((length, state_dim), dtype=np.float32),
                "action": rng.random((length, state_dim), dtype=np.float32),
            },
            task=tasks[ep % len(tasks)],
            videos={"observation.images.top": rng.integers(0, 255, (length, 32, 32, 3)).astype(np.uint8)},
        )
    writer.finalize()
    return root


@pytest.fixture(scope="module")
def source_root(tmp_path_factory):
    return _make_dataset(tmp_path_factory.mktemp("src") / "ds")


def test_split_disjoint_and_reindexed(source_root, tmp_path):
    outputs = split_merge.split_dataset(source_root, tmp_path / "splits", split_num=2, seed=1)
    assert len(outputs) == 2
    total_eps, total_frames = 0, 0
    for out in outputs:
        ds = LeRobotDataset(str(out))
        eps = ds.episode_indices
        # Renumbered 0..n-1.
        assert eps == list(range(len(eps)))
        total_eps += len(eps)
        total_frames += len(ds)
        # Parquet frame `index` column is a contiguous 0..n-1 rebase.
        indices = np.concatenate(
            [pd.read_parquet(ds.metadata.data_path(e))["index"].to_numpy() for e in eps]
        )
        assert np.array_equal(indices, np.arange(len(ds)))
        # Videos copied.
        for e in eps:
            assert ds.metadata.video_path(e, "observation.images.top").exists()
    src = LeRobotDataset(str(source_root))
    assert total_eps == len(src.episode_indices)
    assert total_frames == len(src)


def test_merge_roundtrip(source_root, tmp_path):
    # Split then merge reconstitutes the same totals and a union task table.
    outputs = split_merge.split_dataset(source_root, tmp_path / "splits", split_num=2, seed=1)
    merged = split_merge.merge_datasets(outputs, tmp_path / "merged")
    src = LeRobotDataset(str(source_root))
    assert merged.info["total_episodes"] == len(src.episode_indices)
    assert merged.info["total_frames"] == len(src)
    assert set(merged.tasks.values()) == set(src.tasks.values())
    ds = LeRobotDataset(str(tmp_path / "merged"))
    assert len(ds) == len(src)
    # task_index column remaps into the merged table.
    df = pd.read_parquet(ds.metadata.data_path(0))
    tasks_by_index = ds.tasks
    assert all(int(t) in tasks_by_index for t in df["task_index"])


def test_merge_feature_mismatch_raises(source_root, tmp_path):
    other = _make_dataset(tmp_path / "other", n_episodes=1, state_dim=6)
    with pytest.raises(ValueError, match="mismatch"):
        split_merge.merge_datasets([source_root, other], tmp_path / "m2")
    # force=True downgrades to warnings.
    split_merge.merge_datasets([source_root, other], tmp_path / "m3", force=True)


def test_fast_norm_stats_matches_reference_semantics(source_root):
    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))
    import importlib

    mod = importlib.import_module("compute_norm_stats_fast")
    stats = mod.compute_stats_from_parquet(source_root, action_dim=8)
    assert set(stats) == {"state", "actions"}
    # Padded dims contribute zeros: mean of pad dims is 0.
    assert stats["state"].mean.shape == (8,)
    assert np.allclose(stats["state"].mean[4:], 0.0)
    # Data is uniform [0,1): mean ~0.5 on real dims.
    assert np.all(stats["state"].mean[:4] > 0.3)
    # Clamp check: values beyond pi would be zeroed (none here, so std > 0).
    assert np.all(stats["actions"].std[:4] > 0)
