"""LeRobot data layer: writer → reader roundtrip, chunking, splits."""

import numpy as np
import pytest

from kai0_tpu.data.lerobot_dataset import LeRobotDataset, episodes_split_through_task
from kai0_tpu.data.lerobot_writer import LeRobotDatasetWriter, feature_spec


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lerobot") / "ds"
    feats = feature_spec(state_dim=4, action_dim=4, cameras={"top": (48, 64)}, fps=10)
    writer = LeRobotDatasetWriter(root, feats, fps=10)
    rng = np.random.default_rng(0)
    for ep in range(4):
        length = 12 + ep
        writer.add_episode(
            {
                "observation.state": rng.random((length, 4), dtype=np.float32),
                "action": np.arange(length, dtype=np.float32)[:, None].repeat(4, 1),
            },
            task="fold the cloth" if ep % 2 else "hang the shirt",
            videos={"observation.images.top": rng.integers(0, 255, (length, 48, 64, 3)).astype(np.uint8)},
        )
    writer.finalize()
    return root


def test_roundtrip_shapes(dataset_root):
    ds = LeRobotDataset(str(dataset_root), action_horizon=5, action_sequence_keys=("action",))
    assert len(ds) == 12 + 13 + 14 + 15
    item = ds[0]
    assert item["action"].shape == (5, 4)
    assert item["observation.state"].shape == (4,)
    assert item["observation.images.top"].shape == (48, 64, 3)
    assert item["observation.images.top"].dtype == np.uint8
    assert set(ds.tasks.values()) == {"fold the cloth", "hang the shirt"}


def test_action_chunk_values_and_edge_padding(dataset_root):
    ds = LeRobotDataset(str(dataset_root), action_horizon=5, action_sequence_keys=("action",))
    # Mid-episode chunk: consecutive action rows.
    item = ds[3]
    assert np.allclose(item["action"][:, 0], [3, 4, 5, 6, 7])
    # Chunk crossing the episode end (episode 0 has 12 frames): edge-padded.
    item = ds[10]
    assert np.allclose(item["action"][:, 0], [10, 11, 11, 11, 11])


def test_episode_selection(dataset_root):
    ds = LeRobotDataset(str(dataset_root), episodes=[1, 3])
    assert len(ds) == 13 + 15
    assert ds[0]["episode_index"] == 1
    assert ds[13]["episode_index"] == 3


def test_split_through_task(dataset_root):
    ds = LeRobotDataset(str(dataset_root))
    train = episodes_split_through_task(ds, "train")
    val = episodes_split_through_task(ds, "val")
    assert sorted(train + val) == [0, 1, 2, 3]
    assert episodes_split_through_task(ds, "all") == [0, 1, 2, 3]
    # Both tasks represented in val (per-task split).
    assert len(val) == 2
