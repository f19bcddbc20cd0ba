"""RLDS DROID tf.data pipeline with synthetic trajectories (no tfds needed)."""

import json

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from kai0_tpu.training import droid_rlds_dataset as rlds  # noqa: E402


def _make_traj(traj_len=6, episode_key=("rec", "file_success")):
    rng = np.random.default_rng(0)
    img = tf.io.encode_jpeg(tf.constant(rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)))
    return {
        "action_dict": {
            "joint_position": np.arange(traj_len * 7, dtype=np.float32).reshape(traj_len, 7),
            "joint_velocity": np.zeros((traj_len, 7), dtype=np.float32),
            "gripper_position": np.ones((traj_len, 1), dtype=np.float32),
        },
        "observation": {
            "exterior_image_1_left": tf.stack([img] * traj_len),
            "exterior_image_2_left": tf.stack([img] * traj_len),
            "wrist_image_left": tf.stack([img] * traj_len),
            "joint_position": np.zeros((traj_len, 7), dtype=np.float32),
            "gripper_position": np.zeros((traj_len, 1), dtype=np.float32),
        },
        "language_instruction": tf.constant(["pick up the cup"] * traj_len),
        "language_instruction_2": tf.constant(["grab the cup"] * traj_len),
        "language_instruction_3": tf.constant(["lift the cup"] * traj_len),
        "traj_metadata": {
            "episode_metadata": {
                "recording_folderpath": tf.constant([episode_key[0]] * traj_len),
                "file_path": tf.constant([episode_key[1]] * traj_len),
            }
        },
    }


def _traj_dataset(n=2, traj_len=6):
    trajs = [_make_traj(traj_len) for _ in range(n)]

    def gen():
        yield from trajs

    spec = tf.nest.map_structure(tf.TensorSpec.from_tensor, tf.nest.map_structure(tf.convert_to_tensor, trajs[0]))
    return tf.data.Dataset.from_generator(gen, output_signature=spec)


def test_pipeline_shapes_and_chunking():
    ds = rlds.build_frame_pipeline(_traj_dataset(1, traj_len=6), action_chunk_size=4)
    frames = list(ds.as_numpy_iterator())
    assert len(frames) == 6
    f0 = frames[0]
    # Actions: joint_position (7) + gripper (1) = 8 dims, chunked to 4 steps.
    assert f0["actions"].shape == (4, 8)
    assert np.allclose(f0["actions"][0, :7], np.arange(7))
    assert np.allclose(f0["actions"][1, :7], np.arange(7, 14))
    assert np.allclose(f0["actions"][:, 7], 1.0)
    # Tail frame: chunk clamps to the last action.
    tail = frames[-1]
    assert np.allclose(tail["actions"][0], tail["actions"][-1])
    # Images decoded to uint8.
    assert f0["observation"]["image"].shape == (8, 8, 3)
    assert f0["observation"]["image"].dtype == np.uint8
    assert b"cup" in f0["prompt"]


def test_pipeline_idle_filter(tmp_path):
    # Keep only frames 1-2 of the episode.
    filter_dict = {"rec--file_success": [[1, 3]]}
    path = tmp_path / "filter.json"
    path.write_text(json.dumps(filter_dict))
    table = rlds.make_filter_table(str(path))
    ds = rlds.build_frame_pipeline(
        _traj_dataset(1, traj_len=6), action_chunk_size=2, filter_table=table
    )
    frames = list(ds.as_numpy_iterator())
    assert len(frames) == 2
    kept_ids = {f["step_id"].decode() for f in frames}
    assert kept_ids == {"rec--file_success--1", "rec--file_success--2"}


def test_rlds_data_config_and_registry():
    """Misc config packs register; RLDSDroidDataConfig assembles the transform chain."""
    import dataclasses

    from kai0_tpu.training import config as _config
    from kai0_tpu.training.robot_configs import RLDSDroidDataConfig

    reg = _config.registry()
    for name in (
        "paligemma_binning_droid",
        "paligemma_fast_droid",
        "paligemma_fast_specialist_droid",
        "paligemma_vq_droid",
        "paligemma_diffusion_droid",
        "pi05_droid_jointpos_polaris",
        "pi0_fast_droid_jointpos_polaris",
        "pi0_droid_jointpos_polaris",
        "pi0_droid_jointpos_100k_polaris",
        "paligemma_binning_droid_jointpos",
    ):
        assert name in reg, name

    cfg = reg["pi05_droid_jointpos_polaris"]
    assert isinstance(cfg.data, RLDSDroidDataConfig)
    data_config = dataclasses.replace(cfg.data, rlds_data_dir="/tmp/rlds").create(
        cfg.assets_dirs, cfg.model
    )
    assert data_config.rlds_data_dir == "/tmp/rlds"
    assert len(data_config.rlds_datasets) == 2
    assert abs(sum(d.weight for d in data_config.rlds_datasets) - 1.0) < 1e-9
    # Delta-action transform appended for joint-position space.
    from kai0_tpu import transforms as _transforms

    assert any(isinstance(t, _transforms.DeltaActions) for t in data_config.data_transforms.inputs)
    assert any(isinstance(t, _transforms.AbsoluteActions) for t in data_config.data_transforms.outputs)
