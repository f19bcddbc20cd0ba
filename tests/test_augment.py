"""Data augmentation: time scaling, space mirroring, h5→LeRobot conversion."""

import numpy as np
import pandas as pd
import pytest

from kai0_tpu.augment import convert_h5, space_mirroring, time_scaling
from kai0_tpu.data import lerobot_meta as _meta
from kai0_tpu.data.lerobot_dataset import LeRobotDataset
from kai0_tpu.data.lerobot_writer import LeRobotDatasetWriter, feature_spec


@pytest.fixture(scope="module")
def bimanual_root(tmp_path_factory):
    """14-dim dual-arm dataset with distinguishable L/R blocks and wrist cameras."""
    root = tmp_path_factory.mktemp("bimanual") / "ds"
    cams = {"top_head": (32, 32), "hand_left": (32, 32), "hand_right": (32, 32)}
    feats = feature_spec(state_dim=14, action_dim=14, cameras=cams, fps=10)
    writer = LeRobotDatasetWriter(root, feats, fps=10)
    rng = np.random.default_rng(0)
    for ep in range(2):
        T = 10
        # Left arm dims hold 1s, right arm dims hold 2s → swaps are observable.
        state = np.concatenate([np.ones((T, 7)), 2 * np.ones((T, 7))], axis=1).astype(np.float32)
        writer.add_episode(
            {"observation.state": state, "action": state * 10},
            task="fold",
            videos={
                f"observation.images.{c}": rng.integers(0, 255, (T, 32, 32, 3)).astype(np.uint8)
                for c in cams
            },
        )
    writer.finalize()
    return root


def test_swap_arms_in_array():
    x = np.concatenate([np.arange(7), 10 + np.arange(7)])
    y = space_mirroring.swap_arms_in_array(x)
    assert np.allclose(y[:7], 10 + np.arange(7))
    assert np.allclose(y[7:], np.arange(7))
    # Padding beyond 14 dims is preserved.
    z = space_mirroring.swap_arms_in_array(np.concatenate([x, [99, 98]]))
    assert z[14] == 99 and z[15] == 98


def test_create_mirror_dataset(bimanual_root, tmp_path):
    mirrored = space_mirroring.create_mirror_dataset(bimanual_root, tmp_path / "mir")
    assert mirrored.info["total_episodes"] == 2
    df = pd.read_parquet(mirrored.data_path(0))
    state = np.stack([np.asarray(v) for v in df["observation.state"]])
    # L/R blocks swapped: left block now holds the 2s.
    assert np.allclose(state[:, :7], 2.0)
    assert np.allclose(state[:, 7:], 1.0)
    # Wrist cameras swapped on disk; top camera still present.
    for key in ("hand_left", "hand_right", "top_head"):
        assert mirrored.video_path(0, f"observation.images.{key}").exists()


def test_mirror_video_is_flipped(bimanual_root, tmp_path):
    import cv2

    out = tmp_path / "flip.mp4"
    src = _meta.LeRobotMetadata.load(bimanual_root).video_path(0, "observation.images.top_head")
    space_mirroring.flip_video(src, out)
    cap_src, cap_out = cv2.VideoCapture(str(src)), cv2.VideoCapture(str(out))
    ok1, f1 = cap_src.read()
    ok2, f2 = cap_out.read()
    assert ok1 and ok2
    # mp4 encoding is lossy: compare with tolerance to the horizontally flipped source.
    diff = np.abs(f2.astype(int) - f1[:, ::-1].astype(int)).mean()
    assert diff < 30


def test_mirror_and_merge(bimanual_root, tmp_path):
    merged = space_mirroring.create_mirror_and_merge(bimanual_root, tmp_path / "merged")
    assert merged.info["total_episodes"] == 4
    assert merged.info["total_frames"] == 40


def test_time_scale_dataset(bimanual_root, tmp_path):
    out = time_scaling.time_scale_dataset(bimanual_root, tmp_path / "ts", 2)
    assert out.info["total_episodes"] == 2
    assert out.info["total_frames"] == 10  # 2 episodes × ceil(10/2)
    ds = LeRobotDataset(str(tmp_path / "ts"))
    assert len(ds) == 10
    df = pd.read_parquet(out.data_path(0))
    assert df["frame_index"].tolist() == list(range(5))
    assert np.allclose(df["timestamp"], np.arange(5) / 10.0)
    # Video also halved.
    import cv2

    cap = cv2.VideoCapture(str(out.video_path(0, "observation.images.top_head")))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5


def test_time_scaling_with_split(bimanual_root, tmp_path):
    merged = time_scaling.time_scaling_with_split(
        bimanual_root, tmp_path / "split", 2, extract_fraction=0.5, seed=0
    )
    # One episode scaled (5 frames), one kept (10 frames).
    assert merged.info["total_episodes"] == 2
    assert merged.info["total_frames"] == 15


def test_convert_h5_roundtrip(tmp_path):
    from kai0_tpu.deploy.dagger import DAggerCollector

    coll = DAggerCollector(["top"], tmp_path / "h5", fps=10)
    rng = np.random.default_rng(1)
    for _ in range(2):
        coll.start_collection()
        for i in range(6):
            coll.add_frame(
                {
                    "qpos": np.full(14, i, dtype=np.float32),
                    "images": {"top": rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)},
                },
                action=np.full(14, i, dtype=np.float32),
            )
        coll.save_episode()

    meta = convert_h5.convert_h5_to_lerobot(
        tmp_path / "h5", tmp_path / "lerobot", task="fold", cameras=["top"], fps=10
    )
    assert meta.info["total_episodes"] == 2
    ds = LeRobotDataset(str(tmp_path / "lerobot"))
    assert len(ds) == 12
    item = ds[3]
    assert np.allclose(item["observation.state"], 3.0)
    assert item["observation.images.top"].shape == (32, 32, 3)


def test_mirrored_view_matches_offline_rewrite(bimanual_root, tmp_path):
    """Train-time MirroredView ≡ offline create_mirror_and_merge (VERDICT r4
    item 7): same index layout (originals then mirrored twins), exact
    state/action arm swaps, flipped + slot-swapped wrist cameras (images within
    mp4 re-encode tolerance — the view flips DECODED frames, losslessly)."""
    from kai0_tpu.data.augment_views import MirroredView

    merged_meta = space_mirroring.create_mirror_and_merge(bimanual_root, tmp_path / "merged")
    offline = LeRobotDataset(str(tmp_path / "merged"), action_horizon=4,
                             action_sequence_keys=("action",))
    view = MirroredView(
        LeRobotDataset(str(bimanual_root), action_horizon=4, action_sequence_keys=("action",))
    )
    assert len(view) == len(offline) == 2 * merged_meta.info["total_frames"] // 2

    for idx in (0, 3, 25, len(view) - 1):  # originals and mirrored half
        a, b = view[idx], offline[idx]
        np.testing.assert_allclose(a["observation.state"], b["observation.state"], atol=1e-6)
        np.testing.assert_allclose(a["action"], b["action"], atol=1e-6)
        for cam in ("top_head", "hand_left", "hand_right"):
            key = f"observation.images.{cam}"
            diff = np.abs(a[key].astype(np.float32) - b[key].astype(np.float32)).mean()
            assert diff < 30, (idx, cam, diff)  # mp4 lossiness bound (see flip test above)

    # bookkeeping columns match the offline merge's renumbering: the mirrored
    # twins get fresh episode/global indices (never duplicate the originals)
    for idx in (0, 25):
        assert int(view[idx]["episode_index"]) == int(offline[idx]["episode_index"]), idx
        assert int(view[idx]["index"]) == int(offline[idx]["index"]), idx

    # the mirrored half really is mirrored: arm blocks swapped, frames flipped
    orig, mirr = view[2], view[2 + len(view) // 2]
    np.testing.assert_array_equal(mirr["observation.state"][:7], orig["observation.state"][7:])
    np.testing.assert_array_equal(
        mirr["observation.images.top_head"], orig["observation.images.top_head"][:, ::-1]
    )
    np.testing.assert_array_equal(
        mirr["observation.images.hand_left"], orig["observation.images.hand_right"][:, ::-1]
    )


def test_augment_mirror_config_flag(bimanual_root):
    """A config with data.augment_mirror=True doubles the dataset through
    create_dataset and serves mirrored items past the original length."""
    import dataclasses as _dc

    from kai0_tpu.models import pi0 as _pi0
    from kai0_tpu.training import config as _config
    from kai0_tpu.training import data_loader as _data_loader

    model = _pi0.Pi0Config(
        paligemma_variant="dummy", action_expert_variant="dummy",
        vision_variant="mu/14", dtype="float32", pi05=True,
    )
    data_config = _dc.replace(
        _config.DataConfig(),
        repo_id=str(bimanual_root),
        action_sequence_keys=("action",),
        augment_mirror=True,
    )
    ds = _data_loader.create_dataset(data_config, model)
    base = LeRobotDataset(str(bimanual_root), action_horizon=model.action_horizon,
                          action_sequence_keys=("action",))
    assert len(ds) == 2 * len(base)
    mirrored = ds[len(base)]
    np.testing.assert_array_equal(mirrored["observation.state"][:7], base[0]["observation.state"][7:])

    with pytest.raises(ValueError, match="advantage"):
        _data_loader.create_dataset(data_config, model, advantage=True)

    # fake data must not silently train unaugmented (same loudness as the
    # RLDS path): the flags only mean anything on a real LeRobot dataset
    with pytest.raises(ValueError, match="fake"):
        _data_loader.create_dataset(_dc.replace(data_config, repo_id="fake"), model)


def test_time_scaled_view_matches_offline_rewrite(bimanual_root, tmp_path):
    """Train-time TimeScaledView ≡ offline time_scale_dataset: same kept
    frames, same strided action chunks incl. the edge clamp at the last KEPT
    frame, same resequenced bookkeeping columns; video within re-encode
    tolerance (the view decodes the original frame — lossless)."""
    from kai0_tpu.data.augment_views import TimeScaledView

    time_scaling.time_scale_dataset(bimanual_root, tmp_path / "scaled", 2)
    offline = LeRobotDataset(str(tmp_path / "scaled"), action_horizon=4,
                             action_sequence_keys=("action",))
    view = TimeScaledView(
        LeRobotDataset(str(bimanual_root), action_horizon=4, action_sequence_keys=("action",)), 2
    )
    assert len(view) == len(offline) == 10  # 2 episodes × ceil(10/2)

    for idx in (0, 3, 4, 5, 9):  # incl. chunk-clamp region at episode end
        a, b = view[idx], offline[idx]
        np.testing.assert_allclose(a["observation.state"], b["observation.state"], atol=1e-6)
        np.testing.assert_allclose(a["action"], b["action"], atol=1e-6)
        assert int(a["frame_index"]) == int(b["frame_index"])
        np.testing.assert_allclose(float(a["timestamp"]), float(b["timestamp"]), atol=1e-9)
        assert int(a["index"]) == int(b["index"])
        for cam in ("top_head", "hand_left", "hand_right"):
            key = f"observation.images.{cam}"
            diff = np.abs(a[key].astype(np.float32) - b[key].astype(np.float32)).mean()
            assert diff < 30, (idx, cam, diff)


def test_time_scale_config_flag_composes_with_mirror(bimanual_root):
    import dataclasses as _dc

    from kai0_tpu.models import pi0 as _pi0
    from kai0_tpu.training import config as _config
    from kai0_tpu.training import data_loader as _data_loader

    model = _pi0.Pi0Config(
        paligemma_variant="dummy", action_expert_variant="dummy",
        vision_variant="mu/14", dtype="float32", pi05=True,
    )
    data_config = _dc.replace(
        _config.DataConfig(),
        repo_id=str(bimanual_root),
        action_sequence_keys=("action",),
        augment_mirror=True,
        augment_time_scale=2,
    )
    ds = _data_loader.create_dataset(data_config, model)
    assert len(ds) == 2 * 10  # time-scale halves frames, mirror doubles them
    # upper half is mirrored AND time-scaled
    orig, mirr = ds[2], ds[2 + len(ds) // 2]
    np.testing.assert_array_equal(mirr["observation.state"][:7], orig["observation.state"][7:])
