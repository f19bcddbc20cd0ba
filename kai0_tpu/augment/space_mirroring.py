"""Space-mirroring augmentation for dual-arm LeRobot datasets.

Creates the horizontally mirrored twin of every episode (reference
``space_mirroring.py``): state/action vectors laid out ``[L arm (7)][R arm (7)]``
get their arm blocks swapped (:39-65), videos are flipped horizontally with the two
wrist cameras swapped (right→left position and vice versa; the top camera flips in
place, :530-560), norm stats / per-episode stats are mirrored accordingly
(:214-350), and the mirrored dataset can be merged with the original (:438-463).
"""

from __future__ import annotations

import json
import pathlib
import shutil

import numpy as np

from kai0_tpu.data import lerobot_meta as _meta
from kai0_tpu.data import split_merge as _split_merge

DEFAULT_SWAP_COLUMNS = ("observation.state", "action")
# hand_right footage becomes the mirrored hand_left view and vice versa.
DEFAULT_CAMERA_SWAP = {
    "observation.images.hand_left": "observation.images.hand_right",
    "observation.images.hand_right": "observation.images.hand_left",
}


def swap_arms_in_array(arr: np.ndarray, left_dim: int = 7, right_dim: int = 7) -> np.ndarray:
    """Swap the leading left-arm block with the following right-arm block.

    Dims beyond ``left_dim + right_dim`` (padding) are preserved in place.
    """
    arr = np.asarray(arr)
    if arr.ndim == 0:
        return arr
    flat = arr.reshape(-1).copy()
    total = left_dim + right_dim
    if len(flat) < total:
        raise ValueError(f"Expected at least {total} dims, got {len(flat)}")
    left = flat[:left_dim].copy()
    flat[:left_dim] = flat[left_dim:total][:left_dim]
    flat[left_dim:total] = left
    return flat.reshape(arr.shape)


def mirror_parquet(
    input_path: pathlib.Path,
    output_path: pathlib.Path,
    *,
    columns=DEFAULT_SWAP_COLUMNS,
    left_dim: int = 7,
    right_dim: int = 7,
) -> None:
    import pandas as pd

    df = pd.read_parquet(input_path)
    for col in columns:
        if col not in df.columns:
            continue
        df[col] = [swap_arms_in_array(np.asarray(v), left_dim, right_dim) for v in df[col]]
    output_path.parent.mkdir(parents=True, exist_ok=True)
    df.to_parquet(output_path, index=False)


def flip_video(input_path: pathlib.Path, output_path: pathlib.Path) -> None:
    """Horizontal mirror of a video file."""
    import cv2

    cap = cv2.VideoCapture(str(input_path))
    if not cap.isOpened():
        raise FileNotFoundError(f"Cannot open video {input_path}")
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    output_path.parent.mkdir(parents=True, exist_ok=True)
    writer = cv2.VideoWriter(str(output_path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        writer.write(cv2.flip(frame, 1))
    cap.release()
    writer.release()


def mirror_norm_stats(stats: dict, *, left_dim: int = 7, right_dim: int = 7) -> dict:
    """Swap arm blocks inside a ``norm_stats.json``-style dict (mean/std/q01/q99)."""
    out = {}
    for key, entry in stats.items():
        out[key] = {
            field: swap_arms_in_array(np.asarray(vals), left_dim, right_dim).tolist()
            if isinstance(vals, (list, np.ndarray)) and len(np.atleast_1d(vals)) >= left_dim + right_dim
            else vals
            for field, vals in entry.items()
        }
    return out


def create_mirror_dataset(
    source: pathlib.Path | str,
    dst: pathlib.Path | str,
    *,
    left_dim: int = 7,
    right_dim: int = 7,
    swap_columns=DEFAULT_SWAP_COLUMNS,
    camera_swap: dict[str, str] | None = None,
) -> _meta.LeRobotMetadata:
    """Write the mirrored twin of a dataset (same episode numbering)."""
    src_meta = _meta.LeRobotMetadata.load(source)
    dst = pathlib.Path(dst)
    camera_swap = dict(camera_swap) if camera_swap is not None else dict(DEFAULT_CAMERA_SWAP)

    for ep in src_meta.episodes:
        i = ep["episode_index"]
        mirror_parquet(
            src_meta.data_path(i),
            dst / src_meta.data_path(i).relative_to(src_meta.root),
            columns=swap_columns,
            left_dim=left_dim,
            right_dim=right_dim,
        )
        for video_key in src_meta.video_keys:
            src_video = src_meta.video_path(i, video_key)
            if not src_video.exists():
                continue
            # The flipped right-wrist view lands in the left-wrist slot (and vice versa).
            tgt_key = camera_swap.get(video_key, video_key)
            tgt_video = dst / str(src_meta.video_path(i, tgt_key).relative_to(src_meta.root))
            flip_video(src_video, tgt_video)

    out_meta = _meta.LeRobotMetadata(
        root=dst,
        info=dict(src_meta.info),
        episodes=[dict(ep) for ep in src_meta.episodes],
        tasks=dict(src_meta.tasks),
    )
    out_meta.save()

    # Mirror auxiliary stats files if present.
    stats_json = src_meta.root / "meta" / "stats.json"
    if stats_json.exists():
        with open(stats_json) as f:
            stats = json.load(f)
        mirrored = mirror_norm_stats(
            stats, left_dim=left_dim, right_dim=right_dim
        )
        with open(dst / "meta" / "stats.json", "w") as f:
            json.dump(mirrored, f, indent=2)
    eps_stats = src_meta.root / "meta" / "episodes_stats.jsonl"
    if eps_stats.exists():
        rows = _meta.read_jsonl(eps_stats)
        for row in rows:
            for col in swap_columns:
                entry = row.get("stats", {}).get(col)
                if not entry:
                    continue
                for field, vals in entry.items():
                    vals_arr = np.asarray(vals)
                    if vals_arr.size >= left_dim + right_dim:
                        entry[field] = swap_arms_in_array(vals_arr, left_dim, right_dim).tolist()
        _meta.write_jsonl(dst / "meta" / "episodes_stats.jsonl", rows)
    return out_meta


def create_mirror_and_merge(
    source: pathlib.Path | str,
    dst: pathlib.Path | str,
    *,
    left_dim: int = 7,
    right_dim: int = 7,
) -> _meta.LeRobotMetadata:
    """Full pipeline: mirror the dataset and merge original + mirrored into ``dst``."""
    import tempfile

    with tempfile.TemporaryDirectory(prefix="mirror_") as tmp:
        mirror_root = pathlib.Path(tmp) / "mirrored"
        create_mirror_dataset(source, mirror_root, left_dim=left_dim, right_dim=right_dim)
        merged = _split_merge.merge_datasets([source, mirror_root], dst)
    return merged
