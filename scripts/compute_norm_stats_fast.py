"""Compute normalization statistics — fast parquet-direct path.

Walks the LeRobot repo's parquet files directly (no video decode, no transform
pipeline), clamps state/actions outliers outside [-pi, pi] to 0, pads to the model
action dim, and feeds ``RunningStats`` in fixed batches of 32 so the floating-point
accumulation is bit-identical to the full-pipeline path.

TPU-native equivalent of the reference ``scripts/compute_norm_states_fast.py``
(clamp :39-55, batch-32 accumulation :187-198, save :216-221).
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np
import tqdm

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import kai0_tpu.shared.normalize as normalize
import kai0_tpu.training.config as _config

STATE_COL = "observation.state"
ACTION_COL = "action"
ACCUM_BATCH = 32  # fixed accumulation batch for bit-identical stats


def _clamp_and_pad(data: np.ndarray, target_dim: int) -> np.ndarray:
    """Zero out values outside [-pi, pi], then pad/truncate the last dim."""
    data = np.asarray(data, dtype=np.float64)
    data = np.where(np.abs(data) > np.pi, 0.0, data)
    if data.shape[-1] >= target_dim:
        return data[..., :target_dim]
    pad = np.zeros((*data.shape[:-1], target_dim - data.shape[-1]))
    return np.concatenate([data, pad], axis=-1)


def compute_stats_from_parquet(
    base_dir: str | pathlib.Path, action_dim: int, max_frames: int | None = None
) -> dict[str, normalize.NormStats]:
    import pandas as pd

    base_path = pathlib.Path(base_dir)
    if not base_path.exists():
        raise ValueError(f"Base directory does not exist: {base_dir}")

    parquet_files = sorted(str(p) for p in base_path.rglob("*.parquet"))
    print(f"Found {len(parquet_files)} parquet files under {base_dir}")

    collected: dict[str, list[np.ndarray]] = {"state": [], "actions": []}
    total_frames = 0
    for file_path in tqdm.tqdm(parquet_files, desc="Reading parquet"):
        try:
            df = pd.read_parquet(file_path)
        except Exception as e:  # noqa: BLE001 — skip unreadable shards, keep going
            print(f"Failed to read {file_path}: {e}")
            continue
        if STATE_COL not in df.columns or ACTION_COL not in df.columns:
            continue
        take = len(df)
        if max_frames is not None:
            take = min(take, max_frames - total_frames)
            if take <= 0:
                break
        states = np.stack([np.asarray(x) for x in df[STATE_COL].iloc[:take]])
        actions = np.stack([np.asarray(x) for x in df[ACTION_COL].iloc[:take]])
        collected["state"].append(_clamp_and_pad(states, action_dim))
        collected["actions"].append(_clamp_and_pad(actions, action_dim))
        total_frames += take

    print(f"Collected {total_frames} frames")
    stats = {key: normalize.RunningStats() for key in collected}
    for key, chunks in collected.items():
        if not chunks:
            print(f"Warning: no data for key {key!r}")
            continue
        data = np.concatenate(chunks, axis=0)
        for i in tqdm.tqdm(range(0, len(data), ACCUM_BATCH), desc=f"Accumulating {key}"):
            stats[key].update(data[i : i + ACCUM_BATCH])
    return {key: s.get_statistics() for key, s in stats.items() if s.count > 1}


def main(config_name: str, base_dir: str | None = None, max_frames: int | None = None) -> pathlib.Path:
    config = _config.get_config(config_name)
    data_config = config.data.create(config.assets_dirs, config.model)
    if base_dir is None:
        if data_config.repo_id is None:
            raise ValueError("Either base_dir must be provided or config must have repo_id")
        from kai0_tpu.data import lerobot_dataset

        base_dir = str(lerobot_dataset.resolve_dataset_root(data_config.repo_id))
        print(f"Auto-detected base directory from config: {base_dir}")

    norm_stats = compute_stats_from_parquet(base_dir, config.model.action_dim, max_frames)

    output_path = config.assets_dirs / (data_config.asset_id or data_config.repo_id)
    print(f"Writing stats to: {output_path}")
    normalize.save(output_path, norm_stats)
    return output_path


def cli() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config_name")
    parser.add_argument("--base_dir", default=None)
    parser.add_argument("--max_frames", type=int, default=None)
    args = parser.parse_args()
    main(args.config_name, args.base_dir, args.max_frames)


if __name__ == "__main__":
    cli()
