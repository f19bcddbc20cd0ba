"""Compute normalization statistics for a config (full-pipeline path).

Runs the dataset through the repack + robot data transforms (everything *before*
Normalize), streams ``state``/``actions`` through ``RunningStats``, and saves
``norm_stats.json`` under ``<assets_dirs>/<asset_id>``.

TPU-native equivalent of the reference ``scripts/compute_norm_stats.py:89-113``; the
RLDS branch is gated behind the optional TF dependency.
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
import kai0_tpu.training.data_loader as _data_loader


class RemoveStrings:
    """Strings are not needed for stats and cannot be stacked uniformly."""

    def __call__(self, x: dict) -> dict:
        return {k: v for k, v in x.items() if not np.issubdtype(np.asarray(v).dtype, np.str_)}


def main(config_name: str, max_frames: int | None = None, batch_size: int | None = None) -> pathlib.Path:
    config = _config.get_config(config_name)
    data_config = config.data.create(config.assets_dirs, config.model)
    if data_config.repo_id is None:
        raise ValueError("Data config must have a repo_id")

    dataset = _data_loader.create_dataset(data_config, config.model)
    dataset = _data_loader.TransformedDataset(
        dataset,
        [
            *data_config.repack_transforms.inputs,
            *data_config.data_transforms.inputs,
            RemoveStrings(),
        ],
    )

    bs = batch_size or config.batch_size
    num_frames = len(dataset) if max_frames is None else min(max_frames, len(dataset))
    keys = ["state", "actions"]
    stats = {key: normalize.RunningStats() for key in keys}

    for start in tqdm.tqdm(range(0, num_frames - num_frames % bs, bs), desc="Computing stats"):
        batch = [dataset[i] for i in range(start, start + bs)]
        for key in keys:
            stats[key].update(np.stack([np.asarray(item[key]) for item in batch]))

    norm_stats = {key: s.get_statistics() for key, s in stats.items()}

    output_path = config.assets_dirs / (data_config.asset_id or data_config.repo_id)
    print(f"Writing stats to: {output_path}")
    normalize.save(output_path, norm_stats)
    return output_path


def cli() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config_name")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    args = parser.parse_args()
    main(args.config_name, args.max_frames, args.batch_size)


if __name__ == "__main__":
    cli()
