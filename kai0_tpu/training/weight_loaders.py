"""Weight loaders: partial parameter initialization from checkpoints.

Parity: reference ``src/openpi/training/weight_loaders.py`` — ``NoOpWeightLoader``,
``CheckpointWeightLoader`` (restore as numpy, merge missing LoRA params by regex),
``PaliGemmaWeightLoader`` (official big_vision npz), and the regex-merge helper.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Protocol, runtime_checkable

import numpy as np

from kai0_tpu.shared import download
from kai0_tpu.transforms import flatten_dict, unflatten_dict


@runtime_checkable
class WeightLoader(Protocol):
    def load(self, params: dict) -> dict:
        """Return loaded params with structure identical to (a subset of) ``params``."""


@dataclasses.dataclass(frozen=True)
class NoOpWeightLoader(WeightLoader):
    def load(self, params: dict) -> dict:
        return params


@dataclasses.dataclass(frozen=True)
class CheckpointWeightLoader(WeightLoader):
    """Loads a full parameter set from an Orbax checkpoint ``params`` directory.

    Compatible with kai0-tpu training checkpoints and released openpi checkpoints
    (the loader strips nnx "value" suffixes — see ``checkpoints.restore_params``).
    """

    params_path: str

    def load(self, params: dict) -> dict:
        from kai0_tpu.training import checkpoints as _checkpoints

        loaded_params = _checkpoints.restore_params(
            download.maybe_download(self.params_path), restore_type=np.ndarray
        )
        # Add all missing LoRA weights from the reference (fresh-init) params.
        return _merge_params(loaded_params, params, missing_regex=".*lora.*")


@dataclasses.dataclass(frozen=True)
class PaliGemmaWeightLoader(WeightLoader):
    """Loads the official PaliGemma npz release, keeping extra (e.g. action expert) weights."""

    weight_path: str = "gs://vertex-model-garden-paligemma-us/paligemma/pt_224.npz"

    def load(self, params: dict) -> dict:
        path = download.maybe_download(self.weight_path, gs={"token": "anon"})
        with path.open("rb") as f:
            flat_params = dict(np.load(f, allow_pickle=False))
        loaded_params = {"PaliGemma": unflatten_dict(flat_params)["params"]}
        return _merge_params(loaded_params, params, missing_regex=".*")


def _merge_params(loaded_params: dict, params: dict, *, missing_regex: str) -> dict:
    """Merge loaded params over reference params; fill regex-matched missing keys from the reference."""
    flat_ref = flatten_dict(params)
    flat_loaded = flatten_dict(loaded_params)

    result = {}
    for k, v in flat_loaded.items():
        if k in flat_ref:
            ref_dtype = np.dtype(flat_ref[k].dtype)
            result[k] = v.astype(ref_dtype) if np.dtype(v.dtype) != ref_dtype else v

    pattern = re.compile(missing_regex)
    for k in {k for k in flat_ref if pattern.fullmatch(k)}:
        if k not in result:
            result[k] = flat_ref[k]

    return unflatten_dict(result)
