"""Jax-free dataset wrapper + process-pool worker entry points.

This module is what data-loader worker processes import when unpickling the
dataset (spawn resolves classes/functions by module path); it must stay free of
jax/flax imports — workers are numpy/cv2 only (see
:class:`kai0_tpu.training.data_loader.NumpyDataLoader`).
"""

from __future__ import annotations

from collections.abc import Sequence


class TransformedDataset:
    """Applies a transform chain to each item of a random-access dataset."""

    def __init__(self, dataset, transforms: Sequence):
        self._dataset = dataset
        self._transforms = list(transforms)

    def __getitem__(self, index: int) -> dict:
        item = self._dataset[index]
        for transform in self._transforms:
            item = transform(item)
        return item

    def __len__(self) -> int:
        return len(self._dataset)


_WORKER_DATASET = None


def worker_init(pickled_dataset) -> None:
    """Process-pool initializer: unpickle the dataset once per worker."""
    import os
    import pickle

    os.environ["KAI0_DATA_WORKER"] = "1"  # keep jax out of the worker
    global _WORKER_DATASET
    _WORKER_DATASET = pickle.loads(pickled_dataset)


def worker_get(index: int):
    return _WORKER_DATASET[int(index)]
