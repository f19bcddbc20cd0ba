"""Train state and pytree logging helpers.

Functional counterpart of reference ``src/openpi/training/utils.py``: the state is a
plain registered dataclass of arrays (step, full params, optimizer state, optional EMA
params). Static pieces (the optax transformation, freeze masks, model config) live
outside the state so the whole thing is jit/donate/shard-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: dict
    opt_state: Any
    ema_params: dict | None = None


def split_by_mask(params: dict, trainable_mask: dict) -> tuple[dict, dict]:
    """Split a params tree into (trainable, frozen) trees with identical structure,
    using None placeholders — so gradients are only computed for trainable leaves.

    Quantized frozen leaves (``QuantArray``) are treated as leaves so the boolean
    mask — built from the pre-quantization structure — still lines up."""
    from kai0_tpu.ops import quant as _quant

    trainable = jax.tree.map(lambda p, t: p if t else None, params, trainable_mask, is_leaf=_quant.is_quant)
    frozen = jax.tree.map(lambda p, t: None if t else p, params, trainable_mask, is_leaf=_quant.is_quant)
    return trainable, frozen


def merge_by_mask(trainable: dict, frozen: dict) -> dict:
    """Inverse of ``split_by_mask``."""
    return jax.tree.map(
        lambda t, f: t if f is None else f,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def array_tree_to_info(tree) -> str:
    """Human-readable summary of a pytree of arrays (shape/dtype/sharding), for logs."""
    lines = []

    def visit(path, x):
        if hasattr(x, "shape"):
            sharding = ""
            if hasattr(x, "sharding") and hasattr(x.sharding, "spec"):
                sharding = f" {x.sharding.spec}"
            lines.append(f"  {jax.tree_util.keystr(path)}: {tuple(x.shape)} {np.dtype(x.dtype).name}{sharding}")
        return x

    jax.tree_util.tree_map_with_path(visit, tree)
    return "\n".join(lines[:200])


def tree_size_bytes(tree) -> int:
    return sum(
        int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize for x in jax.tree.leaves(tree) if hasattr(x, "shape")
    )
