"""Lightweight array typing helpers.

The reference uses jaxtyping+beartype runtime checks (``src/openpi/shared/
array_typing.py``). beartype is not available here and runtime typechecking adds
per-call overhead on the serving hot path, so we keep jaxtyping annotations as
documentation and expose cheap structural checks used at checkpoint-load time.
"""

from __future__ import annotations

import contextlib
from typing import Any, TypeAlias

import jax
import numpy as np

Array: TypeAlias = jax.Array | np.ndarray
PyTree: TypeAlias = Any
Params: TypeAlias = dict[str, Any]
KeyArrayLike: TypeAlias = jax.Array | int


@contextlib.contextmanager
def disable_typechecking():
    """Kept for API parity with the reference; typechecking is statically off."""
    yield


def check_pytree_equality(*, expected: PyTree, got: PyTree, check_shapes: bool = True, check_dtypes: bool = False):
    """Raise a readable error if two pytrees differ in structure (and optionally shape/dtype).

    Parity: reference array_typing.py:66+ (pretty checkpoint-mismatch errors).
    """
    expected_flat = dict(_flatten(expected))
    got_flat = dict(_flatten(got))
    missing = sorted(set(expected_flat) - set(got_flat))
    extra = sorted(set(got_flat) - set(expected_flat))
    if missing or extra:
        raise ValueError(
            "PyTree structure mismatch.\n"
            + (f"  Missing keys ({len(missing)}): {missing[:20]}\n" if missing else "")
            + (f"  Extra keys ({len(extra)}): {extra[:20]}\n" if extra else "")
        )
    errors = []
    for k, ev in expected_flat.items():
        gv = got_flat[k]
        if check_shapes and tuple(getattr(ev, "shape", ())) != tuple(getattr(gv, "shape", ())):
            errors.append(f"  {k}: shape {getattr(gv, 'shape', None)} != expected {getattr(ev, 'shape', None)}")
        if check_dtypes and getattr(ev, "dtype", None) != getattr(gv, "dtype", None):
            errors.append(f"  {k}: dtype {getattr(gv, 'dtype', None)} != expected {getattr(ev, 'dtype', None)}")
    if errors:
        raise ValueError("PyTree leaf mismatch:\n" + "\n".join(errors[:40]))


def _flatten(tree: PyTree, prefix: str = ""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}/{k}" if prefix else str(k))
    else:
        yield prefix, tree
