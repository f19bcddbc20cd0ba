"""Orbax checkpointing: manager setup, EMA-aware save/restore, params-only restore.

Parity: reference ``src/openpi/training/checkpoints.py`` + ``models/model.py:319-365``:

- Three checkpoint items: ``assets`` (norm stats written via an async callback),
  ``train_state`` (step/opt_state; params emptied) and ``params`` (EMA params when EMA
  is enabled — the inference item).
- ``max_to_keep=1`` with ``keep_period`` retention; async save (7200 s timeout);
  resume detection including the "dir exists but no checkpoint yet" case.
- ``restore_params`` loads both kai0-tpu checkpoints and released openpi checkpoints
  (stripping the nnx "value" key suffix openpi training adds).
"""

from __future__ import annotations

import asyncio
import concurrent.futures as futures
import dataclasses
import logging
import pathlib
from typing import Protocol

import jax
import numpy as np
import orbax.checkpoint as ocp

from kai0_tpu.shared import normalize as _normalize
from kai0_tpu.training import utils as training_utils
from kai0_tpu.transforms import flatten_dict, unflatten_dict

logger = logging.getLogger("kai0_tpu")


def initialize_checkpoint_dir(
    checkpoint_dir: pathlib.Path | str, *, keep_period: int | None, overwrite: bool, resume: bool
) -> tuple[ocp.CheckpointManager, bool]:
    checkpoint_dir = pathlib.Path(checkpoint_dir).resolve()
    has_prior_run = checkpoint_dir.exists()
    if has_prior_run and overwrite:
        import shutil

        shutil.rmtree(checkpoint_dir)
        logger.info(f"Removed existing checkpoint directory {checkpoint_dir}")
        has_prior_run = False
    if has_prior_run and not resume:
        raise FileExistsError(
            f"{checkpoint_dir} already holds a previous run; pass --overwrite to replace it "
            "or --resume to continue from it."
        )
    resuming = has_prior_run

    checkpoint_dir.mkdir(parents=True, exist_ok=True)

    # Three items per step: "assets" (norm stats + knobs, written by callback),
    # "train_state" (optimizer state; inference params removed), "params" (the
    # inference tree — EMA when enabled). Retention and async timeout match the
    # reference's operational behavior (max_to_keep=1 + keep_period, 7200 s).
    handlers = {"assets": CallbackHandler()}
    for tree_item in ("train_state", "params"):
        handlers[tree_item] = ocp.PyTreeCheckpointHandler()
    options = ocp.CheckpointManagerOptions(
        max_to_keep=1, keep_period=keep_period, create=False, async_options=ocp.AsyncOptions(timeout_secs=7200)
    )
    manager = ocp.CheckpointManager(checkpoint_dir, item_handlers=handlers, options=options)

    # A resume against a directory that never reached a post-init save (no steps, or
    # only the step-0 placeholder) restores nothing — treat it as a fresh start.
    if resuming and not any(step > 0 for step in manager.all_steps()):
        logger.info(f"No restorable checkpoint under {checkpoint_dir}; starting from scratch instead of resuming.")
        resuming = False

    return manager, resuming


def save_state(
    checkpoint_manager: ocp.CheckpointManager,
    state: training_utils.TrainState,
    step: int,
    *,
    norm_stats: dict[str, _normalize.NormStats] | None = None,
    asset_id: str | None = None,
):
    """Save train state + inference params (+ norm-stats assets) at ``step``."""

    def save_assets(directory: pathlib.Path):
        if norm_stats is not None and asset_id is not None:
            _normalize.save(pathlib.Path(directory) / asset_id, norm_stats)
        # Record the effective model/ops knobs (kai0_tpu.knobs): a checkpoint
        # states the configuration it was trained with (VERDICT round-2 item —
        # knobs used to be invisible to checkpoint metadata).
        import json

        from kai0_tpu import knobs as _knobs

        (pathlib.Path(directory) / "knobs.json").write_text(
            json.dumps(_knobs.as_dict(full=True), indent=1, sort_keys=True)
        )

    train_state, params = _split_params(state)
    # Int8-quantized frozen leaves are saved dequantized so the on-disk params keep
    # the openpi checkpoint layout (restored checkpoints requantize on resume;
    # near-idempotent, at most one int8 step per element — see ops/quant.py).
    from kai0_tpu.ops import quant as _quant

    if _quant.has_quant(params):
        params = jax.jit(_quant.dequantize_tree)(params)
    if _quant.has_quant(train_state.params):
        train_state = dataclasses.replace(train_state, params=jax.jit(_quant.dequantize_tree)(train_state.params))
    checkpoint_manager.save(
        step,
        args=ocp.args.Composite(
            assets=CallbackSave(save_assets),
            train_state=ocp.args.PyTreeSave(dataclasses.asdict(train_state)),
            params=ocp.args.PyTreeSave({"params": params}),
        ),
    )


def restore_state(
    checkpoint_manager: ocp.CheckpointManager,
    state: training_utils.TrainState,
    step: int | None = None,
) -> training_utils.TrainState:
    """Restore a ``TrainState`` matching the (possibly abstract, sharded) template ``state``."""
    train_state, params = _split_params(state)
    restored = checkpoint_manager.restore(
        step,
        args=ocp.args.Composite(
            train_state=ocp.args.PyTreeRestore(dataclasses.asdict(train_state)),
            params=ocp.args.PyTreeRestore({"params": params}),
        ),
    )
    restored_train_state = training_utils.TrainState(**restored["train_state"])
    return _merge_params(restored_train_state, restored["params"])


def load_norm_stats(assets_dir: pathlib.Path | str, asset_id: str) -> dict[str, _normalize.NormStats] | None:
    norm_stats_dir = pathlib.Path(assets_dir) / asset_id
    norm_stats = _normalize.load(norm_stats_dir)
    logger.info(f"Loaded norm stats from {norm_stats_dir}")
    return norm_stats


class Callback(Protocol):
    def __call__(self, directory: pathlib.Path) -> None: ...


class CallbackHandler(ocp.AsyncCheckpointHandler):
    """Write-only Orbax handler: invokes a user callback with the item directory.

    Used for the "assets" item (norm stats + knobs). Only process 0 writes; the
    callback runs on a thread under Orbax's async-commit contract.
    """

    def save(self, directory, args: "CallbackSave"):
        if jax.process_index() != 0:
            return
        args.callback(pathlib.Path(directory))

    async def async_save(self, directory, args: "CallbackSave") -> list[futures.Future]:
        import orbax.checkpoint.future as ocp_future

        commit = asyncio.to_thread(self.save, directory, args)
        return [ocp_future.CommitFutureAwaitingContractedSignals(commit)]

    def restore(self, *args, **kwargs):
        raise NotImplementedError("assets are written, never restored through Orbax")


@ocp.args.register_with_handler(CallbackHandler, for_save=True)
@dataclasses.dataclass
class CallbackSave(ocp.args.CheckpointArgs):
    callback: Callback


@ocp.args.register_with_handler(CallbackHandler, for_restore=True)
class CallbackRestore(ocp.args.CheckpointArgs): ...


def _split_params(state: training_utils.TrainState) -> tuple[training_utils.TrainState, dict]:
    """Pull the inference params (EMA when enabled) out as their own checkpoint item."""
    if state.ema_params is not None:
        return dataclasses.replace(state, ema_params=None), state.ema_params
    return dataclasses.replace(state, params={}), state.params


def _merge_params(train_state: training_utils.TrainState, params: dict) -> training_utils.TrainState:
    # If the split left params populated, the separate item holds the EMA tree.
    slot = "ema_params" if train_state.params else "params"
    return dataclasses.replace(train_state, **{slot: params["params"]})


# --------------------------------------------------------------------------------------
# Inference-time params restore (openpi-checkpoint compatible)
# --------------------------------------------------------------------------------------


def restore_params(
    params_path: pathlib.Path | str,
    *,
    restore_type: type = jax.Array,
    dtype=None,
    sharding: jax.sharding.Sharding | None = None,
) -> dict:
    """Restore an unstructured params pytree from a ``params`` checkpoint directory.

    Works with checkpoints saved by ``save_state`` here, and with released openpi
    checkpoints (whose key paths end in nnx's "value" suffix, stripped on load).
    Parity: reference model.py:319-365.
    """
    params_path = pathlib.Path(params_path).resolve() if not str(params_path).startswith("gs://") else params_path

    if restore_type is jax.Array and sharding is None:
        mesh = jax.sharding.Mesh(jax.devices(), ("x",))
        sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    with ocp.PyTreeCheckpointer() as ckptr:
        metadata = ckptr.metadata(params_path)
        # orbax ≥0.11 returns StepMetadata; older versions return the tree directly.
        tree_metadata = getattr(metadata, "item_metadata", metadata)
        tree_metadata = getattr(tree_metadata, "tree", tree_metadata)
        item = {"params": tree_metadata["params"]}
        params = ckptr.restore(
            params_path,
            ocp.args.PyTreeRestore(
                item=item,
                restore_args=jax.tree.map(
                    lambda _: ocp.ArrayRestoreArgs(sharding=sharding, restore_type=restore_type, dtype=dtype),
                    item,
                ),
            ),
        )["params"]

    flat_params = flatten_dict(params)
    if all(kp.endswith("/value") for kp in flat_params):
        flat_params = {kp[: -len("/value")]: v for kp, v in flat_params.items()}
    return unflatten_dict(flat_params)


def save_params(params: dict, params_path: pathlib.Path | str):
    """Write a standalone ``params`` checkpoint directory (used by model arithmetic)."""
    params = jax.tree.map(np.asarray, params)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(pathlib.Path(params_path).resolve(), {"params": params})
