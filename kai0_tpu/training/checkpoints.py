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
    resuming = False
    if checkpoint_dir.exists():
        if overwrite:
            import shutil

            shutil.rmtree(checkpoint_dir)
            checkpoint_dir.mkdir(parents=True, exist_ok=True)
            logger.info(f"Wiped checkpoint directory {checkpoint_dir}")
        elif resume:
            resuming = True
        else:
            raise FileExistsError(
                f"Checkpoint directory {checkpoint_dir} already exists. Use --overwrite or --resume "
                "to indicate how to handle it."
            )

    checkpoint_dir.mkdir(parents=True, exist_ok=True)

    mngr = ocp.CheckpointManager(
        checkpoint_dir,
        item_handlers={
            "assets": CallbackHandler(),
            "train_state": ocp.PyTreeCheckpointHandler(),
            "params": ocp.PyTreeCheckpointHandler(),
        },
        options=ocp.CheckpointManagerOptions(
            max_to_keep=1,
            keep_period=keep_period,
            create=False,
            async_options=ocp.AsyncOptions(timeout_secs=7200),
        ),
    )

    # Resume requested but no checkpoint was ever written: start fresh.
    if resuming and tuple(mngr.all_steps()) in [(), (0,)]:
        logger.info("Checkpoint directory exists, but does not contain any checkpoints. Aborting resume.")
        resuming = False

    return mngr, resuming


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
    """Checkpoint handler that runs an arbitrary callback (save only)."""

    def save(self, directory, args: "CallbackSave"):
        if jax.process_index() == 0:
            args.callback(pathlib.Path(directory))

    async def async_save(self, directory, args: "CallbackSave") -> list[futures.Future]:
        import orbax.checkpoint.future as ocp_future

        return [ocp_future.CommitFutureAwaitingContractedSignals(asyncio.to_thread(self.save, directory, args))]

    def restore(self, *args, **kwargs):
        raise NotImplementedError("CallbackHandler does not support restore")


@ocp.args.register_with_handler(CallbackHandler, for_save=True)
@dataclasses.dataclass
class CallbackSave(ocp.args.CheckpointArgs):
    callback: Callback


@ocp.args.register_with_handler(CallbackHandler, for_restore=True)
class CallbackRestore(ocp.args.CheckpointArgs): ...


def _split_params(state: training_utils.TrainState) -> tuple[training_utils.TrainState, dict]:
    """Pull the inference params (EMA when enabled) out as their own item."""
    if state.ema_params is not None:
        params = state.ema_params
        train_state = dataclasses.replace(state, ema_params=None)
    else:
        params = state.params
        train_state = dataclasses.replace(state, params={})
    return train_state, params


def _merge_params(train_state: training_utils.TrainState, params: dict) -> training_utils.TrainState:
    # Presence of params in train_state means the split pulled out EMA params.
    if train_state.params:
        return dataclasses.replace(train_state, ema_params=params["params"])
    return dataclasses.replace(train_state, params=params["params"])


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
