"""Training loop library: state init, jitted train step, main loop.

Functional counterpart of reference ``scripts/train.py``: eval_shape → FSDP sharding →
weight-loader merge on host → jitted sharded init; a single jitted train step (loss →
masked AdamW update → EMA) with donated state; checkpoint save/restore via Orbax.
All cross-device communication is emitted by XLA from the jit shardings
(train.py:251-256) and the in-model activation constraints.

The reference's latent save bug (train.py:281 passes an undefined config attr) is not
replicated (SURVEY.md §7 hard-parts list).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kai0_tpu.models import model as _model
from kai0_tpu.ops import quant as _quant
from kai0_tpu.parallel import sharding
from kai0_tpu.training import checkpoints as _checkpoints
from kai0_tpu.training import config as _config
from kai0_tpu.training import data_loader as _data_loader
from kai0_tpu.training import metrics as _metrics
from kai0_tpu.training import optimizer as _optimizer
from kai0_tpu.training import utils as training_utils
from kai0_tpu.transforms import flatten_dict, unflatten_dict

logger = logging.getLogger("kai0_tpu")


def _load_weights_and_validate(loader, params_shape: dict) -> dict:
    """Load partial weights and keep only concrete arrays (reference train.py:76-84)."""
    loaded_params = loader.load(params_shape)
    from kai0_tpu.shared import typing as at

    at.check_pytree_equality(expected=params_shape, got=loaded_params, check_shapes=True, check_dtypes=True)
    return unflatten_dict(
        {k: v for k, v in flatten_dict(loaded_params).items() if not isinstance(v, jax.ShapeDtypeStruct)}
    )


def init_train_state(config: _config.TrainConfig, init_rng, mesh, *, resume: bool, log: bool = True):
    """Returns (train_state | shapes, state_sharding, tx, trainable_mask)."""
    tx = _optimizer.create_optimizer(config.optimizer, config.lr_schedule, weight_decay_mask=None)

    # Structure-only pass to derive the trainable mask before tracing init.
    params_shape = jax.eval_shape(config.model.init_params, init_rng)
    trainable_mask = config.trainable_mask(params_shape)
    frozen_exists = not all(jax.tree.leaves(trainable_mask))

    def init(rng, partial_params=None):
        params = config.model.init_params(rng)
        if partial_params is not None:
            flat = flatten_dict(params)
            flat_loaded = flatten_dict(partial_params)
            unknown = set(flat_loaded) - set(flat)
            if unknown:
                raise ValueError(f"Loaded params contain unknown keys: {sorted(unknown)[:10]}")
            flat.update(flat_loaded)
            params = unflatten_dict(flat)
        if config.param_dtype is not None:
            # bf16 trainable storage (SR updates in train_step keep sub-ulp steps).
            params = jax.tree.map(lambda p: p.astype(config.param_dtype), params)
        if frozen_exists:
            # Frozen params are stored in bfloat16 (reference train.py:107).
            params = jax.tree.map(
                lambda p, t: p if t else p.astype(jnp.bfloat16), params, trainable_mask
            )
            if config.quantize_frozen:
                # Int8 frozen base: quantized once here, never updated (ops/quant.py).
                params = _quant.quantize_frozen_tree(params, trainable_mask)
        trainable, _ = training_utils.split_by_mask(params, trainable_mask)
        return training_utils.TrainState(
            step=jnp.asarray(0, dtype=jnp.int32),
            params=params,
            opt_state=tx.init(trainable),
            ema_params=None if config.ema_decay is None else params,
        )

    train_state_shape = jax.eval_shape(init, init_rng)
    state_sharding = sharding.fsdp_sharding(
        train_state_shape, mesh, min_size_mbytes=config.fsdp_min_size_mbytes, log=log
    )

    if resume:
        return train_state_shape, state_sharding, tx, trainable_mask

    partial_params = _load_weights_and_validate(config.weight_loader, params_shape)
    replicated_sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    train_state = jax.jit(
        init,
        donate_argnums=(1,),
        in_shardings=replicated_sharding,
        out_shardings=state_sharding,
    )(init_rng, partial_params)

    return train_state, state_sharding, tx, trainable_mask


def train_step(config, tx, trainable_mask, rng, state: training_utils.TrainState, batch):
    """One optimization step. Parity: reference train.py:139-194."""
    observation, actions = batch
    train_rng = jax.random.fold_in(rng, state.step)

    trainable, frozen = training_utils.split_by_mask(state.params, trainable_mask)

    def loss_fn(trainable_params):
        params = training_utils.merge_by_mask(trainable_params, frozen)
        chunked_loss = config.model.compute_loss(params, train_rng, observation, actions, train=True)
        return jnp.mean(chunked_loss)

    loss, grads = jax.value_and_grad(loss_fn)(trainable)

    updates, new_opt_state = tx.update(grads, state.opt_state, trainable)
    if config.param_dtype == "bfloat16":
        # bf16 trainable storage: stochastically-rounded apply (sub-ulp AdamW steps
        # accumulate in expectation; plain += would silently drop them).
        new_trainable = _optimizer.apply_updates_sr(
            trainable, updates, jax.random.fold_in(jax.random.key(0x7072, impl="rbg"), state.step)
        )
    else:
        new_trainable = optax.apply_updates(trainable, updates)
    new_params = training_utils.merge_by_mask(new_trainable, frozen)

    new_state = dataclasses.replace(
        state, step=state.step + 1, params=new_params, opt_state=new_opt_state
    )
    if config.ema_decay is not None:
        new_state = dataclasses.replace(
            new_state,
            ema_params=jax.tree.map(
                # Quantized (frozen) leaves never change — EMA passes them through.
                lambda old, new: old
                if _quant.is_quant(old)
                else config.ema_decay * old + (1 - config.ema_decay) * new,
                state.ema_params,
                new_params,
                is_leaf=_quant.is_quant,
            ),
        )

    info = {
        "loss": loss,
        # f32-accumulated for bf16 gradient trees (param_dtype="bfloat16"):
        # optax.global_norm would sum billions of bf16 squares in bf16 and the
        # logged metric would be noise. All-f32 trees take optax's exact path.
        "grad_norm": (
            optax.global_norm(grads)
            if all(g.dtype == jnp.float32 for g in jax.tree.leaves(grads))
            else _optimizer.global_norm_f32(grads)
        ),
    }
    return new_state, info


def param_norm(params: dict) -> jax.Array:
    """Kernel-params norm: >1-D weights excluding biases/scales/embeddings (train.py:180-188).

    Monitoring only — reads the full parameter tree (~7 GB HBM for π₀.₅), so it runs
    in the logging path at ``log_interval`` rather than inside every train step (the
    reference recomputes it per step; pure overhead in the hot loop).
    """
    flat = flatten_dict(params)
    kernel_params = [
        v
        for k, v in flat.items()
        if hasattr(v, "ndim") and v.ndim > 1 and k.split("/")[-1] not in ("bias", "scale", "pos_embedding", "input_embedding")
    ]
    # Int8-quantized leaves contribute their represented-weight norm (computed from
    # q/s without dequantizing) so the metric stays comparable with bf16 runs.
    quant_sq = sum(_quant.sq_norm(v) for v in flat.values() if _quant.is_quant(v))
    return jnp.sqrt(optax.global_norm(kernel_params) ** 2 + quant_sq)


def main(config: _config.TrainConfig):
    logger.info(f"Training config: {config.name} exp={config.exp_name}")
    # Resolve config-level model knobs (remat policies, int8) into the env the
    # model code reads at trace time — BEFORE any jit. Explicit env vars win
    # (CLI override); the effective values are logged so runs reproduce from the
    # config name + this line.
    logger.info(f"Model knobs: {config.apply_model_knobs()}")

    # The batch dim is sharded over (batch, fsdp) only — a tp group shares its
    # per-group batch shard, so the divisor is devices/tp, not devices.
    n_data_shards = jax.device_count() // max(config.tp_devices, 1)
    if config.batch_size % n_data_shards != 0:
        raise ValueError(
            f"Batch size {config.batch_size} must be divisible by the number of data shards "
            f"{n_data_shards} (devices {jax.device_count()} / tp {config.tp_devices})."
        )

    rng = jax.random.key(config.seed)
    train_rng, init_rng = jax.random.split(rng)

    mesh = sharding.make_mesh(config.fsdp_devices, num_tp_devices=config.tp_devices)
    data_sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(sharding.DATA_AXIS))
    replicated_sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    checkpoint_manager, resuming = _checkpoints.initialize_checkpoint_dir(
        config.checkpoint_dir,
        keep_period=config.keep_period,
        overwrite=config.overwrite,
        resume=config.resume,
    )

    metrics_logger = _metrics.MetricsLogger(
        config.checkpoint_dir, resuming=resuming, enabled=config.wandb_enabled, config=config
    )

    data_loader = _data_loader.create_data_loader(config, sharding=data_sharding, shuffle=True)
    data_config = data_loader.data_config()
    data_iter = iter(data_loader)
    batch = next(data_iter)
    logger.info(f"Initialized data loader:\n{training_utils.array_tree_to_info(batch)}")

    train_state, train_state_sharding, tx, trainable_mask = init_train_state(
        config, init_rng, mesh, resume=resuming
    )
    jax.block_until_ready(train_state if not resuming else ())

    if resuming:
        if config.quantize_frozen:
            # Checkpoints store the dequantized (openpi-layout) params: restore into
            # the plain-structure template, then requantize (near-idempotent — at
            # most one int8 step per element, see ops/quant.py).
            plain_shape, _, _, _ = init_train_state(
                # log=False: this is only a restore template — don't re-emit the
                # per-parameter sharding log a second time at every resume.
                dataclasses.replace(config, quantize_frozen=False), init_rng, mesh, resume=True, log=False
            )
            restored = _checkpoints.restore_state(checkpoint_manager, plain_shape)
            requant = jax.jit(lambda p: _quant.quantize_frozen_tree(p, trainable_mask))
            # Requantize one tree at a time, dropping the plain bf16 reference before
            # the next, so peak HBM stays (state + one quantized copy), not (state +
            # every copy at once) — matters on 16 GB chips with EMA enabled.
            plain_params, restored = restored.params, dataclasses.replace(restored, params=None)
            qparams = requant(plain_params)
            del plain_params
            qema = None
            if restored.ema_params is not None:
                plain_ema, restored = restored.ema_params, dataclasses.replace(restored, ema_params=None)
                qema = requant(plain_ema)
                del plain_ema
            train_state = dataclasses.replace(restored, params=qparams, ema_params=qema)
            # The dequantized checkpoint carries its own (plain-layout) shardings;
            # re-place everything on the quantized state sharding for the jit step.
            train_state = jax.device_put(train_state, train_state_sharding)
        else:
            train_state = _checkpoints.restore_state(checkpoint_manager, train_state)

    ptrain_step = jax.jit(
        functools.partial(train_step, config, tx, trainable_mask),
        in_shardings=(replicated_sharding, train_state_sharding, data_sharding),
        out_shardings=(train_state_sharding, replicated_sharding),
        donate_argnums=(1,),
    )

    start_step = int(train_state.step)
    profile_stop_step = None
    if config.profile_steps > 0:
        profile_stop_step = max(start_step + 1, config.profile_start_step) + config.profile_steps

    infos = []
    t_last = time.time()
    for step in range(start_step, config.num_train_steps):
        if profile_stop_step is not None and step == max(start_step + 1, config.profile_start_step):
            profile_dir = str(config.checkpoint_dir / "profile")
            logger.info(f"Capturing jax.profiler trace for {config.profile_steps} steps → {profile_dir}")
            jax.profiler.start_trace(profile_dir)
        with sharding.set_mesh(mesh):
            train_state, info = ptrain_step(train_rng, train_state, batch)
        if profile_stop_step is not None and step + 1 == profile_stop_step:
            jax.block_until_ready(info)
            jax.profiler.stop_trace()
            profile_stop_step = None
        infos.append(info)
        if step % config.log_interval == 0:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *infos)
            reduced = jax.device_get(jax.tree.map(jnp.mean, stacked))
            reduced["param_norm"] = float(jax.jit(param_norm)(train_state.params))
            elapsed = time.time() - t_last
            t_last = time.time()
            reduced["steps_per_sec"] = len(infos) / max(elapsed, 1e-9)
            info_str = ", ".join(f"{k}={float(v):.4f}" for k, v in reduced.items())
            logger.info(f"Step {step}: {info_str}")
            metrics_logger.log(reduced, step=step)
            infos = []
        batch = next(data_iter)

        if (step % config.save_interval == 0 and step > start_step) or step == config.num_train_steps - 1:
            _checkpoints.save_state(
                checkpoint_manager,
                train_state,
                step,
                norm_stats=data_config.norm_stats,
                asset_id=data_config.asset_id,
            )

    logger.info("Waiting for checkpoint manager to finish")
    checkpoint_manager.wait_until_finished()
    metrics_logger.close()
    return train_state
