"""Policy factory: assemble a trained Policy from a checkpoint.

Parity: reference ``src/openpi/policies/policy_config.py`` — restores bf16 params
from the Orbax ``params/`` item, loads norm stats from the checkpoint's
``assets/<asset_id>`` (so serving always uses the stats training used), and builds
the canonical transform chains:

    inputs : repack → InjectDefaultPrompt → data-in → Normalize → model-in
    outputs: model-out → Unnormalize → data-out → repack-out
"""

from __future__ import annotations

import logging
import pathlib
from typing import Any

import jax.numpy as jnp

from kai0_tpu import transforms as _transforms
from kai0_tpu.policies import policy as _policy
from kai0_tpu.shared import download as _download
from kai0_tpu.training import checkpoints as _checkpoints

logger = logging.getLogger("kai0_tpu")


def create_trained_policy(
    train_config,
    checkpoint_dir: pathlib.Path | str,
    *,
    repack_transforms: _transforms.Group | None = None,
    sample_kwargs: dict[str, Any] | None = None,
    default_prompt: str | None = None,
    norm_stats: dict | None = None,
    warmup: bool = False,
    quantize: bool = False,
    prompt_buckets: list[int] | None = None,
    fsdp_devices: int = 1,
    max_batch: int = 1,
    batch_wait_ms: float = 0.0,
    params: dict | None = None,
) -> _policy.Policy:
    repack_transforms = repack_transforms or _transforms.Group()
    checkpoint_dir = pathlib.Path(_download.maybe_download(str(checkpoint_dir)))
    # Install the config's model/ops knob overrides BEFORE any tracing, like
    # the train/bench entry points do (env vars still win — the registry's
    # precedence). Without this a config pinning e.g. knobs.int8_ffn would
    # train with it but silently serve with the defaults.
    logger.info(f"Model knobs: {train_config.apply_model_knobs()}")

    if params is None:
        logger.info(f"Loading model from {checkpoint_dir}...")
        # Reference detection rule (policy_config.py:48-57): a torch checkpoint ships
        # model.safetensors; the JAX layout ships an Orbax params/ item. kai0's released
        # advantage-estimator checkpoints are torch-format, so both must serve here.
        from kai0_tpu.interop import is_torch_checkpoint, load_torch_checkpoint

        if is_torch_checkpoint(checkpoint_dir):
            params = load_torch_checkpoint(
                checkpoint_dir, train_config.model, dtype=jnp.bfloat16, strict=False
            )
        else:
            params = _checkpoints.restore_params(checkpoint_dir / "params", dtype=jnp.bfloat16)
    if quantize:
        # Int8 gemma matmul weights: ~2x less HBM traffic on the bandwidth-bound
        # serving path (kai0_tpu/ops/quant.py). Changes action numerics slightly.
        from kai0_tpu.ops import quant as _quant

        params = _quant.quantize_inference_tree(params)

    data_config = train_config.data.create(train_config.assets_dirs, train_config.model)
    if norm_stats is None and data_config.asset_id is not None:
        # Load from the checkpoint, not the config assets dir: serving must use the
        # exact stats the training run used.
        try:
            norm_stats = _checkpoints.load_norm_stats(checkpoint_dir / "assets", data_config.asset_id)
        except FileNotFoundError:
            logger.warning(
                f"No norm stats under {checkpoint_dir / 'assets'} for asset {data_config.asset_id}; "
                "serving without normalization."
            )

    policy = _policy.Policy(
        train_config.model,
        params,
        transforms=[
            *repack_transforms.inputs,
            _transforms.InjectDefaultPrompt(default_prompt),
            *data_config.data_transforms.inputs,
            _transforms.Normalize(norm_stats, use_quantiles=data_config.use_quantile_norm),
            *data_config.model_transforms.inputs,
        ],
        output_transforms=[
            *data_config.model_transforms.outputs,
            _transforms.Unnormalize(norm_stats, use_quantiles=data_config.use_quantile_norm),
            *data_config.data_transforms.outputs,
            *repack_transforms.outputs,
        ],
        sample_kwargs=sample_kwargs,
        metadata=train_config.policy_metadata,
        prompt_buckets=prompt_buckets,
        mesh=_serve_mesh(fsdp_devices),
    )
    if max_batch > 1:
        # Coalesce concurrent requests into one device batch (multi-robot serving).
        from kai0_tpu.serving import batching as _batching

        policy = _batching.BatchingPolicy(policy, max_batch, wait_ms=batch_wait_ms)
    if warmup:
        policy.warmup(_warmup_example(train_config))
    return policy


def _serve_mesh(fsdp_devices: int):
    """A (1, fsdp_devices) mesh over the first N devices for sharded serving, or None."""
    if fsdp_devices <= 1:
        return None
    import jax

    from kai0_tpu.parallel import sharding as _sharding

    devices = jax.devices()
    if len(devices) < fsdp_devices:
        raise ValueError(f"--fsdp_devices={fsdp_devices} but only {len(devices)} devices are visible")
    return _sharding.make_mesh(fsdp_devices, devices=devices[:fsdp_devices])


def _warmup_example(train_config) -> dict | None:
    """Raw observation payload matching the config's robot family, or None.

    Warming through the FULL transform chain also compiles the host-side jitted
    helpers (resize_with_pad etc.), so the first client request hits zero compiles
    — ``fake_obs`` warmup alone leaves those cold (~10 s first-request stall over
    a remote compile path).
    """
    from kai0_tpu.policies import agilex_policy, aloha_policy, droid_policy, libero_policy
    from kai0_tpu.training import robot_configs

    data = train_config.data
    if isinstance(data, (robot_configs.LerobotAgilexDataConfig, robot_configs.LerobotARXDataConfig)):
        return agilex_policy.make_agilex_example()
    if isinstance(data, robot_configs.LeRobotAlohaDataConfig):
        return aloha_policy.make_aloha_example()
    if isinstance(data, (robot_configs.LeRobotDROIDDataConfig, robot_configs.RLDSDroidDataConfig)):
        return droid_policy.make_droid_example()
    if isinstance(data, robot_configs.LeRobotLiberoDataConfig):
        return libero_policy.make_libero_example()
    # Unknown data family (e.g. fake/simple configs): try the transform chain with
    # the agilex payload, falling back to spec-level warmup.
    return agilex_policy.make_agilex_example()
