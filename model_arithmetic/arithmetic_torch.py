"""Mix PyTorch-format kai0/openpi checkpoints (model.safetensors).

CLI parity with the reference ``model_arithmetic/arithmetic_torch.py:118-425``:
resolves ``model.safetensors`` checkpoint dirs, selects weights by
``average`` / manual ``--weights`` / ``inverse_loss`` / ``gradient_descent`` /
``adaptive_gradient_descent`` / ``greedy``, mixes state dicts in float64, saves
the mixed ``model.safetensors`` plus a weighted-average ``norm_stats.json``.

Loss-driven modes run through the TPU-native optimizer: each torch checkpoint is
converted to the JAX layout (``kai0_tpu/interop``) and kept device-resident on
the mesh by ``kai0_tpu/arithmetic/core.py`` — no torch mirror of the model is
needed. The final mixed weights are applied to the raw safetensors state dicts
(float64 on host, exactly like the reference's ``mix_params``), so the output is
a byte-layout-faithful torch checkpoint.

``inverse_loss`` accepts externally computed ``--losses`` as before; without
them it evaluates each checkpoint on ``--data-path`` batches like the reference.
"""

from __future__ import annotations

import argparse
import logging
import pathlib
import pickle
import sys

import numpy as np

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
logger = logging.getLogger("kai0_tpu")

_OPT_METHODS = (
    "average",
    "inverse_loss",
    "gradient_descent",
    "adaptive_gradient_descent",
    "greedy",
)


def resolve_torch_ckpt_path(path: str | pathlib.Path) -> pathlib.Path:
    """Dir containing model.safetensors (accepts .../params aliases)."""
    p = pathlib.Path(path)
    if (p / "model.safetensors").exists():
        return p
    if p.name == "params" and (p.parent / "model.safetensors").exists():
        return p.parent
    raise FileNotFoundError(f"Invalid PyTorch checkpoint path (no model.safetensors): {p}")


def load_torch_params(checkpoint_path: str | pathlib.Path) -> dict[str, np.ndarray]:
    import safetensors.numpy

    resolved = resolve_torch_ckpt_path(checkpoint_path)
    return safetensors.numpy.load_file(str(resolved / "model.safetensors"))


def save_torch_params(flat_params: dict[str, np.ndarray], output_dir: str | pathlib.Path) -> pathlib.Path:
    import safetensors.numpy

    out_dir = pathlib.Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / "model.safetensors"
    safetensors.numpy.save_file(flat_params, str(out_path))
    return out_path


def mix_torch_params(
    params_list: list[dict[str, np.ndarray]], weights
) -> dict[str, np.ndarray]:
    """Key-wise weighted average in float64, cast back to each param's dtype."""
    weights = np.asarray(weights, dtype=np.float64)
    if abs(weights.sum() - 1.0) > 1e-6:
        raise ValueError(f"Weights must sum to 1.0, got {weights.sum()}")
    keys = set(params_list[0])
    for i, params in enumerate(params_list[1:], start=1):
        if set(params) != keys:
            missing = keys.symmetric_difference(params)
            raise ValueError(f"Checkpoint {i} key mismatch (e.g. {sorted(missing)[:3]})")
    mixed = {}
    for key in params_list[0]:
        acc = np.zeros(params_list[0][key].shape, dtype=np.float64)
        for w, params in zip(weights, params_list):
            acc += w * params[key].astype(np.float64)
        mixed[key] = acc.astype(params_list[0][key].dtype)
    return mixed


def optimize_weights(args) -> list[float]:
    """Loss-driven weight selection over torch checkpoints via the JAX ensemble."""
    from kai0_tpu.arithmetic import core
    from kai0_tpu.training import config as _config

    if args.config is None or args.data_path is None:
        raise ValueError(f"--config and --data-path are required for {args.optimize_method}")
    config = _config.get_config(args.config)
    with open(args.data_path, "rb") as f:
        batches = pickle.load(f)

    ensemble = core.DeviceEnsemble(list(args.checkpoints), config.model)
    if args.optimize_method == "inverse_loss":
        losses = ensemble.checkpoint_losses(batches)
        logger.info(f"Per-checkpoint losses: {losses}")
        return core.compute_optimal_weights(losses)
    if args.optimize_method == "greedy":
        return core.optimize_weights_greedy(ensemble, batches)
    return core.optimize_weights_gradient_descent(
        ensemble,
        batches,
        num_iterations=args.num_iterations,
        learning_rate=args.learning_rate,
        adaptive=args.optimize_method == "adaptive_gradient_descent",
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description="Mix PyTorch safetensors checkpoints.")
    parser.add_argument("--checkpoints", nargs="+", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--weights", nargs="+", type=float, default=None)
    parser.add_argument("--losses", nargs="+", type=float, default=None,
                        help="Per-checkpoint validation losses for inverse_loss weighting "
                             "(skips on-device evaluation)")
    parser.add_argument("--optimize_method", choices=_OPT_METHODS, default="average")
    parser.add_argument("--config", default=None, help="Train config name (loss-driven modes)")
    parser.add_argument("--data-path", default=None,
                        help="Validation batches pickle from dump_data.py (loss-driven modes)")
    parser.add_argument("--num_iterations", type=int, default=50)
    parser.add_argument("--learning_rate", type=float, default=0.05)
    args = parser.parse_args(argv)

    weights = args.weights
    if weights is None:
        if args.optimize_method == "average":
            weights = [1.0 / len(args.checkpoints)] * len(args.checkpoints)
        elif args.optimize_method == "inverse_loss" and args.losses is not None:
            if len(args.losses) != len(args.checkpoints):
                raise ValueError("--losses must have one value per checkpoint")
            from kai0_tpu.arithmetic import core

            weights = core.compute_optimal_weights(args.losses)
        else:
            weights = optimize_weights(args)
    if len(weights) != len(args.checkpoints):
        raise ValueError("Number of weights must match number of checkpoints")
    logger.info(f"Mixing weights: {weights}")

    params_list = [load_torch_params(p) for p in args.checkpoints]
    mixed = mix_torch_params(params_list, weights)
    del params_list
    out = save_torch_params(mixed, args.output)
    logger.info(f"Saved mixed checkpoint to {out}")

    # Weighted-average norm stats when every checkpoint carries one.
    from kai0_tpu.arithmetic import core

    stats_paths = []
    for ckpt in args.checkpoints:
        root = resolve_torch_ckpt_path(ckpt)
        for candidate in (root / "norm_stats.json", root / "assets" / "norm_stats.json"):
            if candidate.exists():
                stats_paths.append(candidate)
                break
    if len(stats_paths) == len(args.checkpoints):
        stats = [core.load_norm_stats_json(p) for p in stats_paths]
        core.save_norm_stats_json(
            core.mix_norm_stats(stats, weights=weights),
            pathlib.Path(args.output) / "norm_stats.json",
        )
        logger.info("Saved mixed norm_stats.json")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
