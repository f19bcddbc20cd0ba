"""Mix PyTorch-format kai0/openpi checkpoints (model.safetensors) with weighted averaging.

CLI parity with the reference ``model_arithmetic/arithmetic_torch.py``: resolves
``model.safetensors`` checkpoint dirs, mixes state dicts in float64, saves the mixed
``model.safetensors`` plus a weighted-average ``norm_stats.json``. Weight selection:
``average`` / manual ``--weights`` / ``inverse_loss`` from externally computed
``--losses`` (this framework has no torch model mirror by design — loss-based
optimization of JAX checkpoints lives in ``arithmetic.py``, which keeps all N
checkpoints device-resident on the TPU mesh).
"""

from __future__ import annotations

import argparse
import logging
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

logger = logging.getLogger("kai0_tpu")


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


def main(argv=None):
    parser = argparse.ArgumentParser(description="Mix PyTorch safetensors checkpoints.")
    parser.add_argument("--checkpoints", nargs="+", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--weights", nargs="+", type=float, default=None)
    parser.add_argument("--losses", nargs="+", type=float, default=None,
                        help="Per-checkpoint validation losses for inverse_loss weighting")
    parser.add_argument("--optimize_method", choices=["average", "inverse_loss"], default="average")
    args = parser.parse_args(argv)

    weights = args.weights
    if weights is None:
        if args.optimize_method == "inverse_loss":
            if args.losses is None or len(args.losses) != len(args.checkpoints):
                raise ValueError("--losses (one per checkpoint) required for inverse_loss")
            from kai0_tpu.arithmetic import core

            weights = core.compute_optimal_weights(args.losses)
        else:
            weights = [1.0 / len(args.checkpoints)] * len(args.checkpoints)
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
