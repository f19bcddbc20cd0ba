"""Mix kai0-tpu / openpi JAX checkpoints (Orbax) with weighted averaging.

CLI parity with reference ``model_arithmetic/arithmetic.py:442-461``:

    python model_arithmetic/arithmetic.py --config pi05_flatten_fold_normal \\
        --data-path val_batches.pkl --checkpoints ckpt_a ckpt_b \\
        --output mixed_ckpt --optimize_method gradient_descent

Weighting modes: average / inverse_loss / gradient_descent /
adaptive_gradient_descent / greedy / manual ``--weights``. The TPU redesign keeps
all N checkpoints device-resident and sharded during optimization (see
``kai0_tpu/arithmetic/core.py``). ``--gpu_ids``/``--memory_fraction`` are accepted
for CLI compatibility; they are no-ops on TPU.
"""

from __future__ import annotations

import argparse
import logging
import pathlib
import pickle
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
logger = logging.getLogger("kai0_tpu")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Mix JAX checkpoints with weighted averaging.")
    parser.add_argument("--config", required=True, help="Config name")
    parser.add_argument("--data-path", required=True, help="Validation batches pickle (see dump_data.py)")
    parser.add_argument("--checkpoints", nargs="+", required=True, help="Checkpoint directories")
    parser.add_argument("--weights", nargs="+", type=float, help="Manual weights")
    parser.add_argument("--output", required=True, help="Output directory")
    parser.add_argument(
        "--optimize_method",
        type=str,
        default="gradient_descent",
        choices=["average", "inverse_loss", "gradient_descent", "adaptive_gradient_descent", "greedy"],
    )
    parser.add_argument("--num_iterations", type=int, default=50)
    parser.add_argument("--learning_rate", type=float, default=0.05)
    parser.add_argument("--memory_fraction", type=float, default=0.8)  # compat no-op on TPU
    parser.add_argument("--gpu_ids", type=str, default="0")  # compat no-op on TPU
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from kai0_tpu.arithmetic import core
    from kai0_tpu.training import config as _config

    config = _config.get_config(args.config)
    with open(args.data_path, "rb") as f:
        batches = pickle.load(f)

    losses = []
    weights = args.weights
    if weights is None:
        if args.optimize_method == "average":
            n = len(args.checkpoints)
            weights = [1.0 / n] * n
        else:
            ensemble = core.DeviceEnsemble(list(args.checkpoints), config.model)
            if args.optimize_method == "inverse_loss":
                losses = ensemble.checkpoint_losses(batches)
                weights = core.compute_optimal_weights(losses)
            elif args.optimize_method in ("gradient_descent", "adaptive_gradient_descent"):
                weights = core.optimize_weights_gradient_descent(
                    ensemble,
                    batches,
                    num_iterations=args.num_iterations,
                    learning_rate=args.learning_rate,
                    adaptive=args.optimize_method == "adaptive_gradient_descent",
                )
            elif args.optimize_method == "greedy":
                weights = core.optimize_weights_greedy(ensemble, batches)
        logger.info(f"Optimized weights: {weights}")
    if len(weights) != len(args.checkpoints):
        raise ValueError("Number of weights must match number of checkpoints")

    logger.info("Mixing parameters...")
    params_list = [core.load_params(p) for p in args.checkpoints]
    mixed = core.mix_params(params_list, weights)
    del params_list
    core.save_mixed_checkpoint(mixed, args.output)
    del mixed

    # Mix norm stats when every checkpoint root carries one.
    norm_stats_paths = []
    for ckpt in args.checkpoints:
        root = pathlib.Path(ckpt)
        if root.name == "params":
            root = root.parent
        candidate = root / "norm_stats.json"
        if candidate.exists():
            norm_stats_paths.append(candidate)
    if len(norm_stats_paths) == len(args.checkpoints):
        stats = [core.load_norm_stats_json(p) for p in norm_stats_paths]
        core.save_norm_stats_json(
            core.mix_norm_stats(stats, weights=weights), pathlib.Path(args.output) / "norm_stats.json"
        )

    # Final eval of the mixed checkpoint.
    ensemble = core.DeviceEnsemble([args.output], config.model)
    mixed_loss = ensemble.loss([1.0], batches)
    print("=" * 60)
    for i, (ckpt, loss) in enumerate(zip(args.checkpoints, losses)):
        print(f"  Ckpt {i + 1} ({ckpt}): {loss:.6f} (w={weights[i]:.4f})")
    print(f"  Mixed: {mixed_loss:.6f}")
    print("=" * 60)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
