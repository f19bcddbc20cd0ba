"""Evaluate a trained Advantage Estimator over a LeRobot dataset.

Writes `data_<model_name>_<steps>/` parquets with predicted advantage columns.
Equivalent of the reference `stage_advantage/annotation/eval.py` (registry :48-93,
episode loop :161-224); the model registry maps (model_type, model_name) to a train
config + checkpoint, extend `MODELS_CONFIG_MAP` for new tasks.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent.parent))
# (model_type, model_name) → estimator config + checkpoint + inference mode.
MODELS_CONFIG_MAP: dict[str, dict[str, dict]] = {
    "Flatten-Fold": {
        "KAI0": {
            "name": "KAI0",
            "config_name": "ADVANTAGE_TORCH_KAI0_FLATTEN_FOLD",
            "ckpt_dir": "./checkpoints/ADVANTAGE_TORCH_KAI0_FLATTEN_FOLD/estimator",
            "ckpt_steps": 30000,
            "mode": "2timesteps",
            "prompt": "Flatten and fold the cloth.",
            "batch_size": 160,
        },
        "PI06": {
            "name": "PI06",
            "config_name": "ADVANTAGE_TORCH_PI06_FLATTEN_FOLD",
            "ckpt_dir": "./checkpoints/ADVANTAGE_TORCH_PI06_FLATTEN_FOLD/estimator",
            "ckpt_steps": 30000,
            "mode": "1timestep",
            "prompt": "Flatten and fold the cloth.",
            "batch_size": 400,
        },
    },
}


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_type", choices=sorted(MODELS_CONFIG_MAP))
    parser.add_argument("model_name", choices=["PI06", "KAI0"])
    parser.add_argument("repo_id", help="Path to the LeRobot dataset root")
    parser.add_argument("--ckpt_dir", default=None, help="Override checkpoint directory")
    parser.add_argument("--config_name", default=None, help="Override train config name")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--relative_interval", type=int, default=50)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args()

    from kai0_tpu.advantage import SimpleValueEvaluator, annotate_dataset

    cfg = MODELS_CONFIG_MAP[args.model_type][args.model_name]
    config_name = args.config_name or cfg["config_name"]
    ckpt_dir = args.ckpt_dir or f"{cfg['ckpt_dir']}/{cfg['ckpt_steps']}"

    evaluator = SimpleValueEvaluator(config_name, ckpt_dir, batch_size=args.batch_size or cfg["batch_size"])
    written = annotate_dataset(
        evaluator,
        args.repo_id,
        prompt=cfg["prompt"],
        output_tag=f"{cfg['name']}_{cfg['ckpt_steps']}",
        mode=cfg["mode"],
        relative_interval=args.relative_interval,
        batch_size=args.batch_size,
        overwrite=args.overwrite,
    )
    print(f"Annotated {len(written)} episodes")


if __name__ == "__main__":
    main()
