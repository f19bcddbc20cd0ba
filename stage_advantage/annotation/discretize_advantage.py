"""Discretize predicted advantage values into task_index labels.

Equivalent of the reference `stage_advantage/annotation/discretize_advantage.py`:
percentile-threshold (binary or n-slices, optionally per progress stage) labeling of
every frame, plus a rewritten `meta/tasks.jsonl` with advantage-suffixed prompts.

    python discretize_advantage.py <dataset_path> --threshold 30 \
        --discretion-type binary --advantage-source absolute_advantage \
        --stage-nums 2 --dry-run
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent.parent))
def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_path")
    parser.add_argument("--threshold", type=float, default=70.0,
                        help="Top threshold%% of frames get task_index=1 (binary mode)")
    parser.add_argument("--discretion-type", choices=["binary", "n_slices"], default="binary")
    parser.add_argument("--n-slices", type=int, default=10)
    parser.add_argument("--advantage-source", choices=["absolute_advantage", "relative_advantage"],
                        default="absolute_advantage")
    parser.add_argument("--stage-nums", type=int, default=1,
                        help="Per-stage percentiles using each frame's stage_progress_gt")
    parser.add_argument("--base-prompt", default="fold the cloth")
    parser.add_argument("--data-glob", default="data/chunk-*/*.parquet",
                        help="Glob for the parquet shards to label (e.g. data_KAI0_30000/...)")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    from kai0_tpu.advantage import discretize_dataset

    stats = discretize_dataset(
        args.data_path,
        threshold=args.threshold,
        discretion_type=args.discretion_type,
        n_slices=args.n_slices,
        advantage_source=args.advantage_source,
        stage_nums=args.stage_nums,
        base_prompt=args.base_prompt,
        data_glob=args.data_glob,
        dry_run=args.dry_run,
    )
    for stage, s in stats.items():
        print(f"stage {stage}: mean={s['mean']:.6f} std={s['std']:.6f} "
              f"min={s['min']:.6f} max={s['max']:.6f}")
        for p, v in s["percentiles"].items():
            print(f"  {p:3d}%: {v:.6f}")
    if args.dry_run:
        print("Dry run - no files modified")
    else:
        print("task_index and tasks.jsonl updated")


if __name__ == "__main__":
    main()
