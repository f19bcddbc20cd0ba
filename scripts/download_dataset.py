"""Download the Kai0 demonstration datasets (Task_A/B/C) from the HF hub.

Equivalent of the reference ``scripts/download_dataset.py``: snapshot-download of
the dataset repo, optionally restricted to specific tasks via path patterns.
Requires network access; in offline environments, point ``--local_dir`` at a
pre-populated mirror instead.
"""

from __future__ import annotations

import argparse
import sys

TASK_DIRS = {"FlattenFold": "Task_A", "HangCloth": "Task_B", "TeeShirtSort": "Task_C"}


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--repo_id", default="OpenDriveLab/Kai0-Data")
    parser.add_argument("--tasks", nargs="*", choices=sorted(TASK_DIRS), default=None)
    parser.add_argument("--local_dir", default="./data/kai0")
    args = parser.parse_args()

    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print("huggingface_hub is not installed; cannot download.", file=sys.stderr)
        return 1

    allow_patterns = None
    if args.tasks:
        allow_patterns = [f"{TASK_DIRS[t]}/*" for t in args.tasks]
    print(f"Repo: {args.repo_id}" + (f", tasks: {args.tasks}" if args.tasks else " (all tasks)"))
    try:
        snapshot_download(
            repo_id=args.repo_id,
            repo_type="dataset",
            local_dir=args.local_dir,
            allow_patterns=allow_patterns,
        )
    except Exception as e:  # noqa: BLE001
        print(f"Download failed (offline environment?): {e}", file=sys.stderr)
        return 1
    print(f"Downloaded to {args.local_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
