"""Split a LeRobot dataset into disjoint episode subsets (split_0..N).

Feeds Model Arithmetic: train a separate checkpoint on each subset, then mix with
``model_arithmetic/arithmetic.py``. Equivalent of the reference
``scripts/split_lerobot.py`` (shuffled episode split, full re-indexed datasets).
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
from kai0_tpu.data import split_merge


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--source_path", required=True, help="Source LeRobot dataset root")
    parser.add_argument("--dst_path", required=True, help="Output dir for split_0..split_N")
    parser.add_argument("--split_num", type=int, default=4)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()
    outputs = split_merge.split_dataset(args.source_path, args.dst_path, args.split_num, args.seed)
    for out in outputs:
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
