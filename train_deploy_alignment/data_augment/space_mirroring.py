"""Space-mirroring augmentation CLI for dual-arm datasets.

Equivalent of the reference `train_deploy_alignment/data_augment/space_mirroring.py`
subcommands: `create-mirror` (mirrored twin), `merge` (concatenate repos), `full`
(mirror + merge with original). Library: `kai0_tpu.augment.space_mirroring`.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent.parent))
from kai0_tpu.augment import space_mirroring
from kai0_tpu.data import split_merge


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("create-mirror", help="Write the mirrored twin of a dataset")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--left-dim", type=int, default=7)
    p.add_argument("--right-dim", type=int, default=7)

    p = sub.add_parser("merge", help="Merge datasets (original + mirrored)")
    p.add_argument("--sources", nargs="+", required=True)
    p.add_argument("--dst", required=True)

    p = sub.add_parser("full", help="Mirror then merge with the original")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--left-dim", type=int, default=7)
    p.add_argument("--right-dim", type=int, default=7)

    args = parser.parse_args()
    if args.cmd == "create-mirror":
        meta = space_mirroring.create_mirror_dataset(
            args.src, args.dst, left_dim=args.left_dim, right_dim=args.right_dim
        )
    elif args.cmd == "merge":
        meta = split_merge.merge_datasets(args.sources, args.dst)
    else:
        meta = space_mirroring.create_mirror_and_merge(
            args.src, args.dst, left_dim=args.left_dim, right_dim=args.right_dim
        )
    print(f"wrote {meta.info['total_episodes']} episodes → {args.dst}")


if __name__ == "__main__":
    main()
