"""Merge multiple LeRobot datasets into one repo.

Checks feature compatibility, renumbers episodes/frames, remaps task indices into a
union task table, and copies videos without re-encoding. Equivalent of the reference
``scripts/merge_lerobot.py`` (feature-compat checks :40-56, merge loop :90+).
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
    parser.add_argument("--sources", nargs="+", required=True, help="Source dataset roots")
    parser.add_argument("--src_list_file", default=None, help="Text file with one source root per line")
    parser.add_argument("--dst", required=True, help="Output dataset root")
    parser.add_argument("--force", action="store_true", help="Warn instead of failing on feature mismatches")
    args = parser.parse_args()

    sources = list(args.sources)
    if args.src_list_file:
        with open(args.src_list_file) as f:
            sources += [line.strip() for line in f if line.strip() and not line.startswith("#")]

    merged = split_merge.merge_datasets(sources, args.dst, force=args.force)
    print(f"merged {merged.info['total_episodes']} episodes, {merged.info['total_frames']} frames → {args.dst}")


if __name__ == "__main__":
    main()
