"""Dump post-transform validation batches for model-arithmetic weight optimization.

Parity: reference ``model_arithmetic/dump_data.py:37-43`` — pickles a list of
``(Observation, actions)`` tuples drawn from the training loader.

    python model_arithmetic/dump_data.py --config pi05_flatten_fold_normal \\
        --output val_batches.pkl --num-batches 50 --batch-size 8
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import pickle
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--num-batches", type=int, default=50)
    parser.add_argument("--batch-size", type=int, default=8)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from kai0_tpu.training import config as _config
    from kai0_tpu.training import data_loader as _data_loader

    config = dataclasses.replace(_config.get_config(args.config), batch_size=args.batch_size)
    loader = _data_loader.create_data_loader(config, num_batches=args.num_batches, shuffle=True)
    batches = [jax.tree.map(np.asarray, batch) for batch in loader]

    output = pathlib.Path(args.output)
    output.parent.mkdir(parents=True, exist_ok=True)
    with open(output, "wb") as f:
        pickle.dump(batches, f)
    print(f"Dumped {len(batches)} batches to {output}")


if __name__ == "__main__":
    main()
