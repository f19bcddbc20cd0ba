"""JAX training entry point: ``python scripts/train.py <config-name> --exp_name=<x> [...]``.

Public CLI surface matches the reference ``scripts/train.py`` + config registry.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def init_logging():
    level_mapping = {"DEBUG": "D", "INFO": "I", "WARNING": "W", "ERROR": "E", "CRITICAL": "C"}

    class CustomFormatter(logging.Formatter):
        def format(self, record):
            record.levelname = level_mapping.get(record.levelname, record.levelname)
            return super().format(record)

    formatter = CustomFormatter(
        fmt="%(asctime)s.%(msecs)03d [%(levelname)s] %(message)-80s (%(process)d:%(filename)s:%(lineno)s)",
        datefmt="%H:%M:%S",
    )
    logging.basicConfig(level=logging.INFO)
    logging.getLogger().handlers[0].setFormatter(formatter)


def main():
    init_logging()
    from kai0_tpu.training import config as _config
    from kai0_tpu.training import train_lib

    train_lib.main(_config.cli())


if __name__ == "__main__":
    main()
