"""JAX training entry point: ``python scripts/train.py <config-name> --exp_name=<x> [...]``.

Public CLI surface matches the reference ``scripts/train.py`` + config registry.
"""

import logging
import os
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
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


def maybe_init_multihost():
    """Multi-host JAX: initialize the distributed runtime when launched as a pod.

    The reference explicitly forbids multi-process training
    (``data_loader.py:479-480``); here the loader shards each process's local batch
    via ``jax.make_array_from_process_local_data`` and the mesh spans all hosts.
    On TPU pods `jax.distributed.initialize()` autodetects the coordinator from the
    TPU environment; elsewhere set JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    JAX_PROCESS_ID (or pass KAI0_MULTIHOST=0 to skip).
    """
    if os.environ.get("KAI0_MULTIHOST", "auto") == "0":
        return
    pod_env = any(
        os.environ.get(var)
        for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    ) or os.environ.get("KAI0_MULTIHOST") == "1"
    if not pod_env:
        return
    import jax

    jax.distributed.initialize()
    logging.info(
        f"Initialized multi-host JAX: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )


def main():
    init_logging()
    maybe_init_multihost()
    from kai0_tpu.training import config as _config
    from kai0_tpu.training import train_lib

    train_lib.main(_config.cli())


if __name__ == "__main__":
    main()
