"""Serve a trained policy over websocket.

CLI parity with reference ``scripts/serve_policy.py``:

    python scripts/serve_policy.py --env=ALOHA_SIM
    python scripts/serve_policy.py policy:checkpoint --policy.config=pi05_kai0_task_a \\
        --policy.dir=checkpoints/pi05_kai0_task_a/exp/29999

TPU addition: ``--warmup`` pre-compiles the sampler before the listener starts.
"""

from __future__ import annotations

import argparse
import dataclasses
import enum
import logging
import socket
import sys

import importlib.util
import os

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kai0_tpu.serving import websocket_policy_server  # noqa: E402  (sets up client path)
from kai0_tpu.policies import policy as _policy  # noqa: E402
from kai0_tpu.policies import policy_config as _policy_config  # noqa: E402
from kai0_tpu.training import config as _config  # noqa: E402


class EnvMode(enum.Enum):
    ALOHA = "aloha"
    ALOHA_SIM = "aloha_sim"
    DROID = "droid"
    LIBERO = "libero"


@dataclasses.dataclass
class Checkpoint:
    config: str
    dir: str


# Default checkpoints per environment (HF/GCS paths as in the reference; resolved
# through shared.download which requires network access).
DEFAULT_CHECKPOINT: dict[EnvMode, Checkpoint] = {
    EnvMode.ALOHA: Checkpoint(config="pi05_aloha", dir="gs://openpi-assets/checkpoints/pi05_base"),
    EnvMode.ALOHA_SIM: Checkpoint(config="pi0_aloha_sim", dir="gs://openpi-assets/checkpoints/pi0_aloha_sim"),
    EnvMode.DROID: Checkpoint(config="pi05_droid", dir="gs://openpi-assets/checkpoints/pi05_droid"),
    EnvMode.LIBERO: Checkpoint(config="pi05_libero", dir="gs://openpi-assets/checkpoints/pi05_libero"),
}


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", nargs="?", default="", help="'policy:checkpoint' to serve a checkpoint")
    parser.add_argument("--env", type=lambda s: EnvMode[s.upper()], default=EnvMode.ALOHA_SIM)
    parser.add_argument("--default_prompt", "--default-prompt", default=None)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--record", action="store_true")
    parser.add_argument("--warmup", action="store_true", help="pre-compile before listening")
    parser.add_argument(
        "--int8", action="store_true", help="int8 gemma weights (~2x less HBM traffic; slight action drift)"
    )
    parser.add_argument(
        "--prompt-buckets",
        "--prompt_buckets",
        dest="prompt_buckets",
        default=None,
        help="comma-separated prompt-length buckets (e.g. '64,128'); trims trailing "
        "prompt padding to the smallest bucket >= the tokenized length, shrinking the "
        "prefill + KV cache (one compiled program per bucket; flow-matching models only)",
    )
    parser.add_argument(
        "--max_batch",
        "--max-batch",
        dest="max_batch",
        type=int,
        default=1,
        help="coalesce up to N concurrent client requests into one device batch "
        "(multi-robot serving; batch-1 sampling is bandwidth-bound so batching is "
        "nearly free — see PERF.md). Batch sizes pad to power-of-two buckets.",
    )
    parser.add_argument(
        "--batch_wait_ms",
        "--batch-wait-ms",
        dest="batch_wait_ms",
        type=float,
        default=0.0,
        help="hold the first request of a batch up to this long so concurrent "
        "clients join it (0 = only coalesce what is already queued)",
    )
    parser.add_argument(
        "--fsdp_devices",
        "--fsdp-devices",
        dest="fsdp_devices",
        type=int,
        default=1,
        help="shard the model over the first N local devices for serving (batch-1 "
        "sampling is HBM-bandwidth-bound: N chips stream the weights ~Nx faster)",
    )
    parser.add_argument("--policy.config", dest="policy_config", default=None)
    parser.add_argument("--policy.dir", dest="policy_dir", default=None)
    return parser.parse_args(argv)


def create_policy(args) -> _policy.Policy:
    if args.policy_config and args.policy_dir:
        checkpoint = Checkpoint(config=args.policy_config, dir=args.policy_dir)
    else:
        checkpoint = DEFAULT_CHECKPOINT[args.env]
    return _policy_config.create_trained_policy(
        _config.get_config(checkpoint.config),
        checkpoint.dir,
        default_prompt=args.default_prompt,
        warmup=args.warmup,
        quantize=args.int8,
        prompt_buckets=[int(b) for b in args.prompt_buckets.split(",")] if args.prompt_buckets else None,
        fsdp_devices=args.fsdp_devices,
        max_batch=args.max_batch,
        batch_wait_ms=args.batch_wait_ms,
    )


def main(argv=None) -> None:
    args = parse_args(argv)
    policy = create_policy(args)
    policy_metadata = policy.metadata

    if args.record:
        policy = _policy.PolicyRecorder(policy, "policy_records")

    hostname = socket.gethostname()
    try:
        local_ip = socket.gethostbyname(hostname)
    except socket.gaierror:
        local_ip = "unknown"
    logging.info("Creating server (host: %s, ip: %s)", hostname, local_ip)

    server = websocket_policy_server.WebsocketPolicyServer(
        policy=policy, host="0.0.0.0", port=args.port, metadata=policy_metadata
    )
    server.serve_forever()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, force=True)
    main()
