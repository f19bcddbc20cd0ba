"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices (XLA host-platform partitioning) so that
multi-chip `(batch, fsdp)` sharding paths compile and execute in CI without TPU
hardware. Mirrors the reference's CPU-fallback conftest (src/openpi/conftest.py:7-18),
extended with the virtual device mesh recommended by SURVEY.md §4.

Note: this deployment pins JAX_PLATFORMS=axon via sitecustomize, so the env var alone
does not select CPU — we must override through jax.config before backend init.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "packages", "kai0-client", "src"))
