"""kai0-tpu: a TPU-native rebuild of the OpenDriveLab/kai0 (χ₀) robot-manipulation stack.

One idiomatic JAX/XLA/Pallas implementation of the π₀ / π₀.₅ Vision-Language-Action
family (SigLIP ViT + multi-expert Gemma + flow-matching action expert), trained over a
``(batch, fsdp)`` device mesh via jit/GSPMD, plus kai0's research modules
(Model Arithmetic, Stage Advantage, Train-Deploy Alignment) and a low-latency
websocket action-chunk serving stack.

Structural parity is tracked against the reference at /root/reference (see SURVEY.md);
file:line citations in docstrings refer to that tree.
"""

__version__ = "0.5.0"


def _setup_compilation_cache() -> None:
    """Enable the persistent XLA compilation cache (off: KAI0_NO_COMPILE_CACHE=1).

    First-compile of the 3B serve/train programs is minutes; the persistent cache
    makes every later process (serve restarts, bench runs, tests) hit warm. JAX only
    reads these config values at first backend use, so setting them at import time
    is safe even though jax may already be imported.
    """
    import os

    if os.environ.get("KAI0_NO_COMPILE_CACHE") == "1":
        return
    # Data-loader worker processes are numpy/cv2-only; importing jax there costs
    # seconds of boot and hundreds of MB per worker.
    if os.environ.get("KAI0_DATA_WORKER") == "1":
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/kai0_tpu/xla_cache")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
        pass


def _setup_platform_override() -> None:
    """Honor ``KAI0_PLATFORM`` (e.g. ``cpu``) before the jax backend initializes.

    Some deployments pin a platform via sitecustomize (``JAX_PLATFORMS`` set before
    python starts), so the env var alone cannot re-select CPU; ``jax.config`` still
    can, as long as no backend has been created yet. Lets CLI entry points run on
    CPU (tests already force this via tests/conftest.py).
    """
    import os

    platform = os.environ.get("KAI0_PLATFORM")
    if not platform or os.environ.get("KAI0_DATA_WORKER") == "1":
        return
    try:
        import jax

        jax.config.update("jax_platforms", platform)
    except Exception:  # noqa: BLE001 - best-effort, backend may already be live
        pass


_setup_compilation_cache()
_setup_platform_override()
