"""A/B convergence probe: run N train steps of the dummy-size π₀.₅-LoRA config and
print the per-step losses as JSON. Run twice with different env (e.g. KAI0_INT8=1 or
KAI0_INT8_SB=1 vs unset) and compare trajectories — the protocol used to validate
the int8 paths (PERF.md "Convergence check").

    JAX_PLATFORMS=cpu python scripts/check_convergence.py --steps 30
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # sitecustomize pins JAX_PLATFORMS=axon on this deployment; honor an explicit
    # cpu request through jax.config (must happen before backend init).
    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--full-ft", action="store_true",
                   help="plain dummy variants (every param trains) — the A/B bed for "
                        "the full-fine-tune paths (KAI0_INT8_SB_GEMMA, param_dtype SR)")
    args = p.parse_args()

    from kai0_tpu.ops import quant
    from kai0_tpu.parallel import sharding
    from kai0_tpu.training import config as _config
    from kai0_tpu.training import train_lib

    base = _config.get_config("debug")
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(
            base.model,
            paligemma_variant="dummy" if args.full_ft else "dummy_lora",
            action_expert_variant="dummy" if args.full_ft else "dummy_lora",
            dtype="bfloat16",
        ),
        exp_name="convergence",
        batch_size=args.batch_size,
        quantize_frozen=quant.env_flag("KAI0_INT8", "0"),
    )
    # KAI0_OPT_STATE=bfloat16 A/Bs the compact AdamW moment storage
    # (optimizer._scale_by_adam_compact) against the exact f32 trajectory.
    if os.environ.get("KAI0_OPT_STATE"):
        cfg = dataclasses.replace(
            cfg,
            optimizer=dataclasses.replace(cfg.optimizer, state_dtype=os.environ["KAI0_OPT_STATE"]),
        )
    mesh = sharding.make_mesh(1)
    rng = jax.random.key(args.seed)
    state, _, tx, mask = train_lib.init_train_state(cfg, rng, mesh, resume=False)
    step = jax.jit(lambda r, s, b: train_lib.train_step(cfg, tx, mask, r, s, b))

    obs = cfg.model.fake_obs(cfg.batch_size)
    actions = cfg.model.fake_act(cfg.batch_size)
    losses = []
    with sharding.set_mesh(mesh):
        for i in range(args.steps):
            state, info = step(jax.random.fold_in(jax.random.key(args.seed + 1), i), state, (obs, actions))
            losses.append(round(float(info["loss"]), 6))
    print(json.dumps({
        "int8": cfg.quantize_frozen,
        "sb": quant.switchback_enabled(),
        "sb_gemma": quant.switchback_gemma_enabled("ffn") or quant.switchback_gemma_enabled("attn"),
        "losses": losses,
    }))


if __name__ == "__main__":
    main()
