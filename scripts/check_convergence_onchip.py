"""Full-size on-chip convergence A/B for the shipped bench defaults.

VERDICT round-2 item 4: the 30-step dummy-size CPU probes
(scripts/check_convergence.py) cannot surface slow drift at 3 B scale. This
runs REAL π₀.₅-LoRA train steps on the TPU and emits the per-step loss
trajectory, fused into K-step ``lax.fori_loop`` programs that trace losses into
an on-device array (per-dispatch RPC over the axon tunnel is ~1 s — eager
stepping would dominate).

Protocol (fixed synthetic batch, per-step rng fold like the CPU probe):

    # A: the shipped fast path — int8 fused FFN + bf16 SR AdamW moments
    python scripts/check_convergence_onchip.py --steps 300 --label int8 \\
        > /tmp/conv_int8.json
    # B: reference-parity numerics — bf16 base, f32 moments
    KAI0_BENCH_INT8=0 python scripts/check_convergence_onchip.py --steps 300 \\
        --label bf16 > /tmp/conv_bf16.json

Batch defaults to 12 (the bf16 configuration's memory ceiling) so both arms
run the identical workload. Compare with
``python scripts/check_convergence_onchip.py --compare A.json B.json``.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None or importlib.util.find_spec("bench") is None:  # bare checkout / repo-root bench module
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp


def compare(path_a: str, path_b: str) -> int:
    a, b = (json.load(open(p)) for p in (path_a, path_b))
    la, lb = a["losses"], b["losses"]
    n = min(len(la), len(lb))
    rel = [abs(x - y) / max(abs(y), 1e-9) for x, y in zip(la[:n], lb[:n])]
    tail = max(1, n // 10)
    print(
        json.dumps(
            {
                "a": a["label"],
                "b": b["label"],
                "steps": n,
                "max_rel_diff": round(max(rel), 5),
                "mean_rel_diff": round(sum(rel) / n, 5),
                "final_tail_mean": [
                    round(sum(la[n - tail : n]) / tail, 5),
                    round(sum(lb[n - tail : n]) / tail, 5),
                ],
                # Drift check: rel diff trend over thirds (growing → drift).
                "rel_diff_by_third": [
                    round(sum(rel[i * n // 3 : (i + 1) * n // 3]) / max(n // 3, 1), 5)
                    for i in range(3)
                ],
            }
        )
    )
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--chunk", type=int, default=50, help="steps fused per dispatch")
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--label", default="run")
    p.add_argument("--full-ft", action="store_true",
                   help="full-size FULL fine-tune arms (every param trains, bf16-SR "
                        "params, stateless ClipSGD both arms): A/B the fused "
                        "SwitchBack FFN (bench full-FT defaults) vs KAI0_INT8_SB_GEMMA=0")
    p.add_argument("--compare", nargs=2, metavar=("A.json", "B.json"))
    args = p.parse_args()
    if args.compare:
        return compare(*args.compare)

    import bench
    from kai0_tpu.models import pi0 as _pi0
    from kai0_tpu.ops import quant as _quant
    from kai0_tpu.parallel import sharding
    from kai0_tpu.training import config as _config
    from kai0_tpu.training import train_lib

    if args.full_ft:
        # Full fine-tune arms: KAI0_INT8_SB_GEMMA=0 in the env selects the bf16
        # parity arm; otherwise the shipped fused-SwitchBack defaults apply.
        from kai0_tpu.training import optimizer as _optimizer

        quantize = False
        opt_state = "none (ClipSGD)"
        bench.apply_fullft_bench_defaults()
        model = _pi0.Pi0Config(pi05=True)
        mesh = sharding.make_mesh(1)
        train_config = dataclasses.replace(
            _config.get_config("debug"),
            model=model,
            batch_size=args.batch,
            exp_name="convergence_onchip",
            ema_decay=None,
            param_dtype="bfloat16",
            optimizer=_optimizer.ClipSGD(),
        )
    else:
        quantize = _quant.env_flag("KAI0_BENCH_INT8", "1")
        if quantize:
            # Shared with bench.select_mode: the A/B must run the SHIPPED defaults.
            bench.apply_int8_bench_defaults()
        model = _pi0.Pi0Config(
            pi05=True, paligemma_variant="gemma_2b_lora", action_expert_variant="gemma_300m_lora"
        )
        mesh = sharding.make_mesh(1)
        train_config = dataclasses.replace(
            _config.get_config("debug"),
            model=model,
            batch_size=args.batch,
            exp_name="convergence_onchip",
            ema_decay=None,
            quantize_frozen=quantize,
        )
        opt_state = os.environ.get("KAI0_BENCH_OPT_STATE", "bfloat16" if quantize else "float32")
        if opt_state and opt_state != "float32":
            train_config = dataclasses.replace(
                train_config,
                optimizer=dataclasses.replace(train_config.optimizer, state_dtype=opt_state),
            )
    knob_map = train_config.apply_model_knobs()

    rng = jax.random.key(args.seed)
    state, state_sharding, tx, trainable_mask = train_lib.init_train_state(
        train_config, rng, mesh, resume=False
    )
    data_sharding = sharding.data_sharding(mesh)
    replicated = sharding.replicated(mesh)
    obs = model.fake_obs(args.batch)
    actions = model.fake_act(args.batch)
    batch = jax.device_put((obs, actions), data_sharding)
    step_fn = functools.partial(train_lib.train_step, train_config, tx, trainable_mask)

    def traced_chunk(offset, rng, state, batch):
        def body(i, carry):
            state, losses = carry
            new_state, info = step_fn(jax.random.fold_in(rng, offset + i), state, batch)
            return new_state, losses.at[i].set(info["loss"].astype(jnp.float32))

        return jax.lax.fori_loop(0, args.chunk, body, (state, jnp.zeros((args.chunk,), jnp.float32)))

    pchunk = jax.jit(
        traced_chunk,
        in_shardings=(None, replicated, state_sharding, data_sharding),
        out_shardings=(state_sharding, replicated),
        donate_argnums=(2,),
    )

    losses: list[float] = []
    t0 = time.time()
    with sharding.set_mesh(mesh):
        for off in range(0, args.steps, args.chunk):
            state, chunk_losses = pchunk(off, rng, state, batch)
            losses.extend(float(x) for x in chunk_losses)
            print(
                f"steps {off + args.chunk}/{args.steps} loss={losses[-1]:.4f} "
                f"({time.time() - t0:.0f}s)",
                file=sys.stderr,
            )
    print(
        json.dumps(
            {
                "label": args.label,
                "int8": quantize,
                "opt_state": opt_state,
                "batch": args.batch,
                "steps": args.steps,
                "knobs": knob_map,
                "losses": [round(x, 6) for x in losses],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
