"""Measure the AdamW-q8 optimizer phase in isolation: ms per step vs state bytes.

The full-size single-chip full-FT probe (scripts/bench_full_finetune.py) runs
the FLOP-bearing step with a stateless update because the true-AdamW state tree
cannot fit one 16 GB chip next to params+grads (PERF.md round 4). This probe
measures the missing phase alone — clip → 8-bit blockwise Adam
(decode → f32 recurrence → SR re-encode) → lr scale → SR bf16 apply — on a
synthetic parameter tree, inside one fused fori_loop program (the axon
dispatch-RPC exclusion discipline, see bench.py).

The phase is pure HBM bandwidth (every byte of params/grads/moments read+written
once, plus f32 decode transients), so ms/step scales linearly in parameter
count and the full-size cost composes as rate × 3.35 B params.

Usage:
    python scripts/bench_optimizer_phase.py [--params-m 1200] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--params-m", type=int, default=1200, help="synthetic tree size, millions of params")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--leaf-m", type=int, default=64, help="leaf size, millions (full-size trees have ~50-150M leaves)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from kai0_tpu.training import optimizer as _optimizer

    n_params = args.params_m * 1_000_000
    leaf = args.leaf_m * 1_000_000
    sizes = [leaf] * (n_params // leaf) + ([n_params % leaf] if n_params % leaf else [])
    keys = jax.random.split(jax.random.key(0), len(sizes))
    params = {f"p{i}": jax.random.normal(k, (s,), jnp.bfloat16) * 0.02 for i, (s, k) in enumerate(zip(sizes, keys))}
    grads = {f"p{i}": jax.random.normal(jax.random.fold_in(k, 1), (s,), jnp.bfloat16) * 1e-3
             for i, (s, k) in enumerate(zip(sizes, keys))}

    tx = optax.chain(
        _optimizer._clip_by_global_norm_f32(1.0),
        _optimizer._scale_by_adam_q8(0.9, 0.95, 1e-8),
        optax.scale_by_learning_rate(2.5e-5),
    )
    opt_state = jax.jit(tx.init)(params)

    def one(step_i, carry):
        # grads threaded through the carry, NOT closed over: a closure would bake
        # the 2.4 GB tree into the program as MLIR constants (CLAUDE.md trap).
        params, opt_state, grads = carry
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = _optimizer.apply_updates_sr(
            updates=updates, params=params,
            key=jax.random.fold_in(jax.random.key(0x7072, impl="rbg"), step_i),
        )
        return new_params, new_opt, grads

    @jax.jit
    def run(params, opt_state, grads):
        out = jax.lax.fori_loop(0, args.steps, one, (params, opt_state, grads))
        return out[0], out[1]

    t0 = time.time()
    params2, opt2 = run(params, opt_state, grads)
    jax.block_until_ready(jax.tree.leaves(params2)[0])
    # force full drain through a scalar fetch (axon pipeline)
    _ = float(jax.tree.leaves(params2)[0][0].astype(jnp.float32))
    print(f"compile+{args.steps} steps: {time.time() - t0:.1f}s", file=sys.stderr)

    trace_dir = os.environ.get("KAI0_BENCH_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    params2, opt2 = run(params2, opt2, grads)
    _ = float(jax.tree.leaves(params2)[0][0].astype(jnp.float32))
    elapsed = time.time() - t0
    if trace_dir:
        jax.profiler.stop_trace()

    ms_per_step = elapsed / args.steps * 1e3
    # bytes touched per step: params bf16 r+w, grads bf16 r, q8 m/v r+w, plus the
    # f32 decode/encode traffic stays in fusion-local tiles (not counted).
    gb = (2 * 2 + 2 + 2 * 1 * 2) * n_params / 1e9
    result = {
        "metric": "adamw_q8_phase_ms_per_step",
        "value": round(ms_per_step, 2),
        "unit": "ms",
        "params_m": args.params_m,
        "ms_per_bparam": round(ms_per_step / (args.params_m / 1000.0), 2),
        "effective_gbps": round(gb / (ms_per_step / 1e3), 1),
        "steps": args.steps,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
