"""Measure FULL fine-tune throughput of π₀.₅ on the chips actually here.

The driver target (BASELINE.md) is phrased for full fine-tune — the reference's
flagship workload, global batch 256 on 8×A100 (reference
``src/openpi/training/config.py:1185-1188``) — but this host has ONE 16 GB v5e,
and a true-AdamW full-size step has a hard single-chip memory floor: bf16
params (6.7 GB) + bf16 grads (6.7 GB, all live at the global-norm-clip barrier)
+ 8-bit moments (6.7 GB, the framework's most compact AdamW state) = 20.1 GB >
15.75 GB usable. No remat or scheduling removes state-tree liveness, so the
measured decomposition is:

- ``--optimizer sgd`` (default at full size): fwd + bwd + f32 global-norm clip
  + SR parameter apply — the FLOP-bearing ≥95% of the step, with NO
  param-shaped optimizer state. This fits full-size π₀.₅ (13.4 GB + acts) and
  measures the per-chip throughput bound of the full fine-tune.
- ``--optimizer adamw_q8 --model 300m``: the full AdamW step (8-bit blockwise
  moments, bf16-SR params) at gemma_300m width, where the whole state fits —
  measures the optimizer-phase overhead per state byte, which scales linearly
  to the 3.35 B model (composition in PERF.md round 4).

The v5e-8 AOT proof (scripts/aot_full_finetune.py: true-AdamW batch 64 at
11.9 GiB/device with FSDP-8) covers the real multi-chip configuration; these
on-chip runs turn its throughput story into measured numbers.

Usage:
    python scripts/bench_full_finetune.py [--batch 4] [--steps 10] [--remat nothing]
    python scripts/bench_full_finetune.py --sweep   # batch sizes until OOM
    python scripts/bench_full_finetune.py --model 300m --optimizer adamw_q8 --batch 8

Prints one JSON line per measured batch size.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None or importlib.util.find_spec("bench") is None:  # bare checkout / repo-root bench module
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# v5e peak: 197 TFLOPS bf16 (the full-FT step has no int8 matmuls by default).
V5E_BF16_PEAK_FLOPS = 197e12

# Analytic model-FLOP per sample (fwd+bwd = 3× fwd; excludes remat recompute, so
# this is MODEL MFU — the apples-to-apples utilization number). Forward matmul
# FLOPs: 2 × active-params × tokens per tower: Gemma-2B (2.0 B matmul params)
# over the 968-token prefix = 3.96 T; 300 M expert over 51 suffix tokens = 0.03 T;
# SigLIP So400m (0.43 B) over 3×256 image tokens = 0.66 T; attention scores ≈
# 0.14 T → fwd ≈ 4.6 TFLOP. (XLA's cost_analysis over the axon tunnel reports
# ~0.97 TFLOP/sample — it only sees the top-level module, not fusion/loop bodies —
# so the JSON reports this analytic number instead.)
ANALYTIC_MODEL_FLOPS_PER_SAMPLE = {"full": 13.8e12, "300m": 4.3e12}


def run(batch_size: int, n_steps: int, model_size: str, optimizer: str) -> dict:
    import jax

    import bench
    from kai0_tpu.models import pi0 as _pi0
    from kai0_tpu.parallel import sharding
    from kai0_tpu.training import config as _config
    from kai0_tpu.training import optimizer as _optimizer

    if model_size == "full":
        model = _pi0.Pi0Config(pi05=True)  # full-size π₀.₅, every parameter trains
    else:
        model = _pi0.Pi0Config(
            pi05=True, paligemma_variant="gemma_300m", action_expert_variant="gemma_300m"
        )
    n_chips = jax.device_count()
    mesh = sharding.make_mesh(min(n_chips, 8))  # FSDP over whatever is attached

    if optimizer == "sgd":
        orig = _config.get_config("debug")
        patched = dataclasses.replace(orig, optimizer=_optimizer.ClipSGD())
        _config.registry()["debug"] = patched
    try:
        step, multi_step, state, batch, rng = bench.build(
            model, mesh, batch_size, param_dtype="bfloat16"
        )
    finally:
        if optimizer == "sgd":
            _config.registry()["debug"] = orig

    with sharding.set_mesh(mesh):
        t0 = time.time()
        state, info = step(rng, state, batch)
        loss = float(info["loss"])
        print(f"full-ft: compile+step {time.time() - t0:.1f}s loss={loss:.4f}", file=sys.stderr)
        assert loss == loss, "NaN loss"

        state, info = multi_step(n_steps, rng, state, batch)
        _ = float(info["loss"])
        trace_dir = os.environ.get("KAI0_BENCH_TRACE")
        if trace_dir:  # xprof capture of the measured program (PERF.md recipe)
            jax.profiler.start_trace(trace_dir)
        t0 = time.time()
        state, info = multi_step(n_steps, rng, state, batch)
        _ = float(info["loss"])  # drain the axon pipeline
        elapsed = time.time() - t0
        if trace_dir:
            jax.profiler.stop_trace()

    samples_per_sec_per_chip = batch_size * n_steps / elapsed / n_chips

    mfu = (
        samples_per_sec_per_chip
        * ANALYTIC_MODEL_FLOPS_PER_SAMPLE[model_size]
        / V5E_BF16_PEAK_FLOPS
    )

    from kai0_tpu import knobs as _knobs

    result = {
        "metric": f"pi05_full_finetune_throughput_{model_size}_{optimizer}",
        "value": round(samples_per_sec_per_chip, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_sec_per_chip / bench.A100_BASELINE_SAMPLES_PER_SEC, 3),
        "batch": batch_size,
        "chips": n_chips,
        "model_mfu": round(mfu, 4),
        "precision": {
            "params": "bfloat16+SR",
            "opt_state": "none" if optimizer == "sgd" else "int8-blockwise",
            "compute": "bf16",
        },
        "knobs": _knobs.as_dict(),
    }
    print(json.dumps(result))
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--remat", default="nothing", help="KAI0_REMAT policy for the probe")
    ap.add_argument("--model", choices=["full", "300m"], default="full")
    ap.add_argument("--sb", default="ffn", metavar="SITES",
                    help="KAI0_INT8_SB_GEMMA sites (SwitchBack dynamic int8 on the "
                         "trainable gemma matmuls). Default ffn — the measured-best, "
                         "convergence-validated full-FT configuration "
                         "(bench.apply_fullft_bench_defaults); 0 = bf16 parity step")
    ap.add_argument("--optimizer", choices=["sgd", "adamw_q8"], default=None,
                    help="default: sgd at full size (state does not fit one chip), adamw_q8 at 300m")
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()
    optimizer = args.optimizer or ("sgd" if args.model == "full" else "adamw_q8")

    os.environ.setdefault("KAI0_REMAT", args.remat)
    if args.sb and args.sb != "0":
        os.environ.setdefault("KAI0_INT8_SB_GEMMA", args.sb)
        import bench

        # Single definition of the rest of the measured-best full-FT knob set
        # (currently KAI0_SIGLIP_BLOCK_T_BWD=128) — must not drift from bench.py.
        bench.apply_fullft_bench_defaults()
    if optimizer == "adamw_q8":
        os.environ.setdefault("KAI0_BENCH_OPT_STATE", "int8")
    else:
        os.environ.setdefault("KAI0_BENCH_OPT_STATE", "float32")  # no adam state at all with sgd

    batches = [args.batch] if not args.sweep else [2, 4, 6, 8, 12]
    ok = False
    for b in batches:
        try:
            run(b, args.steps, args.model, optimizer)
            ok = True
        except Exception as e:  # noqa: BLE001 - OOM ends the sweep
            print(f"batch {b}: {type(e).__name__}: {str(e)[:300]}", file=sys.stderr)
            if not args.sweep:
                raise
            break
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
