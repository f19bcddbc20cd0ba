"""Measure FULL fine-tune throughput of full-size π₀.₅ on the chips actually here.

The driver target (BASELINE.md) is phrased for full fine-tune — the reference's
flagship workload, global batch 256 on 8×A100 (reference
``src/openpi/training/config.py:1185-1188``) — but this host has ONE 16 GB v5e.
A full-FT step does not fit at reference precision (f32 AdamW state alone is
~26 GB), so the measured single-chip configuration uses the framework's two
memory-precision features, both convergence-validated:

- ``param_dtype="bfloat16"``: bf16 trainable params + stochastically-rounded
  updates (optimizer.apply_updates_sr),
- ``optimizer.state_dtype="int8"``: 8-bit blockwise log-quantized AdamW moments
  (optimizer._scale_by_adam_q8).

HBM at full size: params 6.4 GB + moments ~6.4 GB + activations/grads → batch
2–8 fits depending on remat. The compute per sample (fwd+bwd FLOPs, HBM traffic
of every matmul) is the full fine-tune's — only optimizer storage precision
differs — so samples/s/chip here IS the full-FT throughput measure, reported
next to hardware-FLOP MFU from XLA's own cost analysis.

Usage:
    python scripts/bench_full_finetune.py [--batch 4] [--steps 10] [--remat attn]
    python scripts/bench_full_finetune.py --sweep   # batch sizes until OOM

Prints one JSON line per measured batch size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e peak: 197 TFLOPS bf16 (the full-FT step has no int8 matmuls).
V5E_BF16_PEAK_FLOPS = 197e12


def run(batch_size: int, n_steps: int) -> dict:
    import jax

    import bench
    from kai0_tpu.models import pi0 as _pi0
    from kai0_tpu.parallel import sharding

    model = _pi0.Pi0Config(pi05=True)  # full-size π₀.₅, every parameter trains
    n_chips = jax.device_count()
    mesh = sharding.make_mesh(min(n_chips, 8))  # FSDP over whatever is attached

    step, multi_step, state, batch, rng = bench.build(
        model, mesh, batch_size, param_dtype="bfloat16"
    )

    with sharding.set_mesh(mesh):
        t0 = time.time()
        state, info = step(rng, state, batch)
        loss = float(info["loss"])
        print(f"full-ft: compile+step {time.time() - t0:.1f}s loss={loss:.4f}", file=sys.stderr)
        assert loss == loss, "NaN loss"

        state, info = multi_step(n_steps, rng, state, batch)
        _ = float(info["loss"])
        t0 = time.time()
        state, info = multi_step(n_steps, rng, state, batch)
        _ = float(info["loss"])  # drain the axon pipeline
        elapsed = time.time() - t0

    samples_per_sec_per_chip = batch_size * n_steps / elapsed / n_chips

    # Hardware-FLOP MFU from XLA's cost analysis of the per-step program
    # (includes remat recompute → this is hardware utilization; the model-FLOP
    # number in PERF.md divides the analytic 3×2×P×T instead).
    flops_per_step = None
    try:
        cost = step.lower(rng, state, batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001 - cost analysis is best-effort over axon
        print(f"full-ft: cost_analysis unavailable ({type(e).__name__}: {e})", file=sys.stderr)
    mfu = None
    if flops_per_step:
        mfu = flops_per_step * n_steps / elapsed / (V5E_BF16_PEAK_FLOPS * n_chips)

    from kai0_tpu import knobs as _knobs

    result = {
        "metric": "pi05_full_finetune_throughput",
        "value": round(samples_per_sec_per_chip, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_sec_per_chip / bench.A100_BASELINE_SAMPLES_PER_SEC, 3),
        "batch": batch_size,
        "chips": n_chips,
        "hw_mfu": round(mfu, 4) if mfu is not None else None,
        "flops_per_step": flops_per_step,
        "precision": {"params": "bfloat16+SR", "moments": "int8-blockwise", "compute": "bf16"},
        "knobs": _knobs.as_dict(),
    }
    print(json.dumps(result))
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--remat", default="attn", help="KAI0_REMAT policy for the probe")
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("KAI0_REMAT", args.remat)
    os.environ.setdefault("KAI0_BENCH_OPT_STATE", "int8")

    batches = [args.batch] if not args.sweep else [2, 4, 6, 8]
    ok = False
    for b in batches:
        try:
            run(b, args.steps)
            ok = True
        except Exception as e:  # noqa: BLE001 - OOM ends the sweep
            print(f"batch {b}: {type(e).__name__}: {str(e)[:300]}", file=sys.stderr)
            if not args.sweep:
                raise
            break
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
