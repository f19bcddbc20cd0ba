"""AOT-compile the FULL fine-tune train step for a v5e-8 topology and budget HBM.

The reference's flagship workload is full fine-tune at global batch 256 on
8×A100-80GB (reference src/openpi/training/config.py:1185-1188, README.md:77:
">70 GB" per GPU). This host has ONE v5e chip, so the full-FT path cannot
*execute* here — but JAX topology-AOT can compile it for a v5e-8 slice without
owning one, which proves the program builds end-to-end (sharding propagation,
layout assignment, buffer assignment) and yields the exact per-device HBM
budget XLA will demand.

Usage:
    python scripts/aot_full_finetune.py [--batch 64] [--fsdp 8] [--topology v5e-8]
    python scripts/aot_full_finetune.py --sweep   # batch sizes until OOM

Writes a memory table to stdout (and PERF.md is updated manually from it).
Falls back to the attached single-chip topology if the requested one is
unavailable through this PJRT plugin (the result is then per-chip-equivalent:
fsdp=1, batch scaled down).
"""

from __future__ import annotations

import argparse
import os
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp


def get_topology(name: str, fsdp: int):
    """A device list for AOT: a detached TPU topology, or the attached devices."""
    from jax.experimental import topologies

    attempts = [
        dict(platform="tpu", topology_name=name),
        dict(platform="tpu", topology_name=f"{name.split('-')[0]}:2x4"),
    ]
    for kw in attempts:
        try:
            topo = topologies.get_topology_desc(**kw)
            devs = list(topo.devices)
            if len(devs) >= fsdp:
                return devs, f"topology {kw['topology_name']}"
        except Exception as e:  # noqa: BLE001
            print(f"  (topology {kw} unavailable: {type(e).__name__}: {e})", file=sys.stderr)
    devs = jax.devices()
    return devs, f"attached {devs[0].device_kind} ×{len(devs)}"


def build_lowered(batch_size: int, fsdp: int, devices, tp: int = 1, param_dtype: str | None = None, opt_state: str | None = None):
    import dataclasses
    import functools

    from kai0_tpu.models import pi0 as _pi0
    from kai0_tpu.parallel import sharding
    from kai0_tpu.training import config as _config
    from kai0_tpu.training import train_lib

    fsdp = min(fsdp, max(1, len(devices) // tp))
    n_used = fsdp * tp * (len(devices) // (fsdp * tp))
    mesh = sharding.make_mesh(fsdp, num_tp_devices=tp, devices=devices[:n_used])

    model = _pi0.Pi0Config(pi05=True)  # full-size, full-precision π₀.₅
    config = dataclasses.replace(
        _config.get_config("debug"),
        model=model,
        batch_size=batch_size,
        exp_name="aot_full_ft",
        fsdp_devices=fsdp,
        tp_devices=tp,
        ema_decay=None,  # reference full-FT kai0 configs disable EMA too
        param_dtype=param_dtype,
    )
    if opt_state:
        config = dataclasses.replace(
            config, optimizer=dataclasses.replace(config.optimizer, state_dtype=opt_state)
        )
    # Non-LoRA variants have an empty freeze filter: every parameter trains.

    rng = jax.random.key(0)
    state_shape, state_sharding, tx, trainable_mask = train_lib.init_train_state(
        config, rng, mesh, resume=True, log=False
    )
    n_trainable = sum(
        x.size for x, t in zip(jax.tree.leaves(state_shape.params), jax.tree.leaves(trainable_mask)) if t
    )
    print(f"  trainable params: {n_trainable/1e9:.2f} B (full FT)", file=sys.stderr)

    batch_shape = jax.eval_shape(
        lambda: (model.fake_obs(batch_size), model.fake_act(batch_size))
    )
    data_sharding = sharding.data_sharding(mesh)
    replicated = sharding.replicated(mesh)

    step_fn = functools.partial(train_lib.train_step, config, tx, trainable_mask)
    jitted = jax.jit(
        step_fn,
        in_shardings=(replicated, state_sharding, data_sharding),
        out_shardings=(state_sharding, replicated),
        donate_argnums=(1,),
    )
    with sharding.set_mesh(mesh):
        lowered = jitted.lower(
            jax.eval_shape(lambda: jax.random.key(0)),
            state_shape,
            batch_shape,
        )
    return lowered, mesh


def report(lowered, mesh, batch_size: int) -> dict:
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    GiB = 2**30
    n_dev = mesh.size
    rows = {
        "argument_size": mem.argument_size_in_bytes,
        "output_size": mem.output_size_in_bytes,
        "temp_size": mem.temp_size_in_bytes,
        "generated_code_size": mem.generated_code_size_in_bytes,
        "alias_size": mem.alias_size_in_bytes,
    }
    # XLA reports per-device sizes for SPMD executables.
    print(f"\nAOT full fine-tune: global batch {batch_size}, mesh {dict(mesh.shape)} ({n_dev} devices)")
    for k, v in rows.items():
        print(f"  {k:22s} {v/GiB:8.2f} GiB/device")
    live = (rows["argument_size"] - rows["alias_size"]) + rows["output_size"] + rows["temp_size"]
    print(f"  {'peak (args-alias+out+tmp)':22s} {live/GiB:8.2f} GiB/device  (v5e HBM: 16 GiB)")
    return {"batch": batch_size, **rows, "peak": live}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--fsdp", type=int, default=8)
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh axis size")
    ap.add_argument("--param_dtype", default=None, help="e.g. bfloat16 (SR-update trainable params)")
    ap.add_argument("--opt_state", default=None, help="optimizer state dtype: bfloat16 | int8")
    ap.add_argument("--topology", default="v5e-8")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--sb", default=None, metavar="SITES",
                    help="KAI0_INT8_SB_GEMMA sites (ffn / attn,ffn): prove the SwitchBack "
                         "full-FT program partitions + buffer-assigns on the 8-chip mesh")
    args = ap.parse_args()
    if args.sb:
        os.environ.setdefault("KAI0_INT8_SB_GEMMA", args.sb)

    devices, desc = get_topology(args.topology, args.fsdp * args.tp)
    print(f"AOT target: {desc}", file=sys.stderr)

    batches = [args.batch] if not args.sweep else [32, 64, 96, 128, 192, 256]
    ok = False
    for b in batches:
        try:
            lowered, mesh = build_lowered(
                b, args.fsdp, devices, tp=args.tp, param_dtype=args.param_dtype, opt_state=args.opt_state
            )
            report(lowered, mesh, b)
            ok = True
        except Exception as e:  # noqa: BLE001
            print(f"batch {b}: compile failed: {type(e).__name__}: {str(e)[:300]}")
            if not args.sweep:
                raise
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
