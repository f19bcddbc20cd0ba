"""Child process for tests/test_multihost.py: one JAX process of a 2-process run.

Exercises the multi-host branch the reference forbids
(reference src/openpi/training/data_loader.py:479-480 raises on
``jax.process_count() > 1``; SURVEY §2.7 names lifting it as the TPU-native
extension): ``jax.distributed.initialize`` over a local coordinator, a
(batch=2, fsdp=4) mesh whose batch axis spans the two processes (the DCN-like
axis) while fsdp stays process-local (the ICI-like axis), the real
``NumpyDataLoader`` path building global arrays via
``jax.make_array_from_process_local_data`` (training/data_loader.py
``_make_global_array``), and one full ``train_lib.train_step``.

Invoked as: python tests/_multihost_child.py <pid> <nprocs> <port> <out_file>
"""

from __future__ import annotations

import os
import sys

LOCAL_DEVICES = 4

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
).strip()

import jax  # noqa: E402

# The sitecustomize on this host pins JAX_PLATFORMS=axon; select CPU through
# jax.config before backend init (same pattern as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> None:
    process_id, num_processes, port, out_file = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.local_device_count() == LOCAL_DEVICES
    assert jax.device_count() == num_processes * LOCAL_DEVICES

    import dataclasses
    import functools

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from kai0_tpu.models import pi0 as _pi0
    from kai0_tpu.parallel import sharding
    from kai0_tpu.training import config as _config
    from kai0_tpu.training import data_loader as _data_loader
    from kai0_tpu.training import train_lib

    # make_mesh reshapes jax.devices() to (batch, fsdp) = (2, 4): with 4 local
    # devices per process, the batch axis is exactly the process (DCN) axis and
    # fsdp stays inside each process (ICI) — collectives for the grad psum cross
    # processes, FSDP all-gathers stay local.
    mesh = sharding.make_mesh(LOCAL_DEVICES)
    model = _pi0.Pi0Config(
        paligemma_variant="dummy",
        action_expert_variant="dummy",
        vision_variant="mu/14",
        dtype="float32",
        pi05=True,
    )
    config = dataclasses.replace(
        _config.get_config("debug_pi05"),
        model=model,
        batch_size=2 * jax.device_count(),  # 2 per device; local batch = half
        exp_name="multihost",
        fsdp_min_size_mbytes=0,
        fsdp_devices=LOCAL_DEVICES,
    )

    data_sharding = sharding.data_sharding(mesh)
    replicated = sharding.replicated(mesh)

    loader = _data_loader.create_data_loader(config, sharding=data_sharding, num_batches=1)
    batch = next(iter(loader))
    # The loader must have gone through make_array_from_process_local_data:
    # every leaf is a global array of which this process addresses only half.
    leaf = jax.tree.leaves(batch)[0]
    assert leaf.shape[0] == config.batch_size, leaf.shape
    addressable = sum(s.data.shape[0] for s in leaf.addressable_shards)
    assert addressable == config.batch_size // num_processes, addressable

    rng = jax.random.key(config.seed)
    train_state, state_sharding, tx, trainable_mask = train_lib.init_train_state(
        config, rng, mesh, resume=False
    )
    ptrain_step = jax.jit(
        functools.partial(train_lib.train_step, config, tx, trainable_mask),
        in_shardings=(replicated, state_sharding, data_sharding),
        out_shardings=(state_sharding, replicated),
        donate_argnums=(1,),
    )
    # Compile ahead-of-time, then align both processes with a coordination
    #-service barrier (KV store, not gloo) immediately before execution: the
    # gloo context is created lazily at the FIRST cross-process collective and
    # its address exchange has a hardcoded ~30 s window — on a 1-vCPU host the
    # children can reach that point >30 s apart (e.g. one hits the persistent
    # XLA cache and the other compiles), which times out the rendezvous.
    with sharding.set_mesh(mesh):
        compiled = ptrain_step.lower(rng, train_state, batch).compile()
    from jax._src import distributed as _distributed

    _distributed.global_state.client.wait_at_barrier("kai0_pre_step", 600_000)
    with sharding.set_mesh(mesh):
        new_state, info = compiled(rng, train_state, batch)
    jax.block_until_ready(new_state.params)
    loss = float(info["loss"])
    assert jnp.isfinite(loss), loss
    with open(out_file, "w") as f:
        f.write(f"{loss:.6f}\n")
    print(f"multihost child {process_id}/{num_processes} OK loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
