"""_shard_map_batch: the GSPMD escape hatch for Mosaic kernels on >1-device meshes.

The v5e-8 topology-AOT of the full fine-tune step failed with "Mosaic kernels
cannot be automatically partitioned" (round 3); attention is batch-independent,
so kernel calls run under shard_map over the data axes. These tests execute the
wrapper on the virtual 8-device CPU mesh with a stand-in fn (the real kernels
only dispatch on TPU backends; the full-size proof is scripts/aot_full_finetune.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from kai0_tpu.ops import attention
from kai0_tpu.parallel import sharding


def _fn(q, k):
    return q * 2.0 + k.sum(axis=-1, keepdims=True)


def test_no_mesh_is_passthrough():
    q = jnp.arange(24, dtype=jnp.float32).reshape(4, 3, 2)
    k = jnp.ones((4, 3, 2))
    np.testing.assert_array_equal(
        np.asarray(attention._shard_map_batch(_fn, q, k)), np.asarray(_fn(q, k))
    )


def test_batch_sharded_under_mesh_matches_unsharded():
    mesh = sharding.make_mesh(4, devices=jax.devices()[:8])  # (batch=2, fsdp=4)
    q = jax.random.normal(jax.random.key(0), (16, 3, 2))  # 16 % 8 == 0 → sharded
    k = jax.random.normal(jax.random.key(1), (16, 3, 2))
    with sharding.set_mesh(mesh):
        out = jax.jit(lambda q, k: attention._shard_map_batch(_fn, q, k))(q, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_fn(q, k)), rtol=1e-6)


def test_indivisible_batch_falls_back_to_replicated():
    mesh = sharding.make_mesh(4, devices=jax.devices()[:8])
    q = jax.random.normal(jax.random.key(0), (3, 3, 2))  # 3 % 8 != 0 → replicated
    k = jax.random.normal(jax.random.key(1), (3, 3, 2))
    with sharding.set_mesh(mesh):
        out = jax.jit(lambda q, k: attention._shard_map_batch(_fn, q, k))(q, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_fn(q, k)), rtol=1e-6)


def test_broadcast_mask_operands_are_replicated_not_sharded():
    """flash_mha's mask contract allows [T, S] / [1, T, S] broadcastable masks;
    _shard_map_batch must shard only true batch-dim-0 operands and replicate
    the rest (a blindly-sharded mask would split T or a size-1 dim over the
    data axes and trace-fail into the silent reference fallback)."""

    def fn(q, k, m2, m3):
        return q * 2.0 + k.sum(-1, keepdims=True) + m2[None, :, :1] + m3[:, :, :1]

    mesh = sharding.make_mesh(4, devices=jax.devices()[:8])
    q = jax.random.normal(jax.random.key(0), (16, 3, 2))
    k = jax.random.normal(jax.random.key(1), (16, 3, 2))
    m2 = jax.random.normal(jax.random.key(2), (3, 5))  # [T, S]
    m3 = jax.random.normal(jax.random.key(3), (1, 3, 5))  # [1, T, S]
    with sharding.set_mesh(mesh):
        out = jax.jit(lambda *a: attention._shard_map_batch(fn, *a))(q, k, m2, m3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(q, k, m2, m3)), rtol=1e-6)

    # A [T, S] mask whose T equals the batch must still be replicated (ndim < 3).
    m_tricky = jax.random.normal(jax.random.key(4), (16, 5))

    def fn2(q, k, m):
        return q + m.sum() * 0.0

    with sharding.set_mesh(mesh):
        out2 = jax.jit(lambda *a: attention._shard_map_batch(fn2, *a))(q, k, m_tricky)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(q), rtol=1e-6)


def test_gradients_flow_through_shard_map():
    mesh = sharding.make_mesh(4, devices=jax.devices()[:8])
    q = jax.random.normal(jax.random.key(0), (8, 3, 2))
    k = jax.random.normal(jax.random.key(1), (8, 3, 2))

    def loss(q, k):
        return jnp.sum(attention._shard_map_batch(_fn, q, k) ** 2)

    with sharding.set_mesh(mesh):
        g_sharded = jax.jit(jax.grad(loss))(q, k)
    g_plain = jax.grad(lambda q, k: jnp.sum(_fn(q, k) ** 2))(q, k)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_plain), rtol=1e-5)
