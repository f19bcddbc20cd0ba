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


def test_tp_replicated_operand_grad_is_psummed():
    """The MQA-under-tp gradient contract (ops/attention.py:_shard_map_batch
    docstring): q's head dim shards over ``tp`` while the single KV head stays
    replicated (1 % tp != 0), so the KV cotangent — computed per tp shard from
    that shard's q heads only — must be psummed over ``tp`` by shard_map's
    transpose even with check_vma=False. A missing psum would silently
    mis-scale KV gradients by 1/tp on tp>1 meshes; this pins the behavior on
    the virtual CPU mesh with a custom-vjp stand-in shaped like the kernel
    (ADVICE round 4)."""

    @jax.custom_vjp
    def f(q, k):
        return q * k  # k broadcasts over q's head dim (axis 1)

    def fwd(q, k):
        return f(q, k), (q, k)

    def bwd(res, g):
        q, k = res
        # dk sums over the LOCAL head shard — the cross-shard sum is shard_map's
        # transpose psum, which is exactly what this test pins.
        return g * k, (g * q).sum(axis=1, keepdims=True)

    f.defvjp(fwd, bwd)

    # (batch=2, fsdp=1, tp=4): q [B=8, N=4, H=2] shards batch over the data axes
    # and heads over tp; k [B=8, 1, H=2] has a size-1 head dim → tp-replicated.
    mesh = sharding.make_mesh(1, num_tp_devices=4, devices=jax.devices()[:8])
    q = jax.random.normal(jax.random.key(0), (8, 4, 2))
    k = jax.random.normal(jax.random.key(1), (8, 1, 2))

    def loss(q, k):
        return jnp.sum(attention._shard_map_batch(f, q, k, head_axes=(1, 1)) ** 2)

    with sharding.set_mesh(mesh):
        gq, gk = jax.jit(jax.grad(loss, argnums=(0, 1)))(q, k)
    gq_ref, gk_ref = jax.grad(lambda q, k: jnp.sum((q * k) ** 2), argnums=(0, 1))(q, k)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-5)


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
