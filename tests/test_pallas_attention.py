"""Fused MQA attention kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from kai0_tpu.ops import attention, pallas_attention
from kai0_tpu.ops.masks import make_attn_mask


def _rand_qkv(rng, b, t, s, n, h, dtype=jnp.float32):
    keys = jax.random.split(rng, 4)
    q = jax.random.normal(keys[0], (b, t, n, h), dtype)
    k = jax.random.normal(keys[1], (b, s, 1, h), dtype)
    v = jax.random.normal(keys[2], (b, s, 1, h), dtype)
    mask = jax.random.bernoulli(keys[3], 0.8, (b, t, s)).at[:, :, 0].set(True)
    return q, k, v, mask


@pytest.mark.parametrize("t,s", [(100, 100), (51, 867), (128, 1024)])
def test_flash_matches_reference(t, s):
    q, k, v, mask = _rand_qkv(jax.random.key(0), 2, t, s, 8, 64)
    ref = attention.mha_reference(q, k, v, mask)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_attention.flash_mha(q, k, v, mask)
    assert jnp.max(jnp.abs(out - ref)) < 1e-4


def test_flash_with_prefix_lm_mask():
    """The actual π₀ mask structure: bidirectional prefix + block-causal suffix."""
    b, prefix, suffix, n, h = 1, 96, 32, 4, 64
    t = prefix + suffix
    input_mask = jnp.ones((b, t), dtype=bool).at[:, 90:96].set(False)  # padded text
    ar_mask = jnp.array([False] * prefix + [True] + [False] * (suffix - 1))
    mask = make_attn_mask(input_mask, ar_mask)
    q, k, v, _ = _rand_qkv(jax.random.key(1), b, t, t, n, h)
    ref = attention.mha_reference(q, k, v, mask)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_attention.flash_mha(q, k, v, mask)
    assert jnp.max(jnp.abs(out - ref)) < 1e-4


@pytest.mark.parametrize("t,s", [(64, 64), (100, 867), (128, 1024)])
def test_flash_grad_matches_reference(t, s):
    q, k, v, mask = _rand_qkv(jax.random.key(2), 1, t, s, 4, 64)

    def loss_kernel(q, k, v):
        return jnp.sum(pallas_attention.flash_mha(q, k, v, mask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention.mha_reference(q, k, v, mask) ** 2)

    # Interpret mode must cover BOTH pallas kernels: the forward and the custom-vjp
    # backward (which is traced during grad construction).
    with pltpu.force_tpu_interpret_mode():
        g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # Tolerance: the flash backward feeds bf16-cast P/dS into the MXU (standard
    # flash-attention precision) while the XLA backward keeps f32 chains.
    for a, b_ in zip(g_kernel, g_ref):
        scale = jnp.maximum(jnp.max(jnp.abs(b_)), 1.0)
        assert jnp.max(jnp.abs(a - b_)) / scale < 2e-2


def test_flash_grad_padded_rows_are_zero():
    """Cotangents on padded query rows must not leak into dk/dv."""
    q, k, v, mask = _rand_qkv(jax.random.key(3), 1, 50, 128, 4, 64)

    def loss(q, k, v):
        return jnp.sum(pallas_attention.flash_mha(q, k, v, mask))

    with pltpu.force_tpu_interpret_mode():
        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq_ref, dk_ref, dv_ref = jax.grad(
        lambda q, k, v: jnp.sum(attention.mha_reference(q, k, v, mask)), argnums=(0, 1, 2)
    )(q, k, v)
    assert jnp.max(jnp.abs(dk - dk_ref)) < 5e-2
    assert jnp.max(jnp.abs(dv - dv_ref)) < 5e-2
    assert jnp.max(jnp.abs(dq - dq_ref)) < 5e-2


# --------------------------------------------------------------------------------------
# Dense MHA (SigLIP) kernel
# --------------------------------------------------------------------------------------


def _dense_ref(q, k, v):
    logits = jnp.einsum("bnth,bnsh->bnts", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, -1).astype(q.dtype)
    return jnp.einsum("bnts,bnsh->bnth", p, v)


def test_dense_mhsa_matches_reference():
    keys = jax.random.split(jax.random.key(5), 3)
    b, n, t, h = 2, 4, 256, 72
    q = jax.random.normal(keys[0], (b, n, t, h))
    k = jax.random.normal(keys[1], (b, n, t, h))
    v = jax.random.normal(keys[2], (b, n, t, h))
    with pltpu.force_tpu_interpret_mode():
        out = pallas_attention.flash_mhsa(q, k, v)
    assert jnp.max(jnp.abs(out - _dense_ref(q, k, v))) < 1e-4


def test_dense_mhsa_grad_matches_reference():
    keys = jax.random.split(jax.random.key(6), 3)
    b, n, t, h = 1, 2, 256, 64
    q = jax.random.normal(keys[0], (b, n, t, h))
    k = jax.random.normal(keys[1], (b, n, t, h))
    v = jax.random.normal(keys[2], (b, n, t, h))

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(lambda q, k, v: jnp.sum(pallas_attention.flash_mhsa(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(_dense_ref(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        scale = jnp.maximum(jnp.max(jnp.abs(b_)), 1.0)
        assert jnp.max(jnp.abs(a - b_)) / scale < 2e-2


def test_mhsa_dense_dispatcher_fallback():
    """Off-TPU / unaligned shapes: dispatcher must use the einsum path."""
    keys = jax.random.split(jax.random.key(7), 3)
    b, t, n, h = 2, 100, 4, 32  # t not multiple of 128 → fallback
    q = jax.random.normal(keys[0], (b, t, n, h))
    k = jax.random.normal(keys[1], (b, t, n, h))
    v = jax.random.normal(keys[2], (b, t, n, h))
    out = attention.mhsa_dense(q, k, v)
    ref = _dense_ref(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    assert jnp.max(jnp.abs(out - ref)) < 1e-5
