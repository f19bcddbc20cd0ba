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


def test_flash_grad_matches_reference():
    q, k, v, mask = _rand_qkv(jax.random.key(2), 1, 64, 64, 4, 64)

    def loss_kernel(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(pallas_attention.flash_mha(q, k, v, mask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention.mha_reference(q, k, v, mask) ** 2)

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_kernel, g_ref):
        assert jnp.max(jnp.abs(a - b_)) < 1e-3
