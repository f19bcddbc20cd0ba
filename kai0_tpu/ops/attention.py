"""Masked grouped-query attention core.

Numerics parity with reference ``src/openpi/models/gemma.py:216-231``: attention
logits accumulate in float32 (MXU ``preferred_element_type``), the Gemma ``big_neg``
constant (-2.3819763e38) masks invalid positions, softmax runs in float32 and the
result is cast back to the activation dtype before the value matmul.

Two interchangeable implementations:

- ``mha_reference``: plain einsum formulation. XLA fuses this well for the ~1k-token
  sequences the π₀ family uses; it is the numerics golden path.
- ``mha``: dispatcher that can route to a fused Pallas kernel on TPU for the hot
  shapes (see ``kai0_tpu/ops/pallas_attention.py``); falls back to the reference path
  on CPU/interpret mode or unsupported shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG_NEG = -2.3819763e38  # Gemma's masking constant (gemma/modules.py via reference gemma.py:225)


def _shard_map_batch(fn, *arrs, head_axes: tuple[int | None, ...] | None = None):
    """Run a batch/head-independent Pallas kernel under the active mesh.

    GSPMD cannot automatically partition Mosaic custom calls ("Mosaic kernels
    cannot be automatically partitioned") — caught by the v5e-8 topology-AOT of
    the full fine-tune step (scripts/aot_full_finetune.py, round 3). Attention
    is independent per batch row AND per head group, so under a >1-device mesh
    the kernel runs in a ``shard_map``: the batch dim over the data axes, and —
    when the mesh has a >1 ``tp`` axis — each array's head dim (``head_axes``,
    None = no head dim, e.g. masks and MQA's single KV head) over ``tp``. Each
    device computes its local (batch shard × head shard), no collectives in the
    forward; the output inherits the first operand's specs. Gradients of
    tp-replicated operands (MQA's KV with q-heads sharded) ARE correct:
    shard_map's transpose psums cotangents over unmentioned mesh axes even
    with check_vma=False — pinned by
    tests/test_attention_shardmap.py::test_tp_replicated_operand_grad_is_psummed
    (custom-vjp kernel stand-in on a tp=4 mesh). Falls back to replicated specs
    along either axis when sizes don't divide the mesh (e.g. batch-1 multi-chip
    serving).
    """
    from kai0_tpu.parallel import sharding as _sharding

    mesh = _sharding.active_mesh()
    if mesh is None or mesh.size == 1:
        return fn(*arrs)
    from jax.sharding import PartitionSpec as P

    n_data = 1
    for axis in _sharding.DATA_AXIS:
        n_data *= mesh.shape[axis]
    n_tp = _sharding.tp_size(mesh)
    batch = arrs[0].shape[0]
    shard_batch = batch % n_data == 0 and batch >= n_data
    if head_axes is None:
        head_axes = (None,) * len(arrs)

    def spec(a, head_axis):
        dims: list = [None] * a.ndim
        # Shard dim 0 only when it IS the batch dim: masks may legally arrive
        # broadcastable ([T, S] / [1, T, S] per flash_mha's _normalize_mask) —
        # blindly sharding their dim 0 would split T or a size-1 dim over the
        # data axes and trace-fail into the silent mha_reference fallback.
        # ndim >= 3 excludes a [T, S] mask whose T coincidentally equals batch.
        if shard_batch and a.ndim >= 3 and a.shape[0] == batch:
            dims[0] = _sharding.DATA_AXIS
        if n_tp > 1 and head_axis is not None and a.shape[head_axis] % n_tp == 0 and a.shape[head_axis] >= n_tp:
            dims[head_axis] = _sharding.TP_AXIS
        return P(*dims)

    specs = tuple(spec(a, h) for a, h in zip(arrs, head_axes, strict=True))
    out_spec = specs[0]
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map
    try:
        # check_vma cannot infer varying-axes for Pallas custom calls (their
        # out_shape is a plain ShapeDtypeStruct) — without disabling it the trace
        # fails and silently demotes every multi-device run to the einsum path
        # (caught by the round-4 v5e-8 --tp AOT, which logged the fallback).
        return shard_map(fn, mesh=mesh, in_specs=specs, out_specs=out_spec, check_vma=False)(*arrs)
    except TypeError:  # older jax: the flag was named check_rep
        return shard_map(fn, mesh=mesh, in_specs=specs, out_specs=out_spec, check_rep=False)(*arrs)


def mha_reference(
    q: jax.Array,  # [B, T, N, H] already RoPE'd and scaled
    k: jax.Array,  # [B, S, K, H] already RoPE'd
    v: jax.Array,  # [B, S, K, H]
    attn_mask: jax.Array,  # bool[B, T, S] or bool[B, 1, T, S]
) -> jax.Array:
    """Grouped-query attention with f32 logits/softmax. Returns [B, T, N, H]."""
    dtype = q.dtype
    num_kv_heads = k.shape[2]
    b, t, n, h = q.shape
    q = q.reshape(b, t, num_kv_heads, n // num_kv_heads, h)
    logits = jnp.einsum("BTKGH,BSKH->BKGTS", q, k, preferred_element_type=jnp.float32)
    if attn_mask.ndim == 3:
        attn_mask = attn_mask[:, None, :, :]
    masked_logits = jnp.where(attn_mask[:, :, None, :, :], logits, BIG_NEG)
    probs = jax.nn.softmax(masked_logits, axis=-1).astype(dtype)
    encoded = jnp.einsum("BKGTS,BSKH->BTKGH", probs, v)
    return encoded.reshape(b, t, n, h)


def mha(q: jax.Array, k: jax.Array, v: jax.Array, attn_mask: jax.Array, *, use_kernel: bool = True) -> jax.Array:
    """Attention dispatcher: fused Pallas kernel on TPU when profitable, else reference."""
    if use_kernel and _kernel_supported(q, k, v):
        from kai0_tpu.ops import pallas_attention

        try:
            # Head axes: q [B,T,N,H] and k/v [B,S,K,H] shard their head dim over a
            # tp mesh axis when divisible (MQA's K=1 never is → KV replicates).
            return _shard_map_batch(pallas_attention.flash_mha, q, k, v, attn_mask, head_axes=(2, 2, 2, None))
        except Exception as e:  # noqa: BLE001 - kernel unavailable (e.g. interpret limits): fall back
            global _FALLBACK_WARNED
            if not _FALLBACK_WARNED:
                _FALLBACK_WARNED = True
                import logging

                logging.getLogger("kai0_tpu").warning(
                    "flash attention kernel unavailable (%s: %s) — falling back to the "
                    "reference path, which materializes [B, N, T, S] f32 logits",
                    type(e).__name__,
                    e,
                )
            return mha_reference(q, k, v, attn_mask)
    return mha_reference(q, k, v, attn_mask)


_FALLBACK_WARNED = False


def _kernel_supported(q, k, v) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # The fused kernel is specialized to MQA (one KV head — true for every Gemma
    # variant the π₀ family uses) and to shapes where fusion beats launch overhead.
    return k.shape[2] == 1 and q.shape[-1] >= 64 and k.shape[1] >= 128


def mhsa_dense(q: jax.Array, k: jax.Array, v: jax.Array, *, use_kernel: bool = True) -> jax.Array:
    """Dense (unmasked) MHA for the SigLIP encoder. q/k/v [B, T, N, H], q pre-scaled.

    Routes to the fused head-major Pallas kernel on TPU (keeps the
    ``[B, N, T, S]`` f32 logits in VMEM — ~150 MB/layer at batch 36 otherwise);
    falls back to the einsum formulation elsewhere.
    """
    b, t, n, h = q.shape
    s = k.shape[1]
    from kai0_tpu import knobs as _knobs

    if (
        use_kernel
        and _knobs.get().siglip_attn == "kernel"
        and jax.default_backend() == "tpu"
        and t % 128 == 0
        and s % 128 == 0
        and t == s
    ):
        from kai0_tpu.ops import pallas_attention

        try:
            qh, kh, vh = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
            return _shard_map_batch(pallas_attention.flash_mhsa, qh, kh, vh, head_axes=(1, 1, 1)).transpose(0, 2, 1, 3)
        except Exception:  # noqa: BLE001 - kernel unavailable: fall back
            pass
    logits = jnp.einsum("btnh,bsnh->bnts", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnts,bsnh->btnh", probs, v)


def mhsa_dense_hm(q: jax.Array, k: jax.Array, v: jax.Array, *, use_kernel: bool = True) -> jax.Array:
    """Dense MHA in head-major layout [B, N, T, H] (no transposes around the kernel)."""
    from kai0_tpu import knobs as _knobs

    b, n, t, h = q.shape
    s = k.shape[2]
    if (
        use_kernel
        and _knobs.get().siglip_attn == "kernel"
        and jax.default_backend() == "tpu"
        and t % 128 == 0
        and s % 128 == 0
        and t == s
    ):
        from kai0_tpu.ops import pallas_attention

        try:
            return _shard_map_batch(pallas_attention.flash_mhsa, q, k, v, head_axes=(1, 1, 1))
        except Exception:  # noqa: BLE001 - kernel unavailable: fall back
            pass
    logits = jnp.einsum("bnth,bnsh->bnts", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnts,bnsh->bnth", probs, v)
