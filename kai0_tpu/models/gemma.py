"""Multi-expert Gemma transformer — functional JAX, TPU-first.

Re-designed from the behavior of reference ``src/openpi/models/gemma.py`` (big_vision
Gemma with a *list of expert configs sharing one attention*): tokens from each expert
get separate QKV/out/FFN weights but attend jointly over the concatenated sequence.
Differences from the reference implementation (not behavior):

- No flax linen/nnx: parameters are plain nested dicts; the layer stack is a
  ``jax.lax.scan`` over weights stacked on a leading depth axis (same physical layout
  the reference gets from ``nn.scan`` — checkpoint-compatible), with
  ``jax.checkpoint`` rematerialization (``nothing_saveable``) per block.
- Parameter names match the reference checkpoint contract exactly: expert 0 weights
  have no suffix, expert i>0 get ``_i`` (gemma.py:443-450 ``_name``); e.g.
  ``layers/attn/q_einsum_1/w``, ``layers/pre_attention_norm_1/Dense_0/kernel``.

Numerics parity checkpoints (gemma.py:112-131, 216-230, 424-440): RMSNorm variance in
f32 with eps 1e-6 and zero-init scale (+1); adaRMS scale/shift/gate from a zero-init
dense on the conditioning vector with gated residuals; f32 attention logits with
``big_neg`` masking; RoPE in f32 with max_wavelength 10k; embedding scaled by
``sqrt(width)``.
"""

from __future__ import annotations

from collections.abc import Sequence
import dataclasses
from typing import Literal

import jax
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
import jax.numpy as jnp

from kai0_tpu.models import lora as _lora
from kai0_tpu.ops import attention as _attention
from kai0_tpu.ops import masks as _masks
from kai0_tpu.parallel import sharding as _sharding

PALIGEMMA_VOCAB_SIZE = 257_152


@dataclasses.dataclass(frozen=True)
class Config:
    width: int
    depth: int
    mlp_dim: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    lora_attn: _lora.LoRAConfig | None = None
    lora_ffn: _lora.LoRAConfig | None = None


Variant = Literal["dummy", "dummy_lora", "gemma_300m", "gemma_300m_lora", "gemma_2b", "gemma_2b_lora"]


def get_config(variant: Variant) -> Config:
    """Gemma variant table (parity: reference gemma.py:58-109)."""
    if variant == "dummy":
        return Config(width=64, depth=4, mlp_dim=128, num_heads=8, num_kv_heads=1, head_dim=16)
    if variant == "dummy_lora":
        # Test-size LoRA variant: exercises the freeze filter / frozen-base paths
        # (incl. int8 quantization) on CPU in seconds.
        return Config(
            width=64,
            depth=4,
            mlp_dim=128,
            num_heads=8,
            num_kv_heads=1,
            head_dim=16,
            lora_attn=_lora.LoRAConfig(rank=4, alpha=4.0),
            lora_ffn=_lora.LoRAConfig(rank=4, alpha=4.0),
        )
    if variant == "gemma_300m":
        return Config(width=1024, depth=18, mlp_dim=4096, num_heads=8, num_kv_heads=1, head_dim=256)
    if variant == "gemma_2b":
        return Config(width=2048, depth=18, mlp_dim=16_384, num_heads=8, num_kv_heads=1, head_dim=256)
    if variant == "gemma_2b_lora":
        return Config(
            width=2048,
            depth=18,
            mlp_dim=16_384,
            num_heads=8,
            num_kv_heads=1,
            head_dim=256,
            lora_attn=_lora.LoRAConfig(rank=16, alpha=16.0),
            lora_ffn=_lora.LoRAConfig(rank=16, alpha=16.0),
        )
    if variant == "gemma_300m_lora":
        return Config(
            width=1024,
            depth=18,
            mlp_dim=4096,
            num_heads=8,
            num_kv_heads=1,
            head_dim=256,
            lora_attn=_lora.LoRAConfig(rank=32, alpha=32.0),
            lora_ffn=_lora.LoRAConfig(rank=32, alpha=32.0),
        )
    raise ValueError(f"Unknown variant: {variant}")


def _name(name: str, i: int) -> str:
    """Expert-0 weights keep the bare name so PaliGemma checkpoints load 1:1."""
    return name if i == 0 else f"{name}_{i}"


# --------------------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------------------


def init(rng: jax.Array, configs: Sequence[Config], use_adarms: Sequence[bool]) -> dict:
    """Initialize the full multi-expert parameter tree (stacked over depth)."""
    import flax.linen as nn

    assert all(c.depth == configs[0].depth for c in configs)
    depth = configs[0].depth
    keys = iter(jax.random.split(rng, 64))

    params: dict = {
        "embedder": {
            "input_embedding": nn.initializers.normal()(next(keys), (PALIGEMMA_VOCAB_SIZE, configs[0].width))
        }
    }

    def stack(init_fn):
        """Initialize one leaf per layer and stack on a leading depth axis."""
        leaves = [init_fn(k) for k in jax.random.split(next(keys), depth)]
        return jnp.stack(leaves)

    def stack_tree(init_fn):
        trees = [init_fn(k) for k in jax.random.split(next(keys), depth)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    layers: dict = {"attn": {}}
    lecun_b01 = nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0, 1))
    lecun_b0 = nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0,))
    lecun_out = nn.initializers.lecun_normal(in_axis=(-3, -2), out_axis=-1)

    for i, c in enumerate(configs):
        if c.num_kv_heads == c.num_heads:
            layers["attn"][_name("qkv_einsum", i)] = stack_tree(
                lambda k, c=c: _lora.init_einsum(
                    k, (3, c.num_heads, c.width, c.head_dim), lecun_b01, c.lora_attn
                )
            )
        else:
            layers["attn"][_name("q_einsum", i)] = stack_tree(
                lambda k, c=c: _lora.init_einsum(k, (c.num_heads, c.width, c.head_dim), lecun_b0, c.lora_attn)
            )
            layers["attn"][_name("kv_einsum", i)] = stack_tree(
                lambda k, c=c: _lora.init_einsum(
                    k, (2, c.num_kv_heads, c.width, c.head_dim), lecun_b01, c.lora_attn
                )
            )
        layers["attn"][_name("attn_vec_einsum", i)] = stack_tree(
            lambda k, c=c: _lora.init_einsum(k, (c.num_heads, c.head_dim, c.width), lecun_out, c.lora_attn)
        )
        for norm in ("pre_attention_norm", "pre_ffw_norm"):
            layers[_name(norm, i)] = stack_tree(lambda k, c=c, a=use_adarms[i]: _init_rmsnorm(k, c.width, adarms=a))
        layers[_name("mlp", i)] = stack_tree(lambda k, c=c: _lora.init_ffn(k, c.width, c.mlp_dim, c.lora_ffn))

    params["layers"] = layers
    for i, c in enumerate(configs):
        params[_name("final_norm", i)] = _init_rmsnorm(next(keys), c.width, adarms=use_adarms[i])
    return params


def _init_rmsnorm(rng: jax.Array, width: int, *, adarms: bool) -> dict:
    if not adarms:
        return {"scale": jnp.zeros((width,))}
    # adaRMS: zero-init dense producing scale/shift/gate from the conditioning vector
    # (reference gemma.py:128: nn.Dense(3*width, kernel_init=zeros) → name Dense_0).
    return {"Dense_0": {"kernel": jnp.zeros((width, 3 * width)), "bias": jnp.zeros((3 * width,))}}


# --------------------------------------------------------------------------------------
# Apply
# --------------------------------------------------------------------------------------


def _rms_norm(params: dict, x: jax.Array, cond: jax.Array | None):
    """RMSNorm / adaRMSNorm. Returns (normed, gate)."""
    dtype = x.dtype
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    normed = x * jnp.reciprocal(jnp.sqrt(var + 1e-06))  # promotes to f32
    if cond is None:
        if "scale" not in params:
            raise ValueError("adaRMS norm params but no conditioning vector provided")
        return (normed * (1 + params["scale"])).astype(dtype), None
    dense = params["Dense_0"]
    modulation = jnp.dot(cond.astype(dtype), dense["kernel"].astype(dtype)) + dense["bias"].astype(dtype)
    scale, shift, gate = jnp.split(modulation[:, None, :], 3, axis=-1)
    normed = normed * (1 + scale) + shift
    return normed.astype(dtype), gate


def _gated_residual(x, y, gate):
    if x is None:
        return None
    if gate is None:
        return x + y
    return x + y * gate


def _attn(
    attn_params: dict,
    configs: Sequence[Config],
    xs: Sequence[jax.Array | None],
    positions: jax.Array,
    attn_mask: jax.Array,
    kv_cache,
):
    """Joint attention over concatenated expert tokens (reference gemma.py:158-249)."""
    c0 = configs[0]
    assert all(c.head_dim == c0.head_dim for c in configs)
    assert all(c.num_heads == c0.num_heads for c in configs)
    assert all(c.num_kv_heads == c0.num_kv_heads for c in configs)

    qs, ks, vs = [], [], []
    for i, (x, config) in enumerate(zip(xs, configs, strict=True)):
        if x is None:
            continue
        if config.num_kv_heads == config.num_heads:
            qkv = _lora.apply_einsum(
                attn_params[_name("qkv_einsum", i)], "BSD,3KDH->3BSKH", x, config.lora_attn
            )
            q, k, v = qkv
        else:
            q = _lora.apply_einsum(attn_params[_name("q_einsum", i)], "BTD,NDH->BTNH", x, config.lora_attn)
            k, v = _lora.apply_einsum(attn_params[_name("kv_einsum", i)], "BSD,2KDH->2BSKH", x, config.lora_attn)
        qs.append(q)
        ks.append(k)
        vs.append(v)

    q = jnp.concatenate(qs, axis=1)
    k = jnp.concatenate(ks, axis=1)
    v = jnp.concatenate(vs, axis=1)

    q = _masks.apply_rope(q, positions=positions)
    q *= c0.head_dim**-0.5
    k = _masks.apply_rope(k, positions=positions)

    if kv_cache is not None:
        cache_k, cache_v = kv_cache
        k = jnp.concatenate([cache_k, k], axis=1)
        v = jnp.concatenate([cache_v, v], axis=1)

    encoded = _attention.mha(q, k, v, attn_mask)

    out = []
    start = 0
    for i, (x, config) in enumerate(zip(xs, configs, strict=True)):
        if x is not None:
            end = start + x.shape[1]
            out.append(
                _lora.apply_einsum(
                    attn_params[_name("attn_vec_einsum", i)],
                    "BTNH,NHD->BTD",
                    encoded[:, start:end],
                    config.lora_attn,
                )
            )
            start = end
        else:
            out.append(None)
    return out, (k, v)


def _block(
    layer_params: dict,
    configs: Sequence[Config],
    xs: Sequence[jax.Array | None],
    kv_cache,
    positions: jax.Array,
    attn_mask: jax.Array,
    adarms_cond: Sequence[jax.Array | None],
):
    """One transformer block over all experts (reference gemma.py:284-333)."""
    xs = _sharding.activation_sharding_constraint(xs)

    pre_attn, gates = [], []
    for i, x in enumerate(xs):
        gate = None
        if x is not None:
            x, gate = _rms_norm(layer_params[_name("pre_attention_norm", i)], x, adarms_cond[i])
        pre_attn.append(x)
        gates.append(gate)

    pre_attn = _sharding.activation_sharding_constraint(pre_attn)
    post_attn, kv_cache = _attn(layer_params["attn"], configs, pre_attn, positions, attn_mask, kv_cache)
    # Tag for KAI0_REMAT=attn: saving these lets the backward skip the whole
    # attention sub-block recompute (no-op under other policies).
    post_attn = [None if x is None else _checkpoint_name(x, "kai0_attn_out") for x in post_attn]
    post_attn = _sharding.activation_sharding_constraint(post_attn)
    xs = [_gated_residual(x, y, g) for x, y, g in zip(xs, post_attn, gates, strict=True)]
    xs = _sharding.activation_sharding_constraint(xs)

    out, gates = [], []
    for i, x in enumerate(xs):
        gate = None
        if x is not None:
            x, gate = _rms_norm(layer_params[_name("pre_ffw_norm", i)], x, adarms_cond[i])
            x = _lora.apply_ffn(layer_params[_name("mlp", i)], x)
        out.append(x)
        gates.append(gate)

    out = _sharding.activation_sharding_constraint(out)
    xs = [_gated_residual(x, y, g) for x, y, g in zip(xs, out, gates, strict=True)]
    xs = _sharding.activation_sharding_constraint(xs)
    return xs, kv_cache


def embed(params: dict, tokens: jax.Array, embed_dtype: str = "bfloat16") -> jax.Array:
    """Token embedding lookup scaled by sqrt(width) (reference gemma.py:148-151, 384-386)."""
    table = params["embedder"]["input_embedding"]
    x = table[(tokens,)]
    x *= jnp.sqrt(table.shape[-1]).astype(x.dtype)
    return x.astype(embed_dtype)


def decode_logits(params: dict, x: jax.Array) -> jax.Array:
    """Project hidden states back onto the vocabulary (tied embedding)."""
    return jnp.dot(x, params["embedder"]["input_embedding"].T.astype(x.dtype))


def _remat_policy(env: str = "KAI0_REMAT"):
    """Rematerialization policy for the layer scan.

    ``KAI0_REMAT`` selects the memory/compute trade (``KAI0_REMAT_VIT`` overrides
    it for the SigLIP tower only, falling back to ``KAI0_REMAT`` when unset —
    the ViT is ~30% of step time at <40% MFU under full recompute, so it often
    wants a more save-happy policy than the gemma scans):
      - ``nothing`` (default): recompute everything in backward — minimum HBM, the
        reference's ``nothing_saveable`` behavior (gemma.py:359-381);
      - ``dots``: save matmul outputs — faster backward, more HBM;
      - ``attn``: save only the per-block attention outputs (post ``attn_vec``
        projection, tagged ``kai0_attn_out``) — the backward skips the entire
        attention sub-block recompute (qkv/RoPE/flash/out-proj, ~12% of block
        FLOPs at lower-than-FFN MFU) for ~49 MB/layer at batch 12 (~880 MB).
        SigLIP blocks tag their attention outputs with the same name
        (siglip.py ``_encoder_block``), adding ~570 MB and skipping the ViT
        attention recompute too;
      - ``attn+vitmlp``: ``attn`` plus the SigLIP MLP up-projection outputs
        (tagged ``kai0_vit_mlp_up``, ~2.1 GB at batch 12) — the ViT backward
        recompute skips its largest matmul. Gemma FFN outputs stay untagged:
        the equivalent saves there are ~380 MB/layer and OOM immediately.
        Measured OOM at int8 batch 12 (needs 16.4 of 15.75 GB) — for smaller
        batches / bigger-HBM parts;
      - ``vitmlp``: only the SigLIP up-projection saves — +0.65 GB net vs
        ``attn`` (the attention saves are dropped), trading the attention
        recompute skip for the ViT's largest-matmul skip;
      - ``none``: no remat — fastest backward, activations fully resident (fits for
        LoRA fine-tunes / small batches).
    """
    from kai0_tpu import knobs as _knobs

    k = _knobs.get()
    mode = (k.remat_vit if env == "KAI0_REMAT_VIT" else None) or k.remat
    if mode == "none":
        return None
    if mode == "dots":
        return jax.checkpoint_policies.dots_saveable
    if mode == "attn":
        return jax.checkpoint_policies.save_only_these_names("kai0_attn_out")
    if mode == "attnres":
        # Save the flash kernels' (out, lse) residuals instead of the post-
        # projection attention output: the backward then feeds the bwd kernel
        # directly rather than re-running the fwd kernel to regenerate them
        # (ops/pallas_attention.py tags). ~Same bytes as ``attn`` (+lse).
        return jax.checkpoint_policies.save_only_these_names("kai0_attn_res")
    if mode == "attn+res":
        return jax.checkpoint_policies.save_only_these_names("kai0_attn_out", "kai0_attn_res")
    if mode == "attn+vitmlp":
        return jax.checkpoint_policies.save_only_these_names("kai0_attn_out", "kai0_vit_mlp_up")
    if mode == "vitmlp":
        return jax.checkpoint_policies.save_only_these_names("kai0_vit_mlp_up")
    return jax.checkpoint_policies.nothing_saveable


def _maybe_remat(fn, env: str = "KAI0_REMAT"):
    if _remat_policy(env) is None:
        return fn
    return jax.checkpoint(fn, policy=_remat_policy(env), prevent_cse=False)


def apply(
    params: dict,
    configs: Sequence[Config],
    embedded: Sequence[jax.Array | None],
    positions: jax.Array,
    mask: jax.Array,
    adarms_cond: Sequence[jax.Array | None] | None = None,
    *,
    kv_cache=None,
    embed_dtype: str = "bfloat16",
):
    """Run the layer stack. Returns (per-expert outputs, stacked KV cache [L, B, S, K, H])."""
    embedded = [e.astype(embed_dtype) if e is not None else None for e in embedded]
    if adarms_cond is None:
        adarms_cond = [None] * len(configs)
    if mask.ndim == 3:
        mask = mask[:, None, :, :]

    def scan_body(xs, scanned):
        layer_params, layer_kv = scanned
        new_xs, new_kv = _block(layer_params, configs, xs, layer_kv, positions, mask, adarms_cond)
        return new_xs, new_kv

    body = _maybe_remat(scan_body)

    if kv_cache is None:
        # lax.scan needs a uniform xs pytree: scan only over layer params.
        def body_nocache(xs, layer_params):
            return body(xs, (layer_params, None))

        xs_out, kv_all = jax.lax.scan(body_nocache, list(embedded), params["layers"])
    else:
        xs_out, kv_all = jax.lax.scan(body, list(embedded), (params["layers"], kv_cache))

    outs = []
    for i, (e, a) in enumerate(zip(xs_out, adarms_cond, strict=True)):
        if e is None:
            outs.append(None)
        else:
            outs.append(_rms_norm(params[_name("final_norm", i)], e, a)[0])
    return outs, kv_all
