"""SigLIP ViT image encoder — functional JAX, TPU-first.

Behavioral counterpart of reference ``src/openpi/models/siglip.py`` (big_vision ViT,
So400m/14 with ``pool_type="none"`` for the π₀ family → 256 patch tokens per image).
Parameter names/layout match the reference checkpoint contract (flax linen naming,
encoder blocks stacked on a leading depth axis as produced by ``nn.scan``):

``embedding/{kernel,bias}``, ``pos_embedding``,
``Transformer/encoderblock/{LayerNorm_0,MultiHeadDotProductAttention_0/{query,key,
value,out},LayerNorm_1,MlpBlock_0/{Dense_0,Dense_1}}``, ``Transformer/encoder_norm``,
``head/{kernel,bias}``.

Numerics checkpoints (siglip.py:211-239): patch conv + posemb in f32, encoder body in
the model compute dtype (bf16), LayerNorms computed by upcasting to f32 internally
(flax LayerNorm semantics), zero-init head.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
import jax.numpy as jnp
import numpy as np

from kai0_tpu import knobs as _knobs
from kai0_tpu.ops import attention as _attention
from kai0_tpu.ops import quant as _quant
from kai0_tpu.parallel import sharding as _sharding


def _einsum(eqn: str, x: jax.Array, w, site: str) -> jax.Array:
    """Matmul site: bf16 einsum; a frozen int8 ``QuantArray`` at inference
    (``quantize_inference_tree`` — serving only, the tower is never frozen in
    training); or SwitchBack dynamic int8 under ``KAI0_INT8_SB`` (the tower
    trains even in LoRA mode — reference freeze filter only matches ``.*llm.*``
    — so training cannot use the static frozen-weight quantization that covers
    the Gemma sites)."""
    if _quant.is_quant(w):
        return _quant.apply_quant_einsum(w, eqn, x)
    if _quant.switchback_enabled(site):
        return _quant.switchback_einsum(eqn, x, w)
    return jnp.einsum(eqn, x, w)


def _cast(w, dtype):
    """Cast a weight to the compute dtype; QuantArrays carry their own scales."""
    return w if _quant.is_quant(w) else w.astype(dtype)


@dataclasses.dataclass(frozen=True)
class Config:
    num_classes: int
    width: int = 1152
    depth: int = 27
    mlp_dim: int = 4304
    num_heads: int = 16
    patch_size: tuple[int, int] = (14, 14)
    posemb: str = "learn"
    pool_type: str = "none"
    head_zeroinit: bool = True
    dtype_mm: str = "float32"


_VARIANTS = {
    # width, depth, mlp_dim, num_heads — Table 2 of arXiv:2106.04560 (reference siglip.py:298-373)
    "mu": (32, 1, 128, 2),
    "Ti": (192, 12, 768, 3),
    "S": (384, 12, 1536, 6),
    "M": (512, 12, 2048, 8),
    "B": (768, 12, 3072, 12),
    "L": (1024, 24, 4096, 16),
    "So400m": (1152, 27, 4304, 16),
    "H": (1280, 32, 5120, 16),
}


def decode_variant(variant: str) -> dict:
    v, patch = variant, {}
    if "/" in variant:
        v, p = variant.split("/")
        patch = {"patch_size": (int(p), int(p))}
    width, depth, mlp_dim, num_heads = _VARIANTS[v]
    return {"width": width, "depth": depth, "mlp_dim": mlp_dim, "num_heads": num_heads, **patch}


def get_config(num_classes: int, variant: str = "So400m/14", dtype_mm: str = "float32") -> Config:
    return Config(num_classes=num_classes, dtype_mm=dtype_mm, **decode_variant(variant))


# --------------------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------------------


def init(rng: jax.Array, config: Config, image_resolution: tuple[int, int] = (224, 224)) -> dict:
    import flax.linen as nn

    keys = iter(jax.random.split(rng, 16))
    w, d = config.width, config.depth
    ph, pw = config.patch_size
    grid = (image_resolution[0] // ph) * (image_resolution[1] // pw)
    head_dim = w // config.num_heads

    xavier = nn.initializers.xavier_uniform()

    def dense(k, din, dout):
        k1, k2 = jax.random.split(k)
        return {"kernel": xavier(k1, (din, dout)), "bias": 1e-6 * jax.random.normal(k2, (dout,))}

    def stack_tree(init_fn, key):
        trees = [init_fn(k) for k in jax.random.split(key, d)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    def block(k):
        k1, k2, k3, k4, k5, k6, k7 = jax.random.split(k, 7)
        return {
            "LayerNorm_0": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "MultiHeadDotProductAttention_0": {
                "query": {
                    "kernel": xavier(k1, (w, config.num_heads * head_dim)).reshape(w, config.num_heads, head_dim),
                    "bias": jnp.zeros((config.num_heads, head_dim)),
                },
                "key": {
                    "kernel": xavier(k2, (w, config.num_heads * head_dim)).reshape(w, config.num_heads, head_dim),
                    "bias": jnp.zeros((config.num_heads, head_dim)),
                },
                "value": {
                    "kernel": xavier(k3, (w, config.num_heads * head_dim)).reshape(w, config.num_heads, head_dim),
                    "bias": jnp.zeros((config.num_heads, head_dim)),
                },
                "out": {
                    "kernel": xavier(k4, (config.num_heads * head_dim, w)).reshape(config.num_heads, head_dim, w),
                    "bias": jnp.zeros((w,)),
                },
            },
            "LayerNorm_1": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "MlpBlock_0": {"Dense_0": dense(k5, w, config.mlp_dim), "Dense_1": dense(k6, config.mlp_dim, w)},
        }

    params = {
        "embedding": {
            "kernel": nn.initializers.lecun_normal()(next(keys), (ph, pw, 3, w)),
            "bias": jnp.zeros((w,)),
        },
        "pos_embedding": nn.initializers.normal(stddev=1 / np.sqrt(w))(next(keys), (1, grid, w)),
        "Transformer": {
            "encoderblock": stack_tree(block, next(keys)),
            "encoder_norm": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
        },
    }
    if config.num_classes:
        params["head"] = {
            "kernel": jnp.zeros((w, config.num_classes))
            if config.head_zeroinit
            else xavier(next(keys), (w, config.num_classes)),
            "bias": jnp.zeros((config.num_classes,)),
        }
    return params


# --------------------------------------------------------------------------------------
# Apply
# --------------------------------------------------------------------------------------


def _layer_norm(params: dict, x: jax.Array) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return (normed * params["scale"] + params["bias"]).astype(dtype)


def _mhsa(params: dict, x: jax.Array, num_heads: int) -> jax.Array:
    """Flax-style MultiHeadDotProductAttention (bidirectional, f32 softmax).

    Projections produce the head-major layout the fused kernel consumes directly
    (no transposes between projection and attention).
    """
    dtype = x.dtype
    wq, wk, wv = (params[s]["kernel"] for s in ("query", "key", "value"))
    w_out = params["out"]["kernel"]
    flat = (
        _knobs.get().vit_qkv == "flat"
        and not _quant.is_quant(wq)
        and not _quant.switchback_enabled("attn")
    )
    if flat:
        # KAI0_VIT_QKV=flat: run each projection as one full-width [D, N*H] dot
        # (1152 = 9×128 lanes, no head-dim-72 lane padding) and split heads with an
        # explicit reshape+transpose afterwards. Probes whether the projection
        # cluster's measured ~52%-of-peak rate is lane padding (recoverable) or
        # layout traffic (not).
        d, n, h = wq.shape

        def proj(w, bias):
            y = _einsum("btd,de->bte", x, w.reshape(d, n * h).astype(dtype), "attn")
            y = y + bias.reshape(n * h).astype(dtype)
            return y.reshape(*y.shape[:2], n, h).transpose(0, 2, 1, 3)

        q = proj(wq, params["query"]["bias"])
        k = proj(wk, params["key"]["bias"])
        v = proj(wv, params["value"]["bias"])
    else:
        # k/v reuse the query eqn string (labels are positional) so one QuantArray
        # layout covers all three projections; head-major output feeds the fused
        # kernel with no transposes.
        q = _einsum("btd,dnh->bnth", x, _cast(wq, dtype), "attn") + params["query"]["bias"].astype(dtype)[None, :, None, :]
        k = _einsum("btd,dnh->bnth", x, _cast(wk, dtype), "attn") + params["key"]["bias"].astype(dtype)[None, :, None, :]
        v = _einsum("btd,dnh->bnth", x, _cast(wv, dtype), "attn") + params["value"]["bias"].astype(dtype)[None, :, None, :]
    head_dim = q.shape[-1]
    # Python-float scale keeps q weakly typed (an np scalar would upcast bf16→f32).
    encoded = _attention.mhsa_dense_hm(q * float(1.0 / np.sqrt(head_dim)), k, v)
    if _quant.is_quant(w_out):
        # Quantized rank-2 layout needs trailing contracted labels: feed the
        # [B,T,N,H] view (one transpose; the bf16 path stays head-major).
        proj = _quant.apply_quant_einsum(w_out, "btnh,nhd->btd", jnp.swapaxes(encoded, 1, 2))
    elif flat:
        n, h, d = w_out.shape
        flat_enc = encoded.transpose(0, 2, 1, 3).reshape(*x.shape[:2], n * h)
        proj = _einsum("bte,ed->btd", flat_enc, w_out.reshape(n * h, d).astype(dtype), "attn")
    else:
        proj = _einsum("bnth,nhd->btd", encoded, w_out.astype(dtype), "attn")
    return proj + params["out"]["bias"].astype(dtype)


def _mlp_block(params: dict, x: jax.Array) -> jax.Array:
    dtype = x.dtype
    if _knobs.get().vit_mlp2d and not (
        _quant.is_quant(params["Dense_0"]["kernel"]) or _quant.switchback_enabled("mlp")
    ):
        # Probe: spell the MLP as rank-2 dots on a flattened [B·T, D] view. The
        # round-3 trace shows the rank-3 fwd down-projection fusion at ~44% MFU
        # while its (identical-shape) backward recompute runs at ~93% — testing
        # whether the rank-3 einsum's chosen layout is the gap.
        b, t, d = x.shape
        x2 = x.reshape(b * t, d)
        x2 = jnp.dot(x2, params["Dense_0"]["kernel"].astype(dtype)) + params["Dense_0"]["bias"].astype(dtype)
        x2 = _checkpoint_name(x2.reshape(b, t, -1), "kai0_vit_mlp_up").reshape(b * t, -1)
        x2 = jax.nn.gelu(x2)
        x2 = jnp.dot(x2, params["Dense_1"]["kernel"].astype(dtype)) + params["Dense_1"]["bias"].astype(dtype)
        return x2.reshape(b, t, -1)
    x = _einsum("btd,df->btf", x, _cast(params["Dense_0"]["kernel"], dtype), "mlp") + params["Dense_0"]["bias"].astype(dtype)
    # KAI0_REMAT=attn+vitmlp saves this (~79 MB/layer at batch 12): the backward
    # recompute then skips the up-projection matmul — the largest dot in the block
    # (~30% of a SigLIP forward pass). Both wgrads stay exact: Dense_1's input is
    # re-gelu'd from the saved tensor, Dense_0's input is the cheap LayerNorm
    # recompute from the scan carry. No-op under other policies.
    x = _checkpoint_name(x, "kai0_vit_mlp_up")
    x = jax.nn.gelu(x)
    return _einsum("btf,fd->btd", x, _cast(params["Dense_1"]["kernel"], dtype), "mlp") + params["Dense_1"]["bias"].astype(dtype)


def _encoder_block(block_params: dict, x: jax.Array, num_heads: int) -> jax.Array:
    x = _sharding.activation_sharding_constraint(x)
    y = _layer_norm(block_params["LayerNorm_0"], x)
    y = _mhsa(block_params["MultiHeadDotProductAttention_0"], y, num_heads)
    # KAI0_REMAT=attn saves this (~21 MB/layer at batch 12) so the backward skips
    # the attention recompute; no-op under other remat policies.
    y = _checkpoint_name(y, "kai0_attn_out")
    y = _sharding.activation_sharding_constraint(y)
    x = x + y
    y = _layer_norm(block_params["LayerNorm_1"], x)
    y = _mlp_block(block_params["MlpBlock_0"], y)
    y = _sharding.activation_sharding_constraint(y)
    x = x + y
    return _sharding.activation_sharding_constraint(x)


def apply(params: dict, config: Config, image: jax.Array) -> jax.Array:
    """Encode ``[B, H, W, 3]`` images in [-1, 1] to patch tokens ``[B, N, num_classes]``."""
    # Patch extraction + posemb in f32 (reference siglip.py:211-229). The stride-14
    # patch "conv" is non-overlapping, so it is exactly an im2col reshape + one
    # [B·N, ph·pw·3] × [ph·pw·3, D] f32 matmul (KAI0_VIT_CONV=im2col). Measured
    # end-to-end the dot spelling is NOT faster (10.42 vs 10.44 samples/s at
    # batch 12 — the conv's xprof self-time overlaps in the schedule), so the
    # conv lowering stays default; the knob remains for other shapes/generations.
    image = jnp.asarray(image, jnp.float32)
    kernel = params["embedding"]["kernel"].astype(jnp.float32)  # [ph, pw, 3, D] (HWIO)
    ph, pw = config.patch_size
    if _knobs.get().vit_conv == "conv":
        x = jax.lax.conv_general_dilated(
            image,
            kernel,
            window_strides=config.patch_size,
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["embedding"]["bias"].astype(jnp.float32)
        n, h, w, c = x.shape
        x = x.reshape(n, h * w, c)
    else:
        n, hh, ww, cc = image.shape
        gh, gw = hh // ph, ww // pw
        patches = image.reshape(n, gh, ph, gw, pw, cc)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(n, gh * gw, ph * pw * cc)
        x = jnp.dot(patches, kernel.reshape(ph * pw * cc, -1)) + params["embedding"][
            "bias"
        ].astype(jnp.float32)
    x = x + params["pos_embedding"]

    # Encoder in the model compute dtype, scanning stacked blocks with remat.
    x = x.astype(config.dtype_mm)

    def scan_body(x, block_params):
        return _encoder_block(block_params, x, config.num_heads), None

    from kai0_tpu.models import gemma as _gemma

    body = _gemma._maybe_remat(scan_body, env="KAI0_REMAT_VIT")
    x, _ = jax.lax.scan(body, x, params["Transformer"]["encoderblock"])
    x = _layer_norm(params["Transformer"]["encoder_norm"], x)

    if config.pool_type != "none":
        raise NotImplementedError(f"pool_type {config.pool_type!r}: the π₀ family uses 'none'")

    if config.num_classes:
        dtype = x.dtype
        x = _einsum("btd,dc->btc", x, _cast(params["head"]["kernel"], dtype), "head") + params["head"]["bias"].astype(dtype)
    return x
