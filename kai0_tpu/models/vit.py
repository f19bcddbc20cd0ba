"""Generic Vision Transformer — functional JAX, TPU-first.

Behavioral counterpart of reference ``src/openpi/models/vit.py`` (the vit_jax
``models_vit.py`` adaptation shipped for RoboArena-style baselines). Note the
reference copy is dead code and cannot even import — it references an
``openpi.models.resnet`` module that does not exist in the repo — so this rebuild
covers the *runnable* subset: patch embedding, optional CLS token, learned position
embeddings, a scanned+remat encoder, token/gap/unpooled classifiers, optional
tanh ``pre_logits`` representation layer, zero-init classification head. The
ResNet-hybrid root (reference vit.py:239-258) is intentionally absent because its
backbone module is missing upstream; requesting it raises.

Param layout follows vit_jax naming (``embedding``, ``cls``,
``Transformer/posembed_input/pos_embedding``, ``Transformer/encoderblock/*``,
``Transformer/encoder_norm``, ``pre_logits``, ``head``) with encoder blocks stacked
on a leading depth axis, reusing the SigLIP encoder implementation (identical flax
auto-naming inside blocks: LayerNorm_0 / MultiHeadDotProductAttention_0 /
LayerNorm_1 / MlpBlock_0).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kai0_tpu.models import siglip as _siglip


@dataclasses.dataclass(frozen=True)
class Config:
    num_classes: int
    patch_size: tuple[int, int] = (16, 16)
    width: int = 768
    depth: int = 12
    mlp_dim: int = 3072
    num_heads: int = 12
    classifier: str = "token"  # token | gap | unpooled | token_unpooled
    representation_size: int | None = None
    head_bias_init: float = 0.0
    dtype_mm: str = "float32"


# width, depth, mlp_dim, num_heads — the standard ViT size table (vit_jax configs).
_VARIANTS = {
    "Ti": (192, 12, 768, 3),
    "S": (384, 12, 1536, 6),
    "B": (768, 12, 3072, 12),
    "L": (1024, 24, 4096, 16),
    "H": (1280, 32, 5120, 16),
}


def get_config(num_classes: int, variant: str = "B/16", **kwargs) -> Config:
    v, p = variant.split("/")
    width, depth, mlp_dim, num_heads = _VARIANTS[v]
    return Config(
        num_classes=num_classes,
        patch_size=(int(p), int(p)),
        width=width,
        depth=depth,
        mlp_dim=mlp_dim,
        num_heads=num_heads,
        **kwargs,
    )


def init(rng: jax.Array, config: Config, image_resolution: tuple[int, int] = (224, 224)) -> dict:
    import flax.linen as nn

    ph, pw = config.patch_size
    grid = (image_resolution[0] // ph) * (image_resolution[1] // pw)
    seq = grid + (1 if config.classifier in ("token", "token_unpooled") else 0)
    w = config.width

    k_embed, k_pos, k_blocks, k_rep = jax.random.split(rng, 4)

    # Reuse the SigLIP block initializer — identical block param structure/naming.
    sig_cfg = _siglip.Config(
        num_classes=0,
        width=w,
        depth=config.depth,
        mlp_dim=config.mlp_dim,
        num_heads=config.num_heads,
        patch_size=config.patch_size,
    )
    sig_params = _siglip.init(k_blocks, sig_cfg, image_resolution)

    params = {
        "embedding": {
            "kernel": nn.initializers.lecun_normal()(k_embed, (ph, pw, 3, w)),
            "bias": jnp.zeros((w,)),
        },
        "Transformer": {
            "posembed_input": {
                # BERT-style stddev 0.02 (reference vit.py:194).
                "pos_embedding": nn.initializers.normal(stddev=0.02)(k_pos, (1, seq, w)),
            },
            "encoderblock": sig_params["Transformer"]["encoderblock"],
            "encoder_norm": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
        },
    }
    if config.classifier in ("token", "token_unpooled"):
        params["cls"] = jnp.zeros((1, 1, w))
    if config.representation_size is not None:
        params["pre_logits"] = {
            "kernel": nn.initializers.lecun_normal()(k_rep, (w, config.representation_size)),
            "bias": jnp.zeros((config.representation_size,)),
        }
    if config.num_classes:
        head_w = config.representation_size or w
        params["head"] = {
            "kernel": jnp.zeros((head_w, config.num_classes)),
            "bias": jnp.full((config.num_classes,), config.head_bias_init, jnp.float32),
        }
    return params


def apply(params: dict, config: Config, image: jax.Array) -> jax.Array:
    """Encode ``[B, H, W, 3]`` images; returns logits ``[B, num_classes]`` (or tokens
    for unpooled classifiers / ``num_classes=0``)."""
    x = jnp.asarray(image, jnp.float32)
    x = jax.lax.conv_general_dilated(
        x,
        params["embedding"]["kernel"].astype(jnp.float32),
        window_strides=config.patch_size,
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["embedding"]["bias"].astype(jnp.float32)
    n, h, w_, c = x.shape
    x = x.reshape(n, h * w_, c)

    if config.classifier in ("token", "token_unpooled"):
        cls = jnp.tile(params["cls"].astype(x.dtype), (n, 1, 1))
        x = jnp.concatenate([cls, x], axis=1)

    x = x + params["Transformer"]["posembed_input"]["pos_embedding"]
    x = x.astype(config.dtype_mm)

    def scan_body(x, block_params):
        return _siglip._encoder_block(block_params, x, config.num_heads), None

    from kai0_tpu.models import gemma as _gemma

    body = _gemma._maybe_remat(scan_body)
    x, _ = jax.lax.scan(body, x, params["Transformer"]["encoderblock"])
    x = _siglip._layer_norm(params["Transformer"]["encoder_norm"], x)

    if config.classifier == "token":
        x = x[:, 0]
    elif config.classifier == "gap":
        x = jnp.mean(x, axis=1)
    elif config.classifier in ("unpooled", "token_unpooled"):
        pass
    else:
        raise ValueError(f"Invalid classifier={config.classifier}")

    if config.representation_size is not None:
        dtype = x.dtype
        x = jnp.tanh(
            x @ params["pre_logits"]["kernel"].astype(dtype) + params["pre_logits"]["bias"].astype(dtype)
        )

    if config.num_classes:
        dtype = x.dtype
        x = x @ params["head"]["kernel"].astype(dtype) + params["head"]["bias"].astype(dtype)
    return x
