"""Bidirectional converter: openpi JAX param trees ↔ the reference's torch layout.

The reference's PyTorch trainer saves checkpoints as ``model.safetensors`` whose
keys come from ``PI0Pytorch`` (reference scripts/train_pytorch.py:149-196): HF
``PaliGemmaForConditionalGeneration`` + patched ``GemmaForCausalLM`` expert under
``paligemma_with_expert.*`` (reference models_pytorch/gemma_pytorch.py:24-58),
plus the flat projection heads (``action_in_proj`` …) and, for the
AdvantageEstimator, ``value_head.{0,2,4}`` (pi0_pytorch.py:470-481). kai0's
released advantage-estimator checkpoints are exactly this format, so serving and
evaluation here must load it (reference policies/policy_config.py:48-57 detects it
by the presence of ``model.safetensors``).

Mapping notes (derived from both model definitions, validated by the round-trip
test in tests/test_interop.py):

- torch ``nn.Linear.weight`` is ``[out, in]`` = JAX ``kernel.T``.
- gemma attention einsum weights: ``q_einsum/w [L,N,D,H]`` ↔ per-layer
  ``q_proj.weight [N·H, D]`` (permute N,H,D then flatten heads);
  ``kv_einsum/w [L,2,K,D,H]`` ↔ ``k_proj``/``v_proj``;
  ``attn_vec_einsum/w [L,N,H,D]`` ↔ ``o_proj.weight [D, N·H]``.
- gemma MLP: ``gating_einsum [L,2,D,F]`` ↔ ``gate_proj``/``up_proj``;
  ``linear [L,F,D]`` ↔ ``down_proj``.
- RMSNorm ``scale`` ↔ ``weight`` (both apply ``x · (1 + w)``); adaRMS norms have
  no ``weight``, only ``dense.{weight,bias}`` (cond → 3·dim, chunked
  scale/shift/gate in the same order on both sides).
- SigLIP: stacked ``encoderblock`` [L, …] ↔ ``encoder.layers.{i}``; patch conv
  kernel ``[h,w,in,out]`` ↔ ``[out,in,h,w]``; ``img/head`` ↔
  ``multi_modal_projector.linear``.
- ``lm_head`` is tied to the embedder in HF and dropped by
  ``safetensors.torch.save_model``; ignored on load, omitted on save.

JAX arrays stay in the stacked-scan layout ``params[layer, …]`` used by the
models here; torch keys are per-layer. bfloat16 crosses the boundary via torch
(numpy has no native bf16); values are preserved exactly.
"""

from __future__ import annotations

from collections.abc import Mapping
import dataclasses
import logging
import pathlib
import re
from typing import Callable

import numpy as np

from kai0_tpu.transforms import flatten_dict, unflatten_dict

logger = logging.getLogger("kai0_tpu")

_PG = "paligemma_with_expert.paligemma.model"
_EXPERT = "paligemma_with_expert.gemma_expert.model"
_VIT = f"{_PG}.vision_tower.vision_model"

# Historical HF module paths map onto the current canonical layout. The reference
# pins transformers 4.53 which already uses `paligemma.model.language_model`; the
# pre-4.52 layout (`paligemma.language_model.model`) is normalized for safety.
_LEGACY_PREFIXES = (
    (re.compile(r"^paligemma_with_expert\.paligemma\.language_model\.model\."), f"{_PG}.language_model."),
    (re.compile(r"^paligemma_with_expert\.paligemma\.vision_tower\."), f"{_PG}.vision_tower."),
    (re.compile(r"^paligemma_with_expert\.paligemma\.multi_modal_projector\."), f"{_PG}.multi_modal_projector."),
    (re.compile(r"^paligemma_with_expert\.gemma_expert\.model\.model\."), f"{_EXPERT}."),
)


@dataclasses.dataclass(frozen=True)
class _Site:
    """One JAX leaf ↔ one or more torch tensors (len(torch_keys) == len(fwd output))."""

    jax_path: str
    torch_keys: tuple[str, ...]
    fwd: Callable[[np.ndarray], list[np.ndarray]]  # jax value -> torch tensors
    inv: Callable[[list[np.ndarray]], np.ndarray]  # torch tensors -> jax value


def _linear_site(jax_prefix: str, torch_prefix: str) -> list[_Site]:
    return [
        _Site(
            f"{jax_prefix}/kernel",
            (f"{torch_prefix}.weight",),
            lambda w: [np.transpose(w)],
            lambda ts: np.transpose(ts[0]),
        ),
        _Site(
            f"{jax_prefix}/bias",
            (f"{torch_prefix}.bias",),
            lambda b: [b],
            lambda ts: ts[0],
        ),
    ]


def _gemma_sites(cfg, *, torch_root: str, jax_suffix: str, adarms: bool, depth: int) -> list[_Site]:
    """Sites for one gemma expert. ``jax_suffix`` is '' (VLM) or '_1' (action expert)."""
    n, k, h, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.width
    if k >= n:
        raise NotImplementedError("expected GQA layout (num_kv_heads < num_heads) with kv_einsum")
    sfx = jax_suffix
    llm = "PaliGemma/llm"
    layers = [f"{torch_root}.layers.{i}" for i in range(depth)]
    sites: list[_Site] = []

    def per_layer(jax_path, torch_tail, fwd_one, inv_one):
        sites.append(
            _Site(
                jax_path,
                tuple(f"{layer}.{torch_tail}" for layer in layers),
                lambda w, f=fwd_one: [f(w[i]) for i in range(w.shape[0])],
                lambda ts, g=inv_one: np.stack([g(t) for t in ts]),
            )
        )

    per_layer(
        f"{llm}/layers/attn/q_einsum{sfx}/w",
        "self_attn.q_proj.weight",
        lambda w: w.transpose(0, 2, 1).reshape(n * h, d),
        lambda t: t.reshape(n, h, d).transpose(0, 2, 1),
    )
    # kv_einsum packs K then V along its leading axis.
    sites.append(
        _Site(
            f"{llm}/layers/attn/kv_einsum{sfx}/w",
            tuple(
                f"{layer}.self_attn.{p}_proj.weight" for layer in layers for p in ("k", "v")
            ),
            lambda w: [
                w[i, kv].transpose(0, 2, 1).reshape(k * h, d)
                for i in range(w.shape[0])
                for kv in (0, 1)
            ],
            lambda ts: np.stack(
                [
                    np.stack([t.reshape(k, h, d).transpose(0, 2, 1) for t in ts[2 * i : 2 * i + 2]])
                    for i in range(len(ts) // 2)
                ]
            ),
        )
    )
    per_layer(
        f"{llm}/layers/attn/attn_vec_einsum{sfx}/w",
        "self_attn.o_proj.weight",
        lambda w: np.transpose(w.reshape(n * h, d)),
        lambda t: np.transpose(t).reshape(n, h, d),
    )
    sites.append(
        _Site(
            f"{llm}/layers/mlp{sfx}/gating_einsum",
            tuple(f"{layer}.mlp.{p}_proj.weight" for layer in layers for p in ("gate", "up")),
            lambda w: [np.transpose(w[i, g]) for i in range(w.shape[0]) for g in (0, 1)],
            lambda ts: np.stack(
                [np.stack([np.transpose(t) for t in ts[2 * i : 2 * i + 2]]) for i in range(len(ts) // 2)]
            ),
        )
    )
    per_layer(
        f"{llm}/layers/mlp{sfx}/linear",
        "mlp.down_proj.weight",
        np.transpose,
        np.transpose,
    )

    norm_pairs = (
        (f"{llm}/layers/pre_attention_norm{sfx}", "input_layernorm", True),
        (f"{llm}/layers/pre_ffw_norm{sfx}", "post_attention_layernorm", True),
        (f"{llm}/final_norm{sfx}", f"{torch_root}.norm", False),
    )
    for jax_norm, torch_norm, stacked in norm_pairs:
        torch_at = (
            tuple(f"{layer}.{torch_norm}" for layer in layers) if stacked else (torch_norm,)
        )
        if adarms:
            sites.append(
                _Site(
                    f"{jax_norm}/Dense_0/kernel",
                    tuple(f"{t}.dense.weight" for t in torch_at),
                    (lambda w: [np.transpose(w[i]) for i in range(w.shape[0])])
                    if stacked
                    else (lambda w: [np.transpose(w)]),
                    (lambda ts: np.stack([np.transpose(t) for t in ts]))
                    if stacked
                    else (lambda ts: np.transpose(ts[0])),
                )
            )
            sites.append(
                _Site(
                    f"{jax_norm}/Dense_0/bias",
                    tuple(f"{t}.dense.bias" for t in torch_at),
                    (lambda b: list(b)) if stacked else (lambda b: [b]),
                    (lambda ts: np.stack(ts)) if stacked else (lambda ts: ts[0]),
                )
            )
        else:
            sites.append(
                _Site(
                    f"{jax_norm}/scale",
                    tuple(f"{t}.weight" for t in torch_at),
                    (lambda s: list(s)) if stacked else (lambda s: [s]),
                    (lambda ts: np.stack(ts)) if stacked else (lambda ts: ts[0]),
                )
            )
    return sites


def _vit_sites(vit_cfg) -> list[_Site]:
    n = vit_cfg.num_heads
    depth = vit_cfg.depth
    img = "PaliGemma/img"
    layers = [f"{_VIT}.encoder.layers.{i}" for i in range(depth)]
    sites: list[_Site] = [
        _Site(
            f"{img}/embedding/kernel",
            (f"{_VIT}.embeddings.patch_embedding.weight",),
            lambda w: [w.transpose(3, 2, 0, 1)],
            lambda ts: ts[0].transpose(2, 3, 1, 0),
        ),
        _Site(
            f"{img}/embedding/bias",
            (f"{_VIT}.embeddings.patch_embedding.bias",),
            lambda b: [b],
            lambda ts: ts[0],
        ),
        _Site(
            f"{img}/pos_embedding",
            (f"{_VIT}.embeddings.position_embedding.weight",),
            lambda p: [p[0]],
            lambda ts: ts[0][None],
        ),
        _Site(
            f"{img}/Transformer/encoder_norm/scale",
            (f"{_VIT}.post_layernorm.weight",),
            lambda s: [s],
            lambda ts: ts[0],
        ),
        _Site(
            f"{img}/Transformer/encoder_norm/bias",
            (f"{_VIT}.post_layernorm.bias",),
            lambda b: [b],
            lambda ts: ts[0],
        ),
    ]
    sites += _linear_site(f"{img}/head", f"{_PG}.multi_modal_projector.linear")

    block = f"{img}/Transformer/encoderblock"

    def per_layer(jax_tail, torch_tail, fwd_one, inv_one):
        sites.append(
            _Site(
                f"{block}/{jax_tail}",
                tuple(f"{layer}.{torch_tail}" for layer in layers),
                lambda w, f=fwd_one: [f(w[i]) for i in range(w.shape[0])],
                lambda ts, g=inv_one: np.stack([g(t) for t in ts]),
            )
        )

    for ln_jax, ln_torch in (("LayerNorm_0", "layer_norm1"), ("LayerNorm_1", "layer_norm2")):
        per_layer(f"{ln_jax}/scale", f"{ln_torch}.weight", lambda s: s, lambda t: t)
        per_layer(f"{ln_jax}/bias", f"{ln_torch}.bias", lambda b: b, lambda t: t)
    mha = "MultiHeadDotProductAttention_0"
    for proj in ("query", "key", "value"):
        per_layer(
            f"{mha}/{proj}/kernel",
            f"self_attn.{proj[0]}_proj.weight",
            lambda w: w.transpose(1, 2, 0).reshape(-1, w.shape[0]),
            lambda t, nn=n: t.reshape(nn, -1, t.shape[-1]).transpose(2, 0, 1),
        )
        per_layer(
            f"{mha}/{proj}/bias",
            f"self_attn.{proj[0]}_proj.bias",
            lambda b: b.reshape(-1),
            lambda t, nn=n: t.reshape(nn, -1),
        )
    per_layer(
        f"{mha}/out/kernel",
        "self_attn.out_proj.weight",
        lambda w: np.transpose(w.reshape(-1, w.shape[-1])),
        lambda t, nn=n: np.transpose(t).reshape(nn, -1, t.shape[0]),
    )
    per_layer(f"{mha}/out/bias", "self_attn.out_proj.bias", lambda b: b, lambda t: t)
    for dense, fc in (("Dense_0", "fc1"), ("Dense_1", "fc2")):
        per_layer(f"MlpBlock_0/{dense}/kernel", f"mlp.{fc}.weight", np.transpose, np.transpose)
        per_layer(f"MlpBlock_0/{dense}/bias", f"mlp.{fc}.bias", lambda b: b, lambda t: t)
    return sites


def build_sites(config) -> list[_Site]:
    """The full conversion table for a ``Pi0Config``-like config.

    ``config`` needs: paligemma_config / action_expert_config (gemma Configs),
    vision_config (siglip Config), pi05, use_adarms; value-head sites are added
    when the config class name marks it an AdvantageEstimator.
    """
    vlm, expert = config.paligemma_config, config.action_expert_config
    adarms = config.use_adarms
    sites: list[_Site] = [
        _Site(
            "PaliGemma/llm/embedder/input_embedding",
            (f"{_PG}.language_model.embed_tokens.weight",),
            lambda w: [w],
            lambda ts: ts[0],
        )
    ]
    sites += _gemma_sites(
        vlm, torch_root=f"{_PG}.language_model", jax_suffix="", adarms=adarms[0], depth=vlm.depth
    )
    sites += _gemma_sites(
        expert, torch_root=_EXPERT, jax_suffix="_1", adarms=adarms[1], depth=expert.depth
    )
    sites += _vit_sites(config.vision_config)

    sites += _linear_site("action_in_proj", "action_in_proj")
    sites += _linear_site("action_out_proj", "action_out_proj")
    if config.pi05:
        proj_names = ("time_mlp_in", "time_mlp_out")
    else:
        proj_names = ("state_proj", "action_time_mlp_in", "action_time_mlp_out")
    for name in proj_names:
        sites += _linear_site(name, name)
    if "Advantage" in type(config).__name__:
        for i, torch_idx in enumerate((0, 2, 4)):
            sites += _linear_site(f"value_head/Dense_{i}", f"value_head.{torch_idx}")
    return sites


def _normalize_torch_key(key: str) -> str:
    for rx, repl in _LEGACY_PREFIXES:
        key = rx.sub(repl, key)
    return key


def jax_to_torch_state(params: dict, config) -> dict[str, np.ndarray]:
    """Flat torch state dict (numpy values, torch [out,in] conventions) from a JAX tree."""
    flat = flatten_dict(params)
    if any("lora" in k for k in flat):
        raise ValueError("merge LoRA factors before exporting to the torch layout")
    state: dict[str, np.ndarray] = {}
    for site in build_sites(config):
        if site.jax_path not in flat:
            raise KeyError(f"JAX params missing {site.jax_path}")
        values = site.fwd(np.asarray(flat.pop(site.jax_path)))
        if len(values) != len(site.torch_keys):
            raise AssertionError(f"site {site.jax_path}: {len(values)} != {len(site.torch_keys)}")
        state.update(zip(site.torch_keys, values, strict=True))
    if flat:
        raise ValueError(f"unmapped JAX params: {sorted(flat)[:8]}")
    return state


def torch_state_to_jax(state: Mapping[str, np.ndarray], config, *, strict: bool = True) -> dict:
    """JAX param tree (openpi layout, stacked scan axes) from a torch state dict."""
    pool = {_normalize_torch_key(k): np.asarray(v) for k, v in state.items()}
    # lm_head weights are tied to the embedder on the torch side; not part of the
    # JAX layout (flow-matching heads never use them).
    for key in [k for k in pool if ".lm_head." in k or k.endswith("lm_head.weight")]:
        pool.pop(key)
    flat: dict[str, np.ndarray] = {}
    for site in build_sites(config):
        try:
            tensors = [pool.pop(k) for k in site.torch_keys]
        except KeyError as e:
            raise KeyError(f"torch checkpoint missing {e.args[0]} (for {site.jax_path})") from None
        flat[site.jax_path] = site.inv(tensors)
    if pool:
        msg = f"unmapped torch keys: {sorted(pool)[:8]} (+{max(len(pool) - 8, 0)} more)"
        if strict:
            raise ValueError(msg)
        logger.warning(msg)
    return unflatten_dict(flat)


def is_torch_checkpoint(ckpt_dir) -> bool:
    """Reference detection rule: a torch checkpoint ships ``model.safetensors``."""
    return (pathlib.Path(ckpt_dir) / "model.safetensors").exists()


def _to_torch_tensor(x: np.ndarray):
    import torch

    if x.dtype.name == "bfloat16":  # ml_dtypes bf16 -> exact round-trip via f32
        return torch.from_numpy(np.ascontiguousarray(x.astype(np.float32))).to(torch.bfloat16)
    return torch.from_numpy(np.ascontiguousarray(x))


def _from_torch_tensor(t) -> np.ndarray:
    import ml_dtypes
    import torch

    if t.dtype == torch.bfloat16:
        return t.to(torch.float32).numpy().astype(ml_dtypes.bfloat16)
    return t.numpy()


def save_torch_checkpoint(params: dict, config, ckpt_dir) -> pathlib.Path:
    """Write ``<ckpt_dir>/model.safetensors`` in the reference's torch layout."""
    import safetensors.torch

    ckpt_dir = pathlib.Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    tensors = {k: _to_torch_tensor(v) for k, v in jax_to_torch_state(params, config).items()}
    path = ckpt_dir / "model.safetensors"
    safetensors.torch.save_file(tensors, str(path))
    return path


def load_torch_checkpoint(ckpt_dir, config, *, dtype=None, strict: bool = True) -> dict:
    """Load ``model.safetensors`` (a file or its directory) into a JAX param tree.

    ``dtype``: optional jax dtype to cast every leaf to (serving uses bfloat16,
    matching reference policy_config.py:57 restore semantics).
    """
    import safetensors.torch

    path = pathlib.Path(ckpt_dir)
    if path.is_dir():
        path = path / "model.safetensors"
    tensors = safetensors.torch.load_file(str(path))
    state = {k: _from_torch_tensor(v) for k, v in tensors.items()}
    params = torch_state_to_jax(state, config, strict=strict)
    if dtype is not None:
        import jax.numpy as jnp

        params = unflatten_dict({k: jnp.asarray(v, dtype) for k, v in flatten_dict(params).items()})
    return params
