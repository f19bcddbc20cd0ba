"""Model/ops tuning knobs: one typed registry, one env-resolution site.

Every performance knob the model/ops code consults lives here (VERDICT round-2
item: ``grep os.environ kai0_tpu/models kai0_tpu/ops`` must hit only the single
config-resolution site — this module). Precedence, highest first:

1. **Environment variable** (the CLI layer: ``KAI0_*=... python scripts/...``)
2. **TrainConfig.knobs** (the config layer: ``--knobs.int8_ffn=split`` via the
   dataclass CLI) — installed by ``TrainConfig.apply_model_knobs()`` →
   :func:`configure`.
3. **Built-in default** (the measured-best configuration; see PERF.md).

``get()`` resolves lazily at each (trace-time) call so tests can flip knobs
with ``monkeypatch.setenv``; entry points call ``as_dict()`` once after
configuring and record the effective values into run metadata / checkpoint
metadata / the bench JSON, so a trained artifact states the knobs it ran with.

docs/knobs.md documents each knob; PERF.md records its measurements.
"""

from __future__ import annotations

import dataclasses
import os


def _parse_bool(raw: str) -> bool:
    return raw.lower() not in ("0", "false", "off", "no", "")


@dataclasses.dataclass(frozen=True)
class Knobs:
    """Override set: ``None`` = not overridden (fall through to env/default).

    Field names double as the public config surface (``TrainConfig.knobs``);
    the env name for field ``x`` is ``_ENV[x]``.
    """

    # --- remat policy (models/gemma.py:_remat_policy has the mode list) ---
    remat: str | None = None
    remat_vit: str | None = None
    # --- SigLIP / ViT ---
    vit_qkv: str | None = None  # headmajor | flat
    vit_conv: str | None = None  # conv | im2col
    vit_mlp2d: bool | None = None
    siglip_attn: str | None = None  # kernel | einsum
    siglip_block_t_bwd: int | None = None  # 0 = auto (min(T, 64))
    # --- flash MQA kernel ---
    flash_block_t: int | None = None
    flash_block_t_bwd: int | None = None  # 0 = same as flash_block_t
    # --- int8 quantized base ---
    int8_bwd: bool | None = None
    int8_pallas: bool | None = None
    int8_pallas_ffn: bool | None = None  # LoRA-epilogue kernel inside the fused FFN
    int8_rowquant: str | None = None  # xla | pallas
    int8_chunk_mb: int | None = None
    int8_unroll: bool | None = None
    int8_unroll_barrier: bool | None = None
    int8_weight_only: bool | None = None
    int8_splitdot: bool | None = None
    int8_ffn: str | None = None  # fused | split
    int8_switchback: str | None = None  # 0 | 1 | all | site list
    int8_sb_gemma: str | None = None  # 0 | 1 | all | attn,ffn (full-FT trainable gemma)
    q8_pallas: bool | None = None  # fused Pallas kernel for the q8 AdamW phase
    int8_sites: str | None = None  # None = per-call default
    int8_siglip: str | None = None  # 0 | all | site list
    # --- tokenizer assets ---
    paligemma_tokenizer: str | None = None  # path to sentencepiece model
    sp_backend: str | None = None  # auto | sentencepiece | pure
    allow_hub: bool | None = None


_ENV = {
    "remat": "KAI0_REMAT",
    "remat_vit": "KAI0_REMAT_VIT",
    "vit_qkv": "KAI0_VIT_QKV",
    "vit_conv": "KAI0_VIT_CONV",
    "vit_mlp2d": "KAI0_VIT_MLP2D",
    "siglip_attn": "KAI0_SIGLIP_ATTN",
    "siglip_block_t_bwd": "KAI0_SIGLIP_BLOCK_T_BWD",
    "flash_block_t": "KAI0_FLASH_BLOCK_T",
    "flash_block_t_bwd": "KAI0_FLASH_BLOCK_T_BWD",
    "int8_bwd": "KAI0_INT8_BWD",
    "int8_pallas": "KAI0_INT8_PALLAS",
    "int8_pallas_ffn": "KAI0_INT8_PALLAS_FFN",
    "int8_rowquant": "KAI0_INT8_ROWQUANT",
    "int8_chunk_mb": "KAI0_INT8_CHUNK_MB",
    "int8_unroll": "KAI0_INT8_UNROLL",
    "int8_unroll_barrier": "KAI0_INT8_UNROLL_BARRIER",
    "int8_weight_only": "KAI0_INT8_WO",
    "int8_splitdot": "KAI0_INT8_SPLITDOT",
    "int8_ffn": "KAI0_INT8_FFN",
    "int8_switchback": "KAI0_INT8_SB",
    "int8_sb_gemma": "KAI0_INT8_SB_GEMMA",
    "q8_pallas": "KAI0_Q8_PALLAS",
    "int8_sites": "KAI0_INT8_SITES",
    "int8_siglip": "KAI0_INT8_SIGLIP",
    "paligemma_tokenizer": "KAI0_PALIGEMMA_TOKENIZER",
    "sp_backend": "KAI0_SP_BACKEND",
    "allow_hub": "KAI0_ALLOW_HUB",
}

_DEFAULTS = {
    "remat": "nothing",
    "remat_vit": None,  # None → follow `remat`
    "vit_qkv": "headmajor",
    "vit_conv": "conv",
    "vit_mlp2d": False,
    "siglip_attn": "kernel",
    "siglip_block_t_bwd": 0,
    "flash_block_t": 64,
    "flash_block_t_bwd": 0,
    "int8_bwd": True,
    "int8_pallas": False,
    "int8_pallas_ffn": False,
    "int8_rowquant": "xla",
    "int8_chunk_mb": 288,
    "int8_unroll": False,
    "int8_unroll_barrier": False,
    "int8_weight_only": False,
    "int8_splitdot": True,
    "int8_ffn": "fused",
    "int8_switchback": "0",
    "int8_sb_gemma": "0",
    "q8_pallas": True,
    "int8_sites": None,
    "int8_siglip": "0",
    "paligemma_tokenizer": None,
    "sp_backend": "auto",
    "allow_hub": False,
}

_configured: Knobs | None = None


def configure(overrides: Knobs | None) -> None:
    """Install config-layer overrides (``TrainConfig.apply_model_knobs``)."""
    global _configured
    _configured = overrides


def _coerce(field: str, raw: str):
    default = _DEFAULTS[field]
    if isinstance(default, bool):
        return _parse_bool(raw)
    if isinstance(default, int):
        return int(raw)
    return raw


def get() -> Knobs:
    """The effective knob set: env > configured overrides > defaults.

    THE single ``os.environ`` read site for model/ops knobs. Resolved lazily at
    call (trace) time — note a jit cache entry reflects the values at its trace;
    entry points should resolve/record once up front (``as_dict``).

    An EMPTY env value means *unset* (falls through to config/default) — so
    ``KAI0_INT8_BWD= python …`` does NOT disable a default-true knob; write
    ``KAI0_INT8_BWD=0``. This is uniform across knob types and documented in
    docs/knobs.md (it differs from pre-registry rounds, where '' parsed false).
    """
    values = {}
    for field, env in _ENV.items():
        raw = os.environ.get(env)
        if raw is not None and raw != "":
            values[field] = _coerce(field, raw)
            continue
        if _configured is not None:
            conf = getattr(_configured, field)
            if conf is not None:
                values[field] = conf
                continue
        values[field] = _DEFAULTS[field]
    return Knobs(**values)


def as_dict(*, full: bool = False) -> dict:
    """Effective knob mapping for metadata. ``full=False`` → non-default only."""
    resolved = dataclasses.asdict(get())
    if full:
        return resolved
    return {k: v for k, v in resolved.items() if v != _DEFAULTS[k]}


def under_pytest() -> bool:
    """True inside a pytest run (used to mute fallback-codec warnings in tests)."""
    return "PYTEST_CURRENT_TEST" in os.environ


def env_flag(name: str, default: str = "0") -> bool:
    """Boolean env parsing for ad-hoc CLI-layer flags (NOT model knobs):
    '0'/'false'/'off'/'no'/'' are false — shell idioms like FLAG=False must not
    enable."""
    return _parse_bool(os.environ.get(name, default))
