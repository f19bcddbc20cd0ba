"""Int8 frozen-base quantization (kai0_tpu/ops/quant.py).

The reference has no quantization path (its LoRA keeps the frozen base in bf16,
src/openpi/models/lora.py); this is a TPU-native addition, so the spec here is
numerical: per-matmul int8 error bounds, gradient agreement with the bf16 path, and
checkpoint-layout invariance (save -> resume must round-trip losslessly).
"""

import dataclasses
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kai0_tpu.ops import quant

EQN_CASES = [
    ("BSD,3KDH->3BSKH", (2, 7, 32), (3, 4, 32, 8)),
    ("BTD,NDH->BTNH", (2, 7, 32), (4, 32, 8)),
    ("BSD,2KDH->2BSKH", (2, 7, 32), (2, 4, 32, 8)),
    ("BTNH,NHD->BTD", (2, 7, 4, 8), (4, 8, 32)),
    ("BTD,2DF->2BTF", (2, 7, 32), (2, 32, 64)),
    ("BTF,FD->BTD", (2, 7, 64), (64, 32)),
]


def _einsum_ref(eqn, x, w):
    # digits are valid labels for our layout parser but not for jnp.einsum
    trans = str.maketrans({"3": "x", "2": "y"})
    return jnp.einsum(eqn.translate(trans), x, w.astype(x.dtype))


@pytest.mark.parametrize("eqn,x_shape,w_shape", EQN_CASES)
def test_apply_quant_einsum_matches_bf16(eqn, x_shape, w_shape):
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), x_shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 2), w_shape, jnp.bfloat16)
    qa = quant.quantize_einsum_weight(w, eqn)
    ref = _einsum_ref(eqn, x, w)
    got = quant.apply_quant_einsum(qa, eqn, x)
    assert got.shape == ref.shape
    assert got.dtype == ref.dtype
    rel = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))) / jnp.max(
        jnp.abs(ref.astype(jnp.float32))
    )
    assert float(rel) < 0.03


@pytest.mark.parametrize("eqn,x_shape,w_shape", EQN_CASES)
def test_weight_only_matches_dequantized_einsum(eqn, x_shape, w_shape, monkeypatch):
    """KAI0_INT8_WO=1: y = x @ dequantize(w) with NO activation rounding.

    In f32 the weight-only path is the einsum against the exactly dequantized
    weight up to reduction order — far tighter than the dynamic-activation
    path's 3% budget (its activations are rounded to 8 bits per row).
    """
    key = jax.random.key(11)
    x = jax.random.normal(jax.random.fold_in(key, 1), x_shape, jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 2), w_shape, jnp.float32)
    qa = quant.quantize_einsum_weight(w, eqn)
    ref = _einsum_ref(eqn, x, quant.dequantize(qa))
    monkeypatch.setenv("KAI0_INT8_WO", "1")
    jax.clear_caches()
    got = quant.apply_quant_einsum(qa, eqn, x)
    if eqn.split(",")[1][0].isdigit():
        parts = quant.apply_quant_split(qa, x)
        for i, part in enumerate(parts):
            np.testing.assert_allclose(np.asarray(part), np.asarray(got[i]), rtol=1e-5, atol=1e-5)
    monkeypatch.delenv("KAI0_INT8_WO")
    jax.clear_caches()
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_weight_only_bf16_tracks_dequantized(monkeypatch):
    """bf16 weight-only stays within accumulated weight-rounding noise of the
    bf16-dequantized einsum (the two round w = q*s at different points)."""
    eqn, x_shape, w_shape = EQN_CASES[0]
    key = jax.random.key(12)
    x = jax.random.normal(jax.random.fold_in(key, 1), x_shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 2), w_shape, jnp.bfloat16)
    qa = quant.quantize_einsum_weight(w, eqn)
    ref = _einsum_ref(eqn, x, quant.dequantize(qa))
    monkeypatch.setenv("KAI0_INT8_WO", "1")
    jax.clear_caches()
    got = quant.apply_quant_einsum(qa, eqn, x)
    monkeypatch.delenv("KAI0_INT8_WO")
    jax.clear_caches()
    rel = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))) / jnp.max(
        jnp.abs(ref.astype(jnp.float32))
    )
    assert float(rel) < 0.02


@pytest.mark.parametrize(
    "eqn,x_shape,w_shape",
    [case for case in EQN_CASES if case[0].split(",")[1][0].isdigit()],
)
def test_apply_quant_split_matches_einsum(eqn, x_shape, w_shape):
    key = jax.random.key(7)
    x = jax.random.normal(jax.random.fold_in(key, 1), x_shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 2), w_shape, jnp.bfloat16)
    qa = quant.quantize_einsum_weight(w, eqn)
    fused = quant.apply_quant_einsum(qa, eqn, x)
    parts = quant.apply_quant_split(qa, x)
    assert len(parts) == w_shape[0]
    for i, part in enumerate(parts):
        np.testing.assert_array_equal(np.asarray(part), np.asarray(fused[i]))


@pytest.mark.parametrize("eqn,x_shape,w_shape", EQN_CASES)
def test_dequantize_roundtrip_and_idempotence(eqn, x_shape, w_shape):
    w = jax.random.normal(jax.random.key(3), w_shape, jnp.bfloat16)
    qa = quant.quantize_einsum_weight(w, eqn)
    wd = quant.dequantize(qa)
    assert wd.shape == w.shape
    assert wd.dtype == w.dtype
    # int8 per-channel error bound: amax/127 per output channel <= global amax/127
    err = jnp.max(jnp.abs(wd.astype(jnp.float32) - w.astype(jnp.float32)))
    bound = jnp.max(jnp.abs(w.astype(jnp.float32))) / 127.0
    assert float(err) <= float(bound) * 1.01
    # quantize(dequantize(.)) is exact: the max-magnitude element pins the scale
    qa2 = quant.quantize_einsum_weight(wd, eqn)
    np.testing.assert_array_equal(np.asarray(qa2.q), np.asarray(qa.q))
    np.testing.assert_allclose(np.asarray(qa2.s), np.asarray(qa.s), rtol=1e-6)


def test_stacked_quantize_dequantize():
    w = jax.random.normal(jax.random.key(4), (3, 3, 4, 32, 8), jnp.bfloat16)
    qa = quant.quantize_einsum_weight(w, "BSD,3KDH->3BSKH", stacked=True)
    assert qa.q.shape == (3, 32, 96)
    assert qa.s.shape == (3, 96)
    wd = quant.dequantize(qa)
    assert wd.shape == w.shape
    # per-layer scan slicing yields unstacked QuantArrays
    def body(carry, layer_qa):
        y = quant.apply_quant_einsum(layer_qa, "BSD,3KDH->3BSKH", carry)
        return carry, y
    x = jax.random.normal(jax.random.key(5), (2, 7, 32), jnp.bfloat16)
    _, ys = jax.lax.scan(body, x, qa)
    assert ys.shape == (3, 3, 2, 7, 4, 8)


@pytest.mark.parametrize("stacked", [False, True])
def test_sq_norm_matches_dequantized_norm(stacked):
    shape = (3, 2, 16, 24) if stacked else (2, 16, 24)
    w = jax.random.normal(jax.random.key(11), shape, jnp.float32)
    qa = quant.quantize_einsum_weight(w, "BTD,2DF->2BTF", stacked=stacked)
    got = float(jnp.sqrt(quant.sq_norm(qa)))
    want = float(jnp.linalg.norm(quant.dequantize(qa).astype(jnp.float32)))
    assert abs(got - want) / want < 1e-5


def test_env_flag_shell_idioms(monkeypatch):
    for v, expect in [("1", True), ("true", True), ("0", False), ("false", False),
                      ("False", False), ("off", False), ("no", False), ("", False)]:
        monkeypatch.setenv("KAI0_TEST_FLAG", v)
        assert quant.env_flag("KAI0_TEST_FLAG") is expect, v
    monkeypatch.delenv("KAI0_TEST_FLAG")
    assert quant.env_flag("KAI0_TEST_FLAG", "1") is True


def test_qmm_gradient_matches_bf16():
    key = jax.random.key(6)
    x = jax.random.normal(key, (64, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(7), (128, 256), jnp.float32)
    qa = quant.quantize_einsum_weight(w, "BTF,FD->BTD")

    def loss_q(x):
        y = quant.qmm(x, qa.q, qa.s)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(x):
        return jnp.sum(jnp.dot(x, w.astype(x.dtype)).astype(jnp.float32) ** 2)

    gq = jax.grad(loss_q)(x).astype(jnp.float32)
    gr = jax.grad(loss_ref)(x).astype(jnp.float32)
    cos = jnp.sum(gq * gr) / (jnp.linalg.norm(gq) * jnp.linalg.norm(gr))
    assert float(cos) > 0.999


def test_qmm_row_chunking_matches_unchunked(monkeypatch):
    """Forcing a tiny chunk budget must not change fwd or bwd results at all —
    chunking only serializes the rows (the 16 GB-chip OOM fix for the FFN sites)."""
    x = jax.random.normal(jax.random.key(8), (12, 32), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(9), (32, 64), jnp.float32)
    qa = quant.quantize_einsum_weight(w, "BTF,FD->BTD")

    def run():
        def loss(x):
            y = quant.qmm(x, qa.q, qa.s)
            return jnp.sum(y.astype(jnp.float32) ** 2), y

        (_, y), g = jax.value_and_grad(loss, has_aux=True)(x)
        return np.asarray(y), np.asarray(g.astype(jnp.float32))

    y_ref, g_ref = run()
    monkeypatch.setattr(quant, "_CHUNK_BYTES", 64 * 4)  # [m/c, width] caps at one row
    assert quant._row_chunks(12, 64) > 1
    y_chunked, g_chunked = run()
    np.testing.assert_array_equal(y_chunked, y_ref)
    np.testing.assert_array_equal(g_chunked, g_ref)


def test_quantized_inference_sampling_close_to_bf16():
    """Serve-path int8 (quantize_inference_tree): sample_actions stays close to the
    bf16 actions — weight-only inference quantization, opt-in via --int8."""
    from kai0_tpu.models import pi0 as _pi0

    config = _pi0.Pi0Config(
        pi05=True, paligemma_variant="dummy", action_expert_variant="dummy", vision_variant="mu/14"
    )
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        config.init_params(jax.random.key(0)),
    )
    obs = config.fake_obs(1)
    rng = jax.random.key(1)
    ref = config.sample_actions(params, rng, obs, num_steps=2)
    qparams = quant.quantize_inference_tree(params)
    assert quant.has_quant(qparams)
    got = config.sample_actions(qparams, rng, obs, num_steps=2)
    assert got.shape == ref.shape
    r = np.asarray(ref, np.float32).ravel()
    g = np.asarray(got, np.float32).ravel()
    cos = np.dot(r, g) / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-9)
    assert np.isfinite(g).all()
    assert cos > 0.99


def test_quantize_inference_tree_covers_siglip_sites(monkeypatch):
    """Under KAI0_INT8_SIGLIP the (inference-frozen) SigLIP tower quantizes too —
    off by default because it measured slower at serve shapes on v5e (PERF.md).
    Exercises quantize_frozen_tree with the explicit SigLIP site list, then the
    documented env path via quantize_inference_tree + KAI0_INT8_SIGLIP=all; the
    tower output must stay close to bf16."""
    from kai0_tpu.models import siglip as _siglip
    from kai0_tpu.transforms import flatten_dict

    config = _siglip.get_config(num_classes=24, variant="mu/14", dtype_mm="bfloat16")
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        _siglip.init(jax.random.key(3), config, (28, 28)),
    )
    # zero-init head would make the output trivially zero — give it real weights
    params["head"]["kernel"] = 0.02 * jax.random.normal(jax.random.key(4), params["head"]["kernel"].shape, jnp.bfloat16)
    image = jax.random.uniform(jax.random.key(5), (2, 28, 28, 3), jnp.float32, -1, 1)
    ref = _siglip.apply(params, config, image)

    qtree = quant.quantize_frozen_tree(
        {"img": params}, {"img": jax.tree.map(lambda _: False, params)}, sites=quant._SIGLIP_QUANT_SITES
    )["img"]
    flat = flatten_dict({"img": qtree})
    quant_keys = [k for k, v in flat.items() if quant.is_quant(v)]
    assert any("query/kernel" in k for k in quant_keys)
    assert any("out/kernel" in k for k in quant_keys)
    assert any("Dense_0" in k and "Dense_1" not in k for k in quant_keys)
    assert any("head/kernel" in k for k in quant_keys)
    assert not any("bias" in k or "embedding" in k or "LayerNorm" in k for k in quant_keys)
    # encoderblock weights keep the leading depth axis; head is unstacked
    qk = next(v for k, v in flat.items() if "query/kernel" in k)
    assert qk.q.ndim == 3
    hk = next(v for k, v in flat.items() if "head/kernel" in k)
    assert hk.q.ndim == 2

    got = _siglip.apply(qtree, config, image)
    r = np.asarray(ref, np.float32).ravel()
    g = np.asarray(got, np.float32).ravel()
    assert np.isfinite(g).all()
    cos = np.dot(r, g) / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-9)
    assert cos > 0.99

    # dequantize restores the exact checkpoint layout
    deq = quant.dequantize_tree(qtree)
    assert not quant.has_quant(deq)
    assert deq["head"]["kernel"].shape == params["head"]["kernel"].shape
    assert deq["head"]["kernel"].dtype == params["head"]["kernel"].dtype

    monkeypatch.setenv("KAI0_INT8_SIGLIP", "0")
    assert quant._siglip_inference_sites() == ()
    monkeypatch.setenv("KAI0_INT8_SIGLIP", "mlp, head")  # whitespace tolerated
    pats = [p.pattern for p, _, _ in quant._siglip_inference_sites()]
    assert all("Attention" not in p for p in pats) and len(pats) == 3
    # A typo'd token must fail loudly, not silently select nothing.
    monkeypatch.setenv("KAI0_INT8_SIGLIP", "atn")
    with pytest.raises(ValueError, match="atn"):
        quant._siglip_inference_sites()
    monkeypatch.setenv("KAI0_INT8_SITES", "atn")
    with pytest.raises(ValueError, match="atn"):
        quant._active_sites()
    monkeypatch.delenv("KAI0_INT8_SITES")

    # The documented env path: quantize_inference_tree picks up KAI0_INT8_SIGLIP.
    monkeypatch.setenv("KAI0_INT8_SIGLIP", "all")
    env_tree = quant.quantize_inference_tree({"img": params})["img"]
    env_keys = [k for k, v in flatten_dict({"img": env_tree}).items() if quant.is_quant(v)]
    assert any("head/kernel" in k for k in env_keys)
    assert any("query/kernel" in k for k in env_keys)


def test_quantized_inference_pi0_fast_decodes():
    """π₀-FAST shares the gemma apply paths/param naming, so --int8 covers its
    autoregressive decode too (kv-cache prefill + while-loop decode)."""
    from kai0_tpu.models import pi0_fast as _pi0_fast

    config = _pi0_fast.Pi0FASTConfig(
        paligemma_variant="dummy",
        vision_variant="mu/14",
        dtype="float32",
        action_dim=4,
        action_horizon=8,
        max_token_len=48,
    )
    params = config.init_params(jax.random.key(0))
    qparams = quant.quantize_inference_tree(params)
    assert quant.has_quant(qparams)
    obs = config.fake_obs(1)
    tokens = config.sample_actions(qparams, jax.random.key(2), obs)
    ref = config.sample_actions(params, jax.random.key(2), obs)
    assert tokens.shape == ref.shape
    assert np.isfinite(np.asarray(tokens, np.float32)).all()


def _lora_debug_config(tmp_path, **overrides):
    from kai0_tpu.training import config as _config

    base = _config.get_config("debug")
    model = dataclasses.replace(
        base.model,
        paligemma_variant="dummy_lora",
        action_expert_variant="dummy_lora",
        dtype="bfloat16",
    )
    return dataclasses.replace(
        base,
        model=model,
        exp_name="quant_test",
        checkpoint_base_dir=str(tmp_path),
        **overrides,
    )


def test_quantized_train_loss_tracks_bf16(tmp_path):
    """First-step loss with the int8 base stays within a few percent of bf16."""
    from kai0_tpu.models import model as _model
    from kai0_tpu.parallel import sharding
    from kai0_tpu.training import train_lib

    losses = {}
    for quantize in (False, True):
        cfg = _lora_debug_config(tmp_path / f"q{quantize}", quantize_frozen=quantize)
        mesh = sharding.make_mesh(1)
        rng = jax.random.key(0)
        state, _, tx, mask = train_lib.init_train_state(cfg, rng, mesh, resume=False)
        obs = cfg.model.fake_obs(cfg.batch_size)
        actions = cfg.model.fake_act(cfg.batch_size)
        _, info = jax.jit(
            lambda s, b: train_lib.train_step(cfg, tx, mask, jax.random.key(1), s, b)
        )(state, (obs, actions))
        losses[quantize] = float(info["loss"])
    assert np.isfinite(losses[True])
    assert abs(losses[True] - losses[False]) / abs(losses[False]) < 0.05, losses


def test_quantized_train_save_resume(tmp_path):
    """Full loop: train int8 -> checkpoint is dequantized (openpi layout) -> resume."""
    from kai0_tpu.training import checkpoints as _checkpoints
    from kai0_tpu.training import train_lib

    cfg = _lora_debug_config(
        tmp_path,
        quantize_frozen=True,
        num_train_steps=3,
        batch_size=8,
        fsdp_devices=2,
        # force FSDP-sharding of the (small, test-size) int8 leaves too
        fsdp_min_size_mbytes=0,
    )
    state = train_lib.main(cfg)
    assert quant.has_quant(state.params)

    # the saved params item must have the plain (dequantized) layout
    step_dir = cfg.checkpoint_dir / "2" / "params"
    params = _checkpoints.restore_params(step_dir, restore_type=np.ndarray)
    assert not quant.has_quant(params)
    flat_keys = list(params.keys())
    assert "PaliGemma" in flat_keys or len(flat_keys) > 0

    resumed = train_lib.main(dataclasses.replace(cfg, resume=True, num_train_steps=4))
    assert int(resumed.step) == 4
    assert quant.has_quant(resumed.params)


def test_quantize_frozen_tree_skips_trainable_and_small():
    """Only frozen matmul-site leaves are converted; LoRA factors/norms untouched."""
    from kai0_tpu.training import config as _config

    cfg = _lora_debug_config(pathlib.Path("/tmp"), quantize_frozen=True)
    params_shape = jax.eval_shape(cfg.model.init_params, jax.random.key(0))
    mask = cfg.trainable_mask(params_shape)
    params = cfg.model.init_params(jax.random.key(0))
    qparams = quant.quantize_frozen_tree(params, mask)
    from kai0_tpu.transforms import flatten_dict

    flat = flatten_dict(qparams)
    quant_keys = [k for k, v in flat.items() if quant.is_quant(v)]
    assert any("qkv_einsum" in k or "q_einsum" in k for k in quant_keys)
    assert any("gating_einsum" in k for k in quant_keys)
    assert not any("lora" in k for k in quant_keys)
    assert not any("norm" in k for k in quant_keys)
    assert not any(k.startswith("img/") or "/img/" in k for k in quant_keys)


# ---------------------------------------------------------------------------
# SwitchBack dynamic int8 (trainable SigLIP matmuls, KAI0_INT8_SB=1)
# ---------------------------------------------------------------------------

# The six SigLIP trainable matmul sites (kai0_tpu/models/siglip.py).
SB_EQN_CASES = [
    ("btd,dnh->bnth", (2, 7, 32), (32, 4, 8)),  # q/k/v projection (head-major out)
    ("bnth,nhd->btd", (2, 4, 7, 8), (4, 8, 32)),  # out projection (contracted not trailing)
    ("btd,df->btf", (2, 7, 32), (32, 64)),  # MLP Dense_0
    ("btf,fd->btd", (2, 7, 64), (64, 32)),  # MLP Dense_1
    ("btd,dc->btc", (2, 7, 32), (32, 16)),  # head
]


@pytest.mark.parametrize("eqn,x_shape,w_shape", SB_EQN_CASES)
def test_switchback_einsum_matches_bf16(eqn, x_shape, w_shape):
    key = jax.random.key(13)
    x = jax.random.normal(jax.random.fold_in(key, 1), x_shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 2), w_shape, jnp.bfloat16)
    ref = jnp.einsum(eqn, x, w)
    got = quant.switchback_einsum(eqn, x, w)
    assert got.shape == ref.shape
    assert got.dtype == ref.dtype
    rel = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))) / jnp.max(
        jnp.abs(ref.astype(jnp.float32))
    )
    assert float(rel) < 0.05


@pytest.mark.parametrize("eqn,x_shape,w_shape", SB_EQN_CASES)
def test_switchback_grads_track_bf16(eqn, x_shape, w_shape):
    """dx (int8 dgrad, straight-through) and dw (bf16 wgrad) must agree with the
    bf16 einsum gradients in direction — SwitchBack's convergence-parity premise."""
    key = jax.random.key(17)
    x = jax.random.normal(jax.random.fold_in(key, 1), x_shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 2), w_shape, jnp.bfloat16)
    t = jax.random.normal(jax.random.fold_in(key, 3), jnp.einsum(eqn, x, w).shape, jnp.bfloat16)

    def loss(f):
        return lambda x, w: jnp.sum((f(x, w).astype(jnp.float32) - t.astype(jnp.float32)) ** 2)

    gx_q, gw_q = jax.grad(loss(lambda x, w: quant.switchback_einsum(eqn, x, w)), argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss(lambda x, w: jnp.einsum(eqn, x, w)), argnums=(0, 1))(x, w)
    assert gx_q.dtype == x.dtype and gw_q.dtype == w.dtype
    assert gw_q.shape == w.shape
    for gq, gr in ((gx_q, gx_r), (gw_q, gw_r)):
        a = np.asarray(gq, np.float32).ravel()
        b = np.asarray(gr, np.float32).ravel()
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.99, (eqn, cos)


def test_switchback_zero_weight_is_exact():
    """The SigLIP head kernel is zero-init: fwd must be exactly zero and grads
    finite (the scale clamp must not divide by zero)."""
    x = jax.random.normal(jax.random.key(19), (3, 5, 16), jnp.bfloat16)
    w = jnp.zeros((16, 8), jnp.bfloat16)
    y, vjp = jax.vjp(lambda x, w: quant.switchback_einsum("btd,dc->btc", x, w), x, w)
    np.testing.assert_array_equal(np.asarray(y, np.float32), 0.0)
    dx, dw = vjp(jnp.ones_like(y))
    assert np.isfinite(np.asarray(dx, np.float32)).all()
    assert np.isfinite(np.asarray(dw, np.float32)).all()
    # wgrad through a zero weight is the plain bf16 product — non-zero
    assert float(jnp.max(jnp.abs(dw.astype(jnp.float32)))) > 0


def test_siglip_switchback_close_to_bf16(monkeypatch):
    """KAI0_INT8_SB=1 routes every SigLIP matmul through SwitchBack; the encoded
    tokens and a backward pass must track the bf16 tower."""
    from kai0_tpu.models import siglip

    config = siglip.get_config(num_classes=24, variant="mu/14", dtype_mm="bfloat16")
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        siglip.init(jax.random.key(0), config, (28, 28)),
    )
    # non-zero head so the comparison exercises the head matmul too
    params["head"]["kernel"] = jax.random.normal(jax.random.key(1), params["head"]["kernel"].shape, jnp.bfloat16)
    image = jax.random.uniform(jax.random.key(2), (2, 28, 28, 3), jnp.float32, -1, 1)

    def loss(p):
        return jnp.sum(siglip.apply(p, config, image).astype(jnp.float32) ** 2)

    monkeypatch.setenv("KAI0_INT8_SB", "0")
    ref, gref = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("KAI0_INT8_SB", "1")
    got, ggot = jax.value_and_grad(loss)(params)
    assert abs(float(got) - float(ref)) / abs(float(ref)) < 0.05
    a = np.concatenate([np.asarray(x, np.float32).ravel() for x in jax.tree.leaves(ggot)])
    b = np.concatenate([np.asarray(x, np.float32).ravel() for x in jax.tree.leaves(gref)])
    assert np.isfinite(a).all()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.98, cos


# The gemma trainable matmul sites (KAI0_INT8_SB_GEMMA — the full-FT fast path).
# Digit labels are valid jnp.einsum subscripts (JAX extension); the stacked
# qkv/kv eqns rely on that.
SB_GEMMA_EQN_CASES = [
    ("BSD,3KDH->3BSKH", (2, 7, 32), (3, 4, 32, 8)),  # fused qkv (MHA experts)
    ("BTD,NDH->BTNH", (2, 7, 32), (4, 32, 8)),  # MQA q projection
    ("BSD,2KDH->2BSKH", (2, 7, 32), (2, 1, 32, 8)),  # MQA kv projection
    ("BTNH,NHD->BTD", (2, 7, 4, 8), (4, 8, 32)),  # out projection
    ("BTD,DF->BTF", (2, 7, 32), (32, 64)),  # FFN gate/up/down (rank-2 dot form)
]


@pytest.mark.parametrize("eqn,x_shape,w_shape", SB_GEMMA_EQN_CASES)
def test_switchback_gemma_eqns_match_bf16(eqn, x_shape, w_shape):
    key = jax.random.key(23)
    x = jax.random.normal(jax.random.fold_in(key, 1), x_shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 2), w_shape, jnp.bfloat16)
    ref = jnp.einsum(eqn, x, w)
    got = quant.switchback_einsum(eqn, x, w)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    rel = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))) / jnp.max(
        jnp.abs(ref.astype(jnp.float32))
    )
    assert float(rel) < 0.05


def test_gemma_switchback_full_ft_close_to_bf16(monkeypatch):
    """KAI0_INT8_SB_GEMMA=all routes the trainable gemma matmuls (attention
    einsums + gated FFN) through SwitchBack: loss and the full gradient tree —
    including the base weight grads the full fine-tune needs — must track bf16."""
    from kai0_tpu.models import gemma, lora

    cfg = gemma.get_config("dummy")  # no LoRA: every base weight trains
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16),
        gemma.init(jax.random.key(0), [cfg], [False]),
    )
    x = jax.random.normal(jax.random.key(1), (2, 9, cfg.width), jnp.bfloat16)

    def loss(p):
        ffn = lora.apply_ffn(p["layers"]["mlp"], x)
        q = lora.apply_einsum(p["layers"]["attn"]["q_einsum"], "BTD,NDH->BTNH", x, None)
        kv = lora.apply_einsum(p["layers"]["attn"]["kv_einsum"], "BSD,2KDH->2BSKH", x, None)
        return (
            jnp.sum(ffn.astype(jnp.float32) ** 2)
            + jnp.sum(q.astype(jnp.float32) ** 2)
            + jnp.sum(kv.astype(jnp.float32) ** 2)
        )

    # Single-layer slice of the stacked tree (apply paths run per-layer in scan).
    layer0 = jax.tree.map(lambda p: p[0], params)

    monkeypatch.setenv("KAI0_INT8_SB_GEMMA", "0")
    ref, gref = jax.value_and_grad(loss)(layer0)
    monkeypatch.setenv("KAI0_INT8_SB_GEMMA", "all")
    got, ggot = jax.value_and_grad(loss)(layer0)
    assert abs(float(got) - float(ref)) / abs(float(ref)) < 0.05
    a = np.concatenate([np.asarray(v, np.float32).ravel() for v in jax.tree.leaves(ggot)])
    b = np.concatenate([np.asarray(v, np.float32).ravel() for v in jax.tree.leaves(gref)])
    assert np.isfinite(a).all()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.98, cos


@pytest.mark.parametrize("chunked", [False, True])  # c=1 and the lax.scan backward
def test_sb_fused_ffn_matches_split_switchback(monkeypatch, chunked):
    """The fused full-FT FFN (sb_fused_ffn) must reproduce the per-dot SwitchBack
    path: near-identical forward (same int8 grid per row/column), gradients for
    x AND all three weights tight against jax.grad of the split path (same
    quantized recipe — association differences only), and loosely tracking the
    bf16 FFN (the convergence contract)."""
    if chunked:
        # Force c>1 so the lax.scan backward (f32 wgrad carries, chunked dx) runs.
        monkeypatch.setattr(quant, "_CHUNK_BYTES", 2**20)
        rows, d, f = 1024, 64, 512
    else:
        rows, d, f = 96, 64, 160
    key = jax.random.key(31)
    x = jax.random.normal(jax.random.fold_in(key, 0), (2, rows // 2, d), jnp.bfloat16)
    wg = jax.random.normal(jax.random.fold_in(key, 1), (d, f), jnp.bfloat16) * 0.1
    wu = jax.random.normal(jax.random.fold_in(key, 2), (d, f), jnp.bfloat16) * 0.1
    wd = jax.random.normal(jax.random.fold_in(key, 3), (f, d), jnp.bfloat16) * 0.1
    if chunked:
        assert quant._row_chunks(rows, f) > 1

    def split(x, wg, wu, wd):
        gate = quant.switchback_einsum("BTD,DF->BTF", x, wg)
        up = quant.switchback_einsum("BTD,DF->BTF", x, wu)
        return quant.switchback_einsum("BTD,DF->BTF", jax.nn.gelu(gate) * up, wd)

    def bf16(x, wg, wu, wd):
        act = jax.nn.gelu(jnp.einsum("btd,df->btf", x, wg)) * jnp.einsum("btd,df->btf", x, wu)
        return jnp.einsum("btf,fd->btd", act, wd)

    y_fused = quant.sb_fused_ffn(x, wg, wu, wd)
    y_split = split(x, wg, wu, wd)
    rel = jnp.max(jnp.abs(y_fused.astype(jnp.float32) - y_split.astype(jnp.float32))) / (
        jnp.max(jnp.abs(y_split.astype(jnp.float32))) + 1e-9
    )
    assert float(rel) < 2e-2, float(rel)  # same int8 grid; bf16 cast points may differ by ulps

    t = jax.random.normal(jax.random.fold_in(key, 4), y_split.shape, jnp.bfloat16)

    def loss(f):
        return lambda *a: jnp.sum((f(*a).astype(jnp.float32) - t.astype(jnp.float32)) ** 2)

    g_fused = jax.grad(loss(quant.sb_fused_ffn), argnums=(0, 1, 2, 3))(x, wg, wu, wd)
    # The per-dot SwitchBack path IS the contract: same quantized fwd/dgrad/wgrad
    # recipe, so the gradients must agree tightly (association/cast differences).
    g_split = jax.grad(loss(split), argnums=(0, 1, 2, 3))(x, wg, wu, wd)
    g_bf16 = jax.grad(loss(bf16), argnums=(0, 1, 2, 3))(x, wg, wu, wd)
    for gf, gs, gr in zip(g_fused, g_split, g_bf16, strict=True):
        assert gf.shape == gs.shape and gf.dtype == gs.dtype
        a = np.asarray(gf, np.float32).ravel()
        s = np.asarray(gs, np.float32).ravel()
        cos_split = np.dot(a, s) / (np.linalg.norm(a) * np.linalg.norm(s) + 1e-9)
        assert cos_split > 0.9995, cos_split
        b = np.asarray(gr, np.float32).ravel()
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.99, cos


def test_apply_ffn_routes_sb_fused(monkeypatch):
    """With KAI0_INT8_SB_GEMMA=ffn and the fused knob (default) the non-LoRA
    apply_ffn must take the fused op; KAI0_INT8_FFN=split must take per-dot
    SwitchBack — both close to each other."""
    from kai0_tpu.models import lora

    key = jax.random.key(37)
    params = {
        "gating_einsum": jax.random.normal(key, (2, 32, 80), jnp.bfloat16) * 0.1,
        "linear": jax.random.normal(jax.random.fold_in(key, 1), (80, 32), jnp.bfloat16) * 0.1,
    }
    x = jax.random.normal(jax.random.fold_in(key, 2), (2, 7, 32), jnp.bfloat16)
    monkeypatch.setenv("KAI0_INT8_SB_GEMMA", "ffn")
    called = []
    orig = quant.sb_fused_ffn
    monkeypatch.setattr(quant, "sb_fused_ffn", lambda *a: (called.append(1), orig(*a))[1])
    y_fused = lora.apply_ffn(params, x)
    assert called, "fused path not taken"
    monkeypatch.setenv("KAI0_INT8_FFN", "split")
    y_split = lora.apply_ffn(params, x)
    rel = jnp.max(jnp.abs(y_fused.astype(jnp.float32) - y_split.astype(jnp.float32))) / (
        jnp.max(jnp.abs(y_split.astype(jnp.float32))) + 1e-9
    )
    assert float(rel) < 2e-2, float(rel)


# ---------------------------------------------------------------------------
# Fused Pallas int8 matmul (kai0_tpu/ops/pallas_quant.py), interpret mode on CPU
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "m,k,n",
    [
        (300, 257, 130),  # exercises padding on every axis
        (64, 128, 128),  # single block
        (96, 2048, 512),  # multi-k-block accumulation
    ],
)
def test_pallas_int8_matmul_matches_xla(m, k, n):
    from jax.experimental.pallas import tpu as pltpu

    from kai0_tpu.ops import pallas_quant

    rng = np.random.default_rng(0)
    xq = jnp.array(rng.integers(-127, 128, (m, k)), jnp.int8)
    w = jnp.array(rng.integers(-127, 128, (k, n)), jnp.int8)
    sx = jnp.array(rng.random((m, 1), dtype=np.float32) * 0.1)
    sn = jnp.array(rng.random(n, dtype=np.float32) * 0.01)

    ref = (
        jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32).astype(jnp.float32)
        * sx
        * sn
    )
    with pltpu.force_tpu_interpret_mode():
        y = pallas_quant.int8_matmul(xq, w, sx, sn, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    # NT variant (the backward contraction): contract the trailing axis of both.
    gq = jnp.array(rng.integers(-127, 128, (m, n)), jnp.int8)
    ref_t = (
        jax.lax.dot_general(gq, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32).astype(jnp.float32)
        * sx
    )
    with pltpu.force_tpu_interpret_mode():
        yt = pallas_quant.int8_matmul(gq, w, sx, None, nt=True, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(yt), np.asarray(ref_t))


def test_pallas_qmm_epilogue_matches_xla_qmm_bf16():
    """The fused epilogue (acc*sx*sn in f32, then bf16 cast) must be bit-identical
    to the XLA path's (yi*sx)*s ordering so KAI0_INT8_PALLAS does not change
    training numerics."""
    from jax.experimental.pallas import tpu as pltpu

    from kai0_tpu.ops import pallas_quant

    rng = np.random.default_rng(1)
    x = jnp.array(rng.standard_normal((96, 256)), jnp.bfloat16)
    w = jnp.array(rng.standard_normal((256, 128)), jnp.float32)
    qa = quant.quantize_einsum_weight(w, "BD,DF->BF")

    xla = quant._qmm_fwd_impl(x, None, qa.q, qa.s)
    xq, sx = quant._row_quant(x)
    with pltpu.force_tpu_interpret_mode():
        pal = pallas_quant.int8_matmul(xq, qa.q, sx, qa.s, out_dtype=x.dtype)
    np.testing.assert_array_equal(np.asarray(xla), np.asarray(pal))


def _assert_bf16_ulp_close(got, ref, max_mismatch_frac=1e-3):
    """Equal except isolated 1-bf16-ulp flips (CPU-interpret f32 reduction-order
    artifact of the rank-128 zero padding; on real TPU both paths feed the same
    128-wide MXU accumulation — scripts/dev/check_pallas_ffn_parity.py asserts
    exact equality on-chip)."""
    g, r = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    frac = float((g != r).mean())
    assert frac <= max_mismatch_frac, f"{frac:.2e} of elements differ"
    np.testing.assert_allclose(g, r, rtol=2**-7, atol=1e-6)


@pytest.mark.parametrize("m,k,n,r", [(300, 257, 130, 16), (96, 2048, 512, 16), (64, 128, 128, 4)])
def test_pallas_int8_matmul_lora_matches_xla(m, k, n, r):
    """int8_matmul_lora == base int8 dot + bf16-rounded LoRA dot, matching the
    fused-FFN XLA spelling `yi*sx*sw + dot(u, b).astype(f32)` (bf16 cast last)."""
    from jax.experimental.pallas import tpu as pltpu

    from kai0_tpu.ops import pallas_quant

    rng = np.random.default_rng(7)
    xq = jnp.array(rng.integers(-127, 128, (m, k)), jnp.int8)
    w = jnp.array(rng.integers(-127, 128, (k, n)), jnp.int8)
    sx = jnp.array(rng.random((m, 1), dtype=np.float32) * 0.1)
    sn = jnp.array(rng.random(n, dtype=np.float32) * 0.01)
    u = jnp.array(rng.standard_normal((m, r)), jnp.bfloat16)
    b = jnp.array(rng.standard_normal((r, n)), jnp.bfloat16)

    base = (
        jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32).astype(jnp.float32)
        * sx
        * sn
    )
    ref = (base + jnp.dot(u, b).astype(jnp.float32)).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_quant.int8_matmul_lora(xq, w, sx, sn, u, b, out_dtype=jnp.bfloat16)
    _assert_bf16_ulp_close(y, ref)


def test_split_dot_matches_full_dot_slices(monkeypatch):
    """KAI0_INT8_SPLITDOT=1 (per-half dots on column-sliced weights) must produce
    exactly the column slices of the full-width dot: the row scales depend only on
    x, so quantization is identical either way."""
    rng = np.random.default_rng(3)
    x = jnp.array(rng.standard_normal((2, 12, 32)), jnp.float32)
    w = jnp.array(rng.standard_normal((2, 32, 48)), jnp.float32)
    qa = quant.quantize_einsum_weight(w, "BTD,2DF->2BTF")

    monkeypatch.setenv("KAI0_INT8_SPLITDOT", "0")
    full = quant.apply_quant_split(qa, x)
    monkeypatch.setenv("KAI0_INT8_SPLITDOT", "1")
    split = quant.apply_quant_split(qa, x)
    for a, b in zip(full, split, strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_add_epilogue_matches_plain_add():
    """The qmm epilogue add (LoRA fast path) must equal computing the matmul and
    adding afterwards, in value and in gradients (dx straight-through, d_add=dy)."""
    rng = np.random.default_rng(4)
    x = jnp.array(rng.standard_normal((2, 12, 32)), jnp.float32)
    w = jnp.array(rng.standard_normal((2, 32, 48)), jnp.float32)
    qa = quant.quantize_einsum_weight(w, "BTD,2DF->2BTF")
    adds = tuple(jnp.array(rng.standard_normal((2, 12, 48)), jnp.float32) for _ in range(2))

    def fused(x, adds):
        ys = quant.apply_quant_split(qa, x, adds=adds)
        return sum(jnp.sum(jnp.sin(y)) for y in ys)

    def plain(x, adds):
        ys = quant.apply_quant_split(qa, x)
        return sum(jnp.sum(jnp.sin(y + a)) for y, a in zip(ys, adds, strict=True))

    np.testing.assert_allclose(float(fused(x, adds)), float(plain(x, adds)), rtol=1e-6)
    gf = jax.grad(fused, argnums=(0, 1))(x, adds)
    gp = jax.grad(plain, argnums=(0, 1))(x, adds)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        gf,
        gp,
    )

    # apply_quant_einsum add on the transpose-free linear eqn
    qa2 = quant.quantize_einsum_weight(jnp.array(rng.standard_normal((48, 32)), jnp.float32), "BTF,FD->BTD")
    xl = jnp.array(rng.standard_normal((2, 12, 48)), jnp.float32)
    a2 = jnp.array(rng.standard_normal((2, 12, 32)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(quant.apply_quant_einsum(qa2, "BTF,FD->BTD", xl, add=a2)),
        np.asarray(quant.apply_quant_einsum(qa2, "BTF,FD->BTD", xl) + a2),
    )


class TestFusedFFN:
    """The fused gated-FFN op (quant.apply_fused_ffn) vs the composed split path."""

    def _make(self, rows=24, d=32, f=256, rank=4, lora=True, seed=0):
        from kai0_tpu.models import lora as _lora

        keys = jax.random.split(jax.random.key(seed), 8)
        cfg = _lora.LoRAConfig(rank=rank, alpha=4.0) if lora else None
        params = _lora.init_ffn(keys[0], d, f, cfg)
        params = jax.tree.map(lambda p: p.astype(jnp.float32), params)
        qparams = dict(params)
        qparams["gating_einsum"] = quant.quantize_einsum_weight(
            params["gating_einsum"].astype(jnp.bfloat16), "BTD,2DF->2BTF"
        )
        qparams["linear"] = quant.quantize_einsum_weight(
            params["linear"].astype(jnp.bfloat16), "BTF,FD->BTD"
        )
        x = (0.5 * jax.random.normal(keys[1], (2, rows // 2, d))).astype(jnp.bfloat16)
        return qparams, x

    @pytest.mark.parametrize("lora", [True, False])
    def test_fused_forward_bit_identical_to_split(self, lora, monkeypatch):
        from kai0_tpu.models import lora as _lora

        qparams, x = self._make(lora=lora)
        monkeypatch.setenv("KAI0_INT8_FFN", "split")
        ref = _lora.apply_ffn(qparams, x)
        monkeypatch.setenv("KAI0_INT8_FFN", "fused")
        got = _lora.apply_ffn(qparams, x)
        np.testing.assert_array_equal(np.asarray(got, np.float32), np.asarray(ref, np.float32))

    def test_fused_forward_matches_split_when_row_chunked(self, monkeypatch):
        """With c>1 the two paths agree to quantization-step tolerance: XLA
        reassociates the f32 ``yi * sx * s`` scale chain differently across
        fusion shapes (1 bf16 ulp on gate/up), and a 1-ulp act change can shift
        the down projection's per-row int8 rounding by one step (~0.8% of the
        row max). Bitwise equality is therefore compilation-dependent; measured
        diffs: 0.7% of elements, ≤0.009 absolute on an O(0.3) output."""
        from kai0_tpu.models import lora as _lora

        # Force c>1 chunking (rows divisible, tiny budget) on both paths.
        monkeypatch.setattr(quant, "_CHUNK_BYTES", 2**20)
        qparams, x = self._make(rows=1024, d=64, f=512)
        assert quant._row_chunks(1024, 512) > 1
        monkeypatch.setenv("KAI0_INT8_FFN", "split")
        ref = np.asarray(_lora.apply_ffn(qparams, x), np.float32)
        monkeypatch.setenv("KAI0_INT8_FFN", "fused")
        got = np.asarray(_lora.apply_ffn(qparams, x), np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.02)
        cos = np.dot(got.ravel(), ref.ravel()) / (np.linalg.norm(got) * np.linalg.norm(ref))
        assert cos > 0.99995

    @pytest.mark.parametrize("chunked", [False, True])
    def test_fused_grads_track_split(self, chunked, monkeypatch):
        from kai0_tpu.models import lora as _lora

        if chunked:
            monkeypatch.setattr(quant, "_CHUNK_BYTES", 2**20)
            qparams, x = self._make(rows=1024, d=64, f=512)
        else:
            qparams, x = self._make()

        def loss(path):
            monkeypatch.setenv("KAI0_INT8_FFN", path)

            def f(trainable, x):
                p = {**qparams, **trainable}
                return jnp.mean(jnp.square(_lora.apply_ffn(p, x).astype(jnp.float32)))

            trainable = {k: v for k, v in qparams.items() if not quant.is_quant(v)}
            val, grads = jax.value_and_grad(f)(trainable, x)
            # Also dx (the path back into the residual stream).
            dx = jax.grad(lambda xx: f(trainable, xx))(x)
            return val, grads, dx

        val_s, g_s, dx_s = loss("split")
        val_f, g_f, dx_f = loss("fused")
        # chunked forward differs by isolated int8 rounding flips (see the
        # forward test above), so the loss agrees to ~1e-4, exactly otherwise.
        np.testing.assert_allclose(float(val_f), float(val_s), rtol=1e-3 if chunked else 1e-6)
        for k in g_s:
            a, b = np.asarray(g_f[k], np.float32), np.asarray(g_s[k], np.float32)
            np.testing.assert_allclose(a, b, rtol=0.05, atol=2e-5 * max(1.0, np.abs(b).max()), err_msg=k)
        np.testing.assert_allclose(
            np.asarray(dx_f, np.float32), np.asarray(dx_s, np.float32), rtol=0.05,
            atol=2e-5 * max(1.0, np.abs(np.asarray(dx_s, np.float32)).max()),
        )

    def test_pallas_lora_epilogue_matches_xla_fused(self, monkeypatch):
        """KAI0_INT8_PALLAS_FFN routes the fused FFN's gate/up/down dots through
        pallas_quant.int8_matmul_lora (LoRA term added per output tile in the
        epilogue). Forward must be bit-identical to the XLA fused path; grads
        match to the same tolerance as fused-vs-split (the backward recompute
        feeds bit-identical gate/up into identical XLA backward math)."""
        from jax.experimental.pallas import tpu as pltpu

        from kai0_tpu.models import lora as _lora

        qparams, x = self._make(rows=24, d=32, f=256, rank=4)
        monkeypatch.setenv("KAI0_INT8_FFN", "fused")

        def run():
            def f(trainable, x):
                p = {**qparams, **trainable}
                return jnp.mean(jnp.square(_lora.apply_ffn(p, x).astype(jnp.float32)))

            trainable = {k: v for k, v in qparams.items() if not quant.is_quant(v)}
            y = _lora.apply_ffn(qparams, x)
            val, grads = jax.value_and_grad(f)(trainable, x)
            dx = jax.grad(lambda xx: f(trainable, xx))(x)
            return y, val, grads, dx

        y_ref, val_ref, g_ref, dx_ref = run()
        monkeypatch.setenv("KAI0_INT8_PALLAS_FFN", "1")
        monkeypatch.setattr(quant.jax, "default_backend", lambda: "tpu")
        with pltpu.force_tpu_interpret_mode():
            y_p, val_p, g_p, dx_p = run()
        _assert_bf16_ulp_close(y_p, y_ref)
        np.testing.assert_allclose(float(val_p), float(val_ref), rtol=1e-6)
        for k in g_ref:
            a, b = np.asarray(g_p[k], np.float32), np.asarray(g_ref[k], np.float32)
            np.testing.assert_allclose(a, b, rtol=0.05, atol=2e-5 * max(1.0, np.abs(b).max()), err_msg=k)
        np.testing.assert_allclose(
            np.asarray(dx_p, np.float32), np.asarray(dx_ref, np.float32), rtol=0.05,
            atol=2e-5 * max(1.0, np.abs(np.asarray(dx_ref, np.float32)).max()),
        )


# ---------------------------------------------------------------------------
# One-pass Pallas row quantization (kai0_tpu/ops/pallas_rowquant.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "m,k,dtype",
    [
        (3388, 2048, jnp.bfloat16),  # the batch-14 FFN chunk row count (non-128-divisible)
        (256, 16384, jnp.bfloat16),  # mlp_dim-wide rows, f32 divide temp at the VMEM budget
        (130, 1536, jnp.float32),  # f32 gradients (the dgrad row-quant site) + odd M
        (32, 1024, jnp.bfloat16),  # single block
    ],
)
def test_pallas_row_quant_bit_identical(m, k, dtype):
    """KAI0_INT8_ROWQUANT=pallas must not change training numerics: the kernel's
    int8 codes and f32 scales match quant._row_quant exactly."""
    from jax.experimental.pallas import tpu as pltpu

    from kai0_tpu.ops import pallas_rowquant

    rng = np.random.default_rng(7)
    x = jnp.array(rng.standard_normal((m, k)) * 3.0, dtype)
    # A few zero rows exercise the 1e-30 clamp.
    x = x.at[: min(2, m)].set(0)

    # jit the reference: training always runs _row_quant under jit, where XLA
    # lowers /127.0 to a reciprocal multiply (1 ulp off the eager divide) — the
    # kernel matches the jitted lowering.
    xq_ref, sx_ref = jax.jit(quant._row_quant)(x)
    with pltpu.force_tpu_interpret_mode():
        xq, sx = pallas_rowquant.row_quant(x)
    np.testing.assert_array_equal(np.asarray(xq), np.asarray(xq_ref))
    np.testing.assert_array_equal(np.asarray(sx), np.asarray(sx_ref))


def test_row_quant_pallas_dispatch(monkeypatch):
    """_row_quant routes to the kernel only under KAI0_INT8_ROWQUANT=pallas on a
    TPU backend; the env default keeps the XLA path."""
    monkeypatch.setenv("KAI0_INT8_ROWQUANT", "pallas")
    assert quant._rowquant_pallas_enabled() == (jax.default_backend() == "tpu")
    monkeypatch.delenv("KAI0_INT8_ROWQUANT")
    assert not quant._rowquant_pallas_enabled()


class TestMixedLoRAFFN:
    """Gate-only / down-only LoRA param dicts must route to the split path (the
    fused op threads one 6-factor tuple; ADVICE round-2: gate-only crashed and
    down-only would have silently dropped the adapter)."""

    @pytest.mark.parametrize("drop", ["linear", "gating_einsum"])
    def test_partial_lora_matches_split_path(self, drop, monkeypatch):
        from kai0_tpu.models import lora as _lora

        qparams, x = TestFusedFFN()._make(lora=True)
        for suffix in ("_lora_a", "_lora_b"):
            del qparams[drop + suffix]
        monkeypatch.setenv("KAI0_INT8_FFN", "split")
        ref = _lora.apply_ffn(qparams, x)
        monkeypatch.setenv("KAI0_INT8_FFN", "fused")
        got = _lora.apply_ffn(qparams, x)  # falls back to split: identical
        np.testing.assert_array_equal(np.asarray(got, np.float32), np.asarray(ref, np.float32))
