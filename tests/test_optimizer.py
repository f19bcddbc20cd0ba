"""Pin optimizer/schedule semantics against the optax-builder equivalents.

The reference (src/openpi/training/optimizer.py:15-109) uses
optax.warmup_cosine_decay_schedule / join_schedules / optax.adamw; this repo
builds the same math from explicit step functions and optax primitives. These
tests assert the two constructions agree, so the numbers stay the contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kai0_tpu.training import optimizer as opt


def test_cosine_schedule_matches_optax_builder():
    cfg = opt.CosineDecaySchedule(warmup_steps=100, peak_lr=2.5e-5, decay_steps=3000, decay_lr=2.5e-6)
    ours = cfg.create()
    ref = optax.warmup_cosine_decay_schedule(
        init_value=cfg.peak_lr / (cfg.warmup_steps + 1),
        peak_value=cfg.peak_lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=cfg.decay_steps,
        end_value=cfg.decay_lr,
    )
    steps = np.array([0, 1, 50, 99, 100, 101, 500, 1500, 2999, 3000, 5000])
    np.testing.assert_allclose(
        np.array([float(ours(s)) for s in steps]),
        np.array([float(ref(s)) for s in steps]),
        rtol=1e-5,
    )


def test_rsqrt_schedule_matches_optax_builder():
    cfg = opt.RsqrtDecaySchedule(warmup_steps=50, peak_lr=5e-5, timescale=1000)
    ours = cfg.create()
    ref = optax.join_schedules(
        [
            optax.linear_schedule(
                init_value=cfg.peak_lr / (cfg.warmup_steps + 1),
                end_value=cfg.peak_lr,
                transition_steps=cfg.warmup_steps,
            ),
            lambda step: cfg.peak_lr / jnp.sqrt((cfg.timescale + step) / cfg.timescale),
        ],
        [cfg.warmup_steps],
    )
    steps = np.array([0, 10, 49, 50, 51, 500, 5000])
    np.testing.assert_allclose(
        np.array([float(ours(s)) for s in steps]),
        np.array([float(ref(s)) for s in steps]),
        rtol=1e-5,
    )


def test_adamw_update_matches_optax_adamw():
    cfg = opt.AdamW()
    lr = opt.CosineDecaySchedule(warmup_steps=10, decay_steps=100).create()
    params = {
        "w": jnp.array([[0.3, -1.2], [2.0, 0.1]], jnp.float32),
        "b": jnp.array([0.5, -0.5], jnp.float32),
    }
    grads = {
        "w": jnp.array([[1.0, -2.0], [0.5, 3.0]], jnp.float32),
        "b": jnp.array([-1.0, 4.0], jnp.float32),
    }

    tx_ours = cfg.create(lr)
    tx_ref = optax.chain(
        optax.clip_by_global_norm(cfg.clip_gradient_norm),
        optax.adamw(lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps, weight_decay=cfg.weight_decay),
    )

    def run(tx):
        state = tx.init(params)
        p = params
        for _ in range(3):
            updates, state = tx.update(grads, state, p)
            p = optax.apply_updates(p, updates)
        return p

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9),
        run(tx_ours),
        run(tx_ref),
    )


def test_sgd_momentum_matches_optax_sgd():
    cfg = opt.SGD(momentum=0.9, nesterov=False)
    tx_ours = cfg.create(1e-2)
    tx_ref = optax.sgd(1e-2, momentum=0.9, nesterov=False)
    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    grads = {"w": jnp.array([1.0, -1.0, 0.5, 2.0], jnp.float32)}

    def run(tx):
        state = tx.init(params)
        p = params
        for _ in range(3):
            updates, state = tx.update(grads, state, p)
            p = optax.apply_updates(p, updates)
        return p["w"]

    np.testing.assert_allclose(np.asarray(run(tx_ours)), np.asarray(run(tx_ref)), rtol=1e-6)


def test_adamw_compact_state_tracks_f32_and_stores_bf16():
    """state_dtype="bfloat16" stores both moments compact but the update math runs
    in f32: after a few steps the parameters must track the exact-AdamW trajectory
    to bf16-quantization tolerance, the moments must actually BE bf16, and with
    state_dtype f32 the compact transform must match optax.scale_by_adam exactly."""
    lr = 1e-2
    params = {
        "w": jnp.array([[0.3, -1.2], [2.0, 0.1]], jnp.float32),
        "b": jnp.array([0.5, -0.5], jnp.float32),
    }

    def run(cfg, steps=5):
        tx = cfg.create(lr)
        state = tx.init(params)
        p = params
        for i in range(steps):
            grads = jax.tree.map(
                lambda x: jnp.sin(x + i).astype(jnp.float32), p
            )  # deterministic, param-dependent
            updates, state = tx.update(grads, state, p)
            p = optax.apply_updates(p, updates)
        return p, state

    p_ref, _ = run(opt.AdamW())
    p_bf16, state_bf16 = run(opt.AdamW(state_dtype="bfloat16"))
    adam_state = next(s for s in jax.tree.leaves(state_bf16, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)))
    assert all(m.dtype == jnp.bfloat16 for m in jax.tree.leaves(adam_state.mu))
    assert all(v.dtype == jnp.bfloat16 for v in jax.tree.leaves(adam_state.nu))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=3e-4),
        p_bf16,
        p_ref,
    )

    # Exactness check: the compact transform with f32 storage IS scale_by_adam.
    p_f32_compact, _ = run(opt.AdamW(state_dtype="float32"))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9),
        p_f32_compact,
        p_ref,
    )


def test_stochastic_round_bf16_is_unbiased_and_exact_on_representables():
    """E[sr(x)] = x for values between bf16 grid points; exact on grid points."""
    key = jax.random.key(0)
    # A value exactly 1/4 of the way between two bf16 neighbours.
    lo = jnp.float32(jnp.bfloat16(1.0))
    hi = jnp.float32(jnp.nextafter(jnp.bfloat16(1.0), jnp.bfloat16(2.0)))
    x = jnp.full((20000,), lo + 0.25 * (hi - lo), jnp.float32)
    r = opt._stochastic_round_bf16(x, key).astype(jnp.float32)
    frac_up = float(jnp.mean(r == hi))
    assert set(np.unique(np.asarray(r))) <= {float(lo), float(hi)}
    assert abs(frac_up - 0.25) < 0.02, frac_up
    # Representable values never move, regardless of key.
    grid = jnp.array([0.0, 1.0, -3.5, 2.0**-30, -(2.0**20)], jnp.float32)
    assert np.array_equal(
        np.asarray(opt._stochastic_round_bf16(grid, key).astype(jnp.float32)), np.asarray(grid)
    )
    # Non-finite values pass through.
    weird = jnp.array([jnp.inf, -jnp.inf, jnp.nan], jnp.float32)
    out = np.asarray(opt._stochastic_round_bf16(weird, key).astype(jnp.float32))
    assert out[0] == np.inf and out[1] == -np.inf and np.isnan(out[2])


def test_bf16_nu_does_not_stagnate_under_subulp_increments():
    """The ADVICE round-2 finding: with nearest rounding, once g² is within a
    few × of nu the per-step increment (1-b2)(g²-nu) is below bf16's half-ulp
    and nu freezes. Stochastic rounding keeps the EMA tracking its f32 value.

    Regime: b2=0.999 (1-b2 = 1e-3, well below bf16's ~4e-3 ulp), constant g."""
    b2 = 0.999
    g = jnp.full((4096,), 1e-3, jnp.float32)
    gsq = float(g[0]) ** 2

    tx = opt._scale_by_adam_compact(b1=0.9, b2=b2, eps=1e-8, state_dtype="bfloat16")
    state = tx.init({"w": g})
    # Start nu at 50% of its fixed point: every nearest-rounded store from here
    # on discards the increment (1e-3 · gap < half-ulp once gap < ~2·v).
    state = state._replace(nu={"w": jnp.full_like(g, 0.5 * gsq).astype(jnp.bfloat16)})
    update = jax.jit(lambda s: tx.update({"w": g}, s)[1])
    for _ in range(1500):
        state = update(state)
    nu_sr = float(jnp.mean(state.nu["w"].astype(jnp.float32)))

    # f32 reference EMA after the same steps.
    nu_ref = 0.5 * gsq
    for _ in range(1500):
        nu_ref = b2 * nu_ref + (1 - b2) * gsq
    # Nearest rounding stalls at ~0.5·g² (relative error ~45%); SR must track.
    assert abs(nu_sr - nu_ref) / nu_ref < 0.05, (nu_sr, nu_ref)


def test_sr_nu_is_deterministic_given_step():
    tx = opt._scale_by_adam_compact(b1=0.9, b2=0.95, eps=1e-8, state_dtype="bfloat16")
    g = {"w": jnp.linspace(-1, 1, 64, dtype=jnp.float32)}
    s1, s2 = tx.init(g), tx.init(g)
    for _ in range(3):
        _, s1 = tx.update(g, s1)
        _, s2 = tx.update(g, s2)
    assert np.array_equal(np.asarray(s1.nu["w"]), np.asarray(s2.nu["w"]))


# --------------------------------------------------------------------------------------
# 8-bit blockwise moment storage (state_dtype="int8") — the single-chip full-FT enabler
# --------------------------------------------------------------------------------------


def test_q8_encode_decode_roundtrip():
    """Log-domain 8-bit codes: zeros exact, wide dynamic range preserved, SR
    unbiased enough that the decoded median relative error is within one grid step."""
    key = jax.random.key(0)
    # Values spanning 6 decades within one block, plus exact zeros.
    x = jnp.concatenate(
        [
            jnp.zeros(100),
            10.0 ** jax.random.uniform(key, (4000,), minval=-6.0, maxval=0.0),
            -(10.0 ** jax.random.uniform(jax.random.fold_in(key, 1), (4000,), minval=-6.0, maxval=0.0)),
        ]
    )
    for signed in (True, False):
        xs = jnp.abs(x) if not signed else x
        packed = opt._q8_encode(xs, jax.random.key(7), signed=signed)
        assert packed["q"].dtype == (jnp.int8 if signed else jnp.uint8)
        assert packed["s"].shape == (-(-xs.size // opt._QBLOCK),)
        dec = opt._q8_decode(packed)
        # exact zeros stay zero
        np.testing.assert_array_equal(np.asarray(dec[:100]), 0.0)
        nz = np.asarray(xs[100:])
        rel = np.abs(np.asarray(dec[100:]) - nz) / np.abs(nz)
        # one SR log-step is exp(7·ln10/levels) − 1 ≈ 13% (signed) / 6% (unsigned)
        step = np.exp(7.0 * np.log(10.0) / (127.0 if signed else 255.0)) - 1.0
        assert np.median(rel) < step, (signed, np.median(rel), step)
        assert np.max(rel) < 2.5 * step + 1e-6, (signed, np.max(rel))
        # signs survive
        assert np.all(np.sign(np.asarray(dec[100:])) == np.sign(nz))


def test_adamw_q8_tracks_f32_and_stores_8bit():
    """state_dtype="int8": moments are stored as blockwise int8/uint8 (+f32 block
    scales) and a few steps track the exact-AdamW trajectory to quantization
    tolerance."""
    lr = 1e-2
    params = {
        "w": jnp.array([[0.3, -1.2], [2.0, 0.1]], jnp.float32),
        "b": jnp.array([0.5, -0.5], jnp.float32),
    }

    def run(cfg, steps=5):
        tx = cfg.create(lr)
        state = tx.init(params)
        p = params
        for i in range(steps):
            grads = jax.tree.map(lambda x: jnp.sin(x + i).astype(jnp.float32), p)
            updates, state = tx.update(grads, state, p)
            p = optax.apply_updates(p, updates)
        return p, state

    p_ref, _ = run(opt.AdamW())
    p_q8, state_q8 = run(opt.AdamW(state_dtype="int8"))
    adam_state = next(
        s for s in jax.tree.leaves(state_q8, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
    )
    is_packed = lambda x: isinstance(x, dict) and set(x) == {"q", "s"}  # noqa: E731
    assert all(leaf["q"].dtype == jnp.int8 for leaf in jax.tree.leaves(adam_state.mu, is_leaf=is_packed))
    assert all(leaf["q"].dtype == jnp.uint8 for leaf in jax.tree.leaves(adam_state.nu, is_leaf=is_packed))
    # lr-scale trajectory agreement: per-step update error is bounded by the SR
    # grid (~±13%) of an lr-sized step.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5 * lr * 0.3),
        p_q8,
        p_ref,
    )


def test_adamw_q8_optimizes_like_f32():
    """Functional convergence A/B: 300 AdamW steps on a quadratic. The 8-bit-state
    run must reach (near) the f32-state loss — the moments carry enough fidelity
    to optimize, not just to store."""

    def train(state_dtype, steps=300):
        cfg = opt.AdamW(state_dtype=state_dtype)
        tx = cfg.create(lambda _: 5e-2)
        key = jax.random.key(3)
        p = {"w": jax.random.normal(key, (64, 64)) * 2.0}
        target = jax.random.normal(jax.random.fold_in(key, 1), (64, 64))
        state = tx.init(p)

        @jax.jit
        def step(p, state):
            loss, grads = jax.value_and_grad(lambda q: jnp.mean((q["w"] - target) ** 2))(p)
            updates, state = tx.update(grads, state, p)
            return optax.apply_updates(p, updates), state, loss

        for _ in range(steps):
            p, state, loss = step(p, state)
        return float(loss)

    loss_f32 = train(None)
    loss_q8 = train("int8")
    assert loss_q8 < max(4 * loss_f32, 1e-3), (loss_q8, loss_f32)


def test_apply_updates_sr_bf16_accumulates_subulp():
    """Sub-ulp updates into bf16 params: plain += drops them, SR accumulates them
    in expectation; f32 leaves take the exact optax update."""
    n = 20000
    p = {"w16": jnp.ones((n,), jnp.bfloat16), "w32": jnp.ones((4,), jnp.float32)}
    # 1/10 of a bf16 ulp at 1.0 (ulp = 2^-7): rounds to nothing deterministically.
    u = {"w16": jnp.full((n,), 2.0**-7 / 10, jnp.float32), "w32": jnp.full((4,), 0.25, jnp.float32)}
    plain = optax.apply_updates(p, u)
    assert float(jnp.mean(plain["w16"].astype(jnp.float32))) == 1.0  # update lost

    new = opt.apply_updates_sr(p, u, jax.random.key(0))
    assert new["w16"].dtype == jnp.bfloat16 and new["w32"].dtype == jnp.float32
    mean_gain = float(jnp.mean(new["w16"].astype(jnp.float32))) - 1.0
    np.testing.assert_allclose(mean_gain, 2.0**-7 / 10, rtol=0.15)  # unbiased in expectation
    np.testing.assert_allclose(np.asarray(new["w32"]), 1.25, rtol=1e-7)

    # repeated application drifts upward like the f32 trajectory would
    q = p
    for i in range(50):
        q = opt.apply_updates_sr(q, u, jax.random.key(i))
    drift = float(jnp.mean(q["w16"].astype(jnp.float32))) - 1.0
    np.testing.assert_allclose(drift, 50 * 2.0**-7 / 10, rtol=0.2)


def test_pallas_q8_leaf_matches_xla_contract():
    """Interpret-mode check of the fused q8-Adam kernel (kai0_tpu/ops/pallas_q8.py)
    against the XLA leaf math: the bias-corrected update is deterministic (exact up
    to the folded-scalar fp rewrite); the re-encoded moments land on the same log
    grid (same block scales; decoded values within one stochastic-rounding step)."""
    from kai0_tpu.ops import pallas_q8

    b1, b2, eps, count = 0.9, 0.95, 1e-8, 7
    c1, c2 = 1 - b1**count, 1 - b2**count
    rng = np.random.default_rng(3)
    shape = (3, 5, 500)  # 7500 elems: 4 blocks, padded tail
    g = jnp.asarray(rng.normal(0, 1e-3, shape), jnp.bfloat16)
    m_prev = jnp.asarray(rng.normal(0, 1e-3, shape), jnp.float32)
    v_prev = jnp.asarray(np.abs(rng.normal(0, 1e-6, shape)), jnp.float32)
    mp = opt._q8_encode(m_prev, jax.random.key(1), signed=True)
    vp = opt._q8_encode(v_prev, jax.random.key(2), signed=False)

    # XLA reference recurrence on the DECODED moments (exactly what the kernel sees)
    gf = g.astype(jnp.float32)
    m = b1 * opt._q8_decode(mp) + (1 - b1) * gf
    v = b2 * opt._q8_decode(vp) + (1 - b2) * gf * gf
    want = ((m / c1) / (jnp.sqrt(v / c2) + eps)).astype(g.dtype)

    scalars = jnp.asarray([np.sqrt(c2) / c1, eps * np.sqrt(c2)], jnp.float32)
    out, nm, nv = pallas_q8.adam_q8_leaf(
        g, mp["q"], mp["s"], vp["q"], vp["s"], scalars, jnp.asarray([11], jnp.int32),
        b1=b1, b2=b2, interpret=True,
    )
    assert out.shape == shape and out.dtype == g.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=1e-9
    )

    step_s = opt._QDECADES * np.log(10.0) / 127.0
    for pack, target, signed in ((nm, m, True), (nv, v, False)):
        assert pack["q"].shape == shape and pack["s"].shape == mp["s"].shape
        # block scales are the exact absmax of the f32 moment
        blocks = np.pad(np.asarray(target).reshape(-1), (0, (-target.size) % opt._QBLOCK)).reshape(-1, opt._QBLOCK)
        np.testing.assert_allclose(np.asarray(pack["s"]), np.abs(blocks).max(1), rtol=1e-6)
        # decoded moments within one SR log-step of the true value (above the floor)
        dec = np.asarray(opt._q8_decode(pack), np.float32).reshape(-1)
        tgt = np.asarray(target, np.float32).reshape(-1)
        scale_per_elem = np.repeat(np.abs(blocks).max(1), opt._QBLOCK)[: tgt.size]
        big = np.abs(tgt) > scale_per_elem * 1e-6
        ratio = dec[big] / tgt[big]
        assert np.all(ratio > 0), "sign must be preserved"
        assert np.all(np.abs(np.log(ratio)) <= step_s * 1.01), np.max(np.abs(np.log(ratio)))


def test_pallas_q8_sharded_matches_leaf():
    """Codec identity of the shard_mapped q8-Adam kernel (VERDICT round-4 item 1):
    on the virtual 8-device CPU mesh, adam_q8_leaf_sharded must produce BYTE-
    identical updates and moment packs to the single-device adam_q8_leaf
    (deterministic rounding; the only licensed divergence in production is the
    SR draw). Covers both an exactly shard-tile-aligned size and a ragged tail
    that exercises the _ROWS·mesh.size padding."""
    from kai0_tpu.ops import pallas_q8
    from kai0_tpu.parallel import sharding

    mesh = sharding.make_mesh(4, devices=jax.devices()[:8])  # (batch=2, fsdp=4)
    b1, b2 = 0.9, 0.95
    scalars = jnp.asarray([1.3, 1e-8], jnp.float32)
    seed = jnp.asarray([17], jnp.int32)
    rng = np.random.default_rng(11)
    aligned = mesh.size * pallas_q8._ROWS * opt._QBLOCK  # one tile per shard
    for n in (aligned, aligned + 5000):
        g = jnp.asarray(rng.normal(0, 1e-3, (n,)), jnp.bfloat16)
        mp = opt._q8_encode(jnp.asarray(rng.normal(0, 1e-3, (n,)), jnp.float32),
                            jax.random.key(1), signed=True)
        vp = opt._q8_encode(jnp.asarray(np.abs(rng.normal(0, 1e-6, (n,))), jnp.float32),
                            jax.random.key(2), signed=False)
        args = (g, mp["q"], mp["s"], vp["q"], vp["s"], scalars, seed)
        out_l, nm_l, nv_l = pallas_q8.adam_q8_leaf(
            *args, b1=b1, b2=b2, interpret=True, deterministic=True)
        out_s, nm_s, nv_s = pallas_q8.adam_q8_leaf_sharded(
            *args, b1=b1, b2=b2, mesh=mesh, interpret=True, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_l))
        for a, b in ((nm_s, nm_l), (nv_s, nv_l)):
            np.testing.assert_array_equal(np.asarray(a["q"]), np.asarray(b["q"]))
            np.testing.assert_array_equal(np.asarray(a["s"]), np.asarray(b["s"]))


def test_adamw_q8_sharded_transform_on_mesh(monkeypatch):
    """EXECUTE the q8-Adam transform on the 8-device CPU mesh with the sharded
    Pallas path selected (KAI0_Q8_PALLAS_INTERPRET routes interpret mode off-TPU)
    and pin it against the XLA path: same update (the recurrence runs on the
    same decoded state), same block scales, decoded moments within one log
    step (nearest- vs stochastic-rounded grid codes)."""
    from kai0_tpu.ops import pallas_q8
    from kai0_tpu.parallel import sharding

    mesh = sharding.make_mesh(4, devices=jax.devices()[:8])
    n = mesh.size * pallas_q8._ROWS * opt._QBLOCK  # exactly the sharded threshold
    rng = np.random.default_rng(5)
    params = {"big": jnp.zeros((n,), jnp.bfloat16), "tiny": jnp.zeros((64,), jnp.float32)}
    g = {
        "big": jnp.asarray(rng.normal(0, 1e-3, (n,)), jnp.bfloat16),
        "tiny": jnp.asarray(rng.normal(0, 1e-3, (64,)), jnp.float32),
    }
    tx = opt._scale_by_adam_q8(0.9, 0.95, 1e-8)
    state = tx.init(params)

    monkeypatch.setenv("KAI0_Q8_PALLAS_INTERPRET", "1")
    with sharding.set_mesh(mesh):
        out_p, state_p = jax.jit(tx.update)(g, state, params)
    monkeypatch.setenv("KAI0_Q8_PALLAS", "0")
    with sharding.set_mesh(mesh):
        out_x, state_x = jax.jit(tx.update)(g, state, params)

    np.testing.assert_allclose(
        np.asarray(out_p["big"], np.float32), np.asarray(out_x["big"], np.float32),
        rtol=2e-2, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(out_p["tiny"]), np.asarray(out_x["tiny"]))
    step_s = opt._QDECADES * np.log(10.0) / 127.0
    for moment in ("mu", "nu"):
        pack_p = getattr(state_p, moment)["big"]
        pack_x = getattr(state_x, moment)["big"]
        np.testing.assert_allclose(np.asarray(pack_p["s"]), np.asarray(pack_x["s"]), rtol=1e-5)
        dec_p = np.asarray(opt._q8_decode(pack_p), np.float32)
        dec_x = np.asarray(opt._q8_decode(pack_x), np.float32)
        both = (np.abs(dec_p) > 0) & (np.abs(dec_x) > 0)
        ratio = dec_p[both] / dec_x[both]
        assert np.all(ratio > 0)
        assert np.all(np.abs(np.log(ratio)) <= 2 * step_s * 1.01)
