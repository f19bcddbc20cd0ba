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
