"""π₀-FAST: tokenizer roundtrip, CE loss, and while-loop decode with KV cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kai0_tpu.models import pi0_fast as _pi0_fast
from kai0_tpu.models import tokenizer as _tokenizer


@pytest.fixture(scope="module")
def fast_setup():
    config = _pi0_fast.Pi0FASTConfig(
        paligemma_variant="dummy",
        vision_variant="mu/14",
        dtype="float32",
        action_dim=4,
        action_horizon=8,
        max_token_len=48,
    )
    params = config.init_params(jax.random.key(0))
    return config, params


def test_fast_tokenizer_roundtrip():
    tok = _tokenizer.FASTTokenizer(max_len=80, codec=_tokenizer.DCTActionCodec(num_coeffs=4, bins=64))
    actions = np.random.uniform(-0.8, 0.8, size=(8, 4)).astype(np.float32)
    tokens, mask, ar, loss = tok.tokenize("pick the cube", np.zeros(4), actions)
    assert tokens.shape == (80,) and mask.shape == (80,) and ar.shape == (80,) and loss.shape == (80,)
    assert loss.sum() > 0 and ar[0] == 0
    extracted = tok.extract_actions(tokens, action_horizon=8, action_dim=4)
    assert extracted.shape == (8, 4)
    # DCT codec with 4 coeffs reconstructs smooth chunks approximately.
    assert np.abs(extracted - actions).mean() < 0.5


def test_fast_loss_shapes(fast_setup):
    config, params = fast_setup
    obs = config.fake_obs(2)
    # Mark some tokens as loss targets.
    obs.token_loss_mask = obs.token_loss_mask.at[:, 30:].set(True).at[:, :30].set(False)
    obs.token_ar_mask = obs.token_ar_mask.at[:, 30:].set(1).at[:, :30].set(0)
    loss = _pi0_fast.compute_loss(params, config, jax.random.key(1), obs, config.fake_act(2))
    assert loss.shape == (2,)
    assert np.all(np.isfinite(loss))
    assert np.all(loss > 0)  # CE on random params ≈ log(vocab)


def test_fast_batched_decode_matches_single(fast_setup):
    """Batched decode equals per-row decode (multi-robot serving coalesces FAST
    requests too; the EOS early-exit loop runs until ALL rows finish, and the
    extra iterations must not perturb rows that finished earlier)."""
    config, params = fast_setup
    obs = config.fake_obs(2)
    # Distinct rows so the two decodes genuinely differ.
    obs = jax.tree.map(
        lambda x: x
        if not hasattr(x, "dtype") or not jnp.issubdtype(x.dtype, jnp.floating)
        else x + 0.1 * jax.random.normal(jax.random.key(5), x.shape, x.dtype),
        obs,
    )
    row = lambda o, i: jax.tree.map(lambda x: x[i : i + 1] if hasattr(x, "shape") else x, o)  # noqa: E731
    batched = _pi0_fast.sample_actions(params, config, jax.random.key(1), obs, max_decoding_steps=8)
    singles = [
        _pi0_fast.sample_actions(params, config, jax.random.key(1), row(obs, i), max_decoding_steps=8)
        for i in range(2)
    ]
    np.testing.assert_array_equal(np.asarray(batched[0]), np.asarray(singles[0][0]))
    np.testing.assert_array_equal(np.asarray(batched[1]), np.asarray(singles[1][0]))


def test_fast_decode(fast_setup):
    config, params = fast_setup
    obs = config.fake_obs(1)
    tokens = _pi0_fast.sample_actions(params, config, jax.random.key(1), obs, max_decoding_steps=8)
    assert tokens.shape == (1, 8)
    assert np.all(np.isfinite(tokens))
    # Greedy decode is deterministic.
    tokens2 = _pi0_fast.sample_actions(params, config, jax.random.key(2), obs, max_decoding_steps=8)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))
