import numpy as np

from kai0_tpu.models import tokenizer as _tokenizer


def test_paligemma_tokenize_shapes():
    tok = _tokenizer.PaligemmaTokenizer(max_len=48)
    tokens, mask = tok.tokenize("fold the cloth")
    assert tokens.shape == (48,)
    assert mask.shape == (48,)
    assert mask[: mask.sum()].all()
    assert tokens[0] == 2  # BOS


def test_paligemma_tokenize_deterministic():
    t1, m1 = _tokenizer.PaligemmaTokenizer(max_len=32).tokenize("pick up the mug")
    t2, m2 = _tokenizer.PaligemmaTokenizer(max_len=32).tokenize("pick up the mug")
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(m1, m2)


def test_paligemma_pi05_state_in_prompt():
    tok = _tokenizer.PaligemmaTokenizer(max_len=200)
    state = np.linspace(-1, 1, 8)
    tokens, mask = tok.tokenize("fold", state)
    tokens_nostate, _ = tok.tokenize("fold")
    assert mask.sum() > 8  # state tokens included
    assert not np.array_equal(tokens, tokens_nostate)


def test_paligemma_truncation():
    tok = _tokenizer.PaligemmaTokenizer(max_len=4)
    tokens, mask = tok.tokenize("a very long prompt with many words beyond max")
    assert tokens.shape == (4,)
    assert mask.all()


def test_fast_tokenizer_roundtrip():
    tok = _tokenizer.FASTTokenizer(max_len=256)
    state = np.zeros(14, dtype=np.float32)
    horizon, dim = 50, 14
    t = np.linspace(0, 1, horizon)[:, None]
    actions = (0.3 * np.sin(2 * np.pi * t) * np.ones((1, dim))).astype(np.float32)
    tokens, token_mask, ar_mask, loss_mask = tok.tokenize("fold", state, actions)
    assert tokens.shape == (256,)
    # AR mask: prefix bidirectional (0), postfix causal (1).
    assert ar_mask[0] == 0
    assert loss_mask[np.flatnonzero(ar_mask == 1)].all()
    decoded = tok.extract_actions(tokens.astype(np.int32), horizon, dim)
    assert decoded.shape == (horizon, dim)
    # DCT codec keeps the first 8 coefficients of a smooth signal: coarse roundtrip.
    assert np.abs(decoded - actions).max() < 0.1


def test_fast_tokenizer_no_actions():
    tok = _tokenizer.FASTTokenizer(max_len=128)
    tokens, token_mask, ar_mask, loss_mask = tok.tokenize("task", np.zeros(4), None)
    assert not loss_mask.any()
    zero = tok.extract_actions(np.zeros(10, dtype=np.int32), 50, 14)
    assert zero.shape == (50, 14)
    np.testing.assert_array_equal(zero, 0)


# --------------------------------------------------------------------------------------
# RoboArena baseline tokenizers
# --------------------------------------------------------------------------------------


def test_binning_tokenizer_prefix_and_masks():
    from kai0_tpu.models.tokenizer import BinningTokenizer

    tok = BinningTokenizer(max_len=64)
    state = np.linspace(-1, 1, 8)
    tokens, mask, ar, loss = tok.tokenize("Fold_the cloth", state)
    assert tokens.shape == mask.shape == ar.shape == loss.shape == (64,)
    # Prefix-only: bidirectional everywhere valid, no loss positions.
    assert not loss.any()
    assert (ar[mask] == 0).all()
    with np.testing.assert_raises(NotImplementedError):
        tok.tokenize("x", state, actions=np.zeros((5, 4)))


def test_binning_extract_actions_no_marker_returns_zeros():
    from kai0_tpu.models.tokenizer import BinningTokenizer

    tok = BinningTokenizer(max_len=32)
    out = tok.extract_actions(np.arange(10), action_horizon=5, action_dim=3)
    assert out.shape == (5, 3)
    assert np.allclose(out, 0)


def test_fsq_roundtrip_token_ids():
    import jax

    from kai0_tpu.models import fsq_tokenizer as fsq

    config = fsq.FsqConfig(action_horizon=10, action_dim=4, num_tokens=8, hidden=64)
    params = fsq.init_params(config, jax.random.key(0))
    actions = np.random.default_rng(0).uniform(-1, 1, (2, 10, 4)).astype(np.float32)
    ids = fsq.encode(params, config, actions)
    assert ids.shape == (2, 8)
    assert (ids >= 0).all() and (ids < config.vocab_size).all()
    recon = fsq.decode(params, config, ids)
    assert recon.shape == (2, 10, 4)
    # Digitize/undigitize are exact inverses at the id level.
    values = fsq._undigitize(config, ids)
    half = (np.asarray(config.bins_per_dim) - 1) / 2
    redig = fsq._digitize(config, (np.asarray(values) + half).astype(np.int32))
    assert np.array_equal(np.asarray(redig), np.asarray(ids))


def test_fsq_training_reduces_loss():
    import jax
    import jax.numpy as jnp
    import optax

    from kai0_tpu.models import fsq_tokenizer as fsq

    config = fsq.FsqConfig(action_horizon=8, action_dim=2, num_tokens=4, hidden=32)
    params = fsq.init_params(config, jax.random.key(0))
    actions = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (16, 8, 2)), dtype=jnp.float32)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(fsq.reconstruction_loss)(params, config, actions)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    # Straight-through gradients flow: loss decreases.
    assert losses[-1] < losses[0] * 0.9


def test_fsq_tokenizer_wrapper():
    from kai0_tpu.models import fsq_tokenizer as _fsq
    from kai0_tpu.models.tokenizer import FSQTokenizer

    tok = FSQTokenizer(
        max_len=48, fsq_config=_fsq.FsqConfig(action_horizon=10, action_dim=4, num_tokens=4, hidden=32)
    )
    tokens, mask, ar, loss = tok.tokenize("pick up the cup", np.zeros(8))
    assert tokens.shape == (48,)
    out = tok.extract_actions(np.arange(20), action_horizon=10, action_dim=4)
    assert out.shape == (10, 4)
