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
