"""Pure-Python SentencePiece unigram codec (kai0_tpu/models/sentencepiece_codec.py).

Builds tiny-but-valid ``.model`` protobufs in-test (a hand-rolled wire-format
writer — the inverse of the module's reader) and pins: proto parsing, unigram
Viterbi segmentation (score-driven), SP normalization (dummy prefix, whitespace
escaping/collapsing), byte fallback, decode inversion, and the
``tokenizer.SentencePieceCodec`` integration. When the real ``sentencepiece``
wheel is importable (asset-equipped hosts), every synthetic model is ALSO
cross-checked id-for-id against the wheel.
"""

import numpy as np
import pytest

from kai0_tpu.models import sentencepiece_codec as spc
from kai0_tpu.models import tokenizer as tok
from _sp_model import _BASE_PIECES, build_model


def _codec(pieces=None, **kw) -> spc.SentencePieceModel:
    return spc.SentencePieceModel(build_model(pieces or _BASE_PIECES, **kw))


def _ids(c, text):
    return list(c.encode(text))


def _maybe_wheel(model_bytes: bytes):
    sp = pytest.importorskip("sentencepiece")
    return sp.SentencePieceProcessor(model_proto=model_bytes)


def test_parse_model_fields():
    m = spc.parse_model(build_model(_BASE_PIECES, bos_id=1, eos_id=2, pad_id=-1))
    assert len(m.pieces) == len(_BASE_PIECES)
    assert m.pieces[3] == ("▁hello", -1.0, spc.NORMAL)
    assert m.pieces[0][2] == spc.UNKNOWN and m.pieces[1][2] == spc.CONTROL
    assert (m.model_type, m.unk_id, m.bos_id, m.eos_id, m.pad_id) == (1, 0, 1, 2, -1)
    assert m.add_dummy_prefix and m.escape_whitespaces and not m.has_charsmap


def test_viterbi_picks_best_scoring_segmentation():
    c = _codec()
    # "hello world" → "▁hello▁world": [▁hello, ▁world] (-2.5) beats
    # [▁, hello, ▁world] (-6.5) and every char-level path.
    assert _ids(c, "hello world") == [3, 4]
    # No-space continuation: "▁helloworld" → [▁hello, wor, ld] (-9.5) vs
    # [▁hello, world]? "world" piece has no ▁... "helloworld" after "▁hello"
    # leaves "world" (-2.5): total -3.5 — Viterbi must find it.
    assert _ids(c, "helloworld") == [3, 6]


def test_dummy_prefix_and_whitespace_collapse():
    c = _codec()
    # remove_extra_whitespaces collapses runs and strips edges before ▁-escaping.
    assert _ids(c, "  hello   world  ") == [3, 4]
    c2 = _codec(add_dummy_prefix=False)
    # Without the dummy prefix, "hello world" starts with the bare piece.
    assert _ids(c2, "hello world") == [5, 4]
    c3 = _codec(remove_extra_whitespaces=False, add_dummy_prefix=False)
    # "hello  world" keeps both spaces: hello ▁ ▁world
    assert _ids(c3, "hello  world") == [5, 7, 4]


def test_control_pieces_do_not_match_surface_text():
    c = _codec(add_dummy_prefix=False)
    ids = _ids(c, "<s>")
    assert 1 not in ids and 2 not in ids  # control ids never from raw text


def test_unknown_chars_without_byte_fallback_use_unk():
    c = _codec(add_dummy_prefix=False)
    assert _ids(c, "hexllo") == [8, 0, 9]  # he <unk:x> llo
    # decode renders the unk surface
    assert c.decode([8, 0, 9]) == "he ⁇ llo"
    # contiguous unknown characters merge into ONE unk token (wheel parity,
    # unigram_model.cc — code-review round 5 finding)
    assert _ids(c, "hexyzllo") == [8, 0, 9]


def test_byte_fallback_expands_unknown_chars():
    pieces = list(_BASE_PIECES) + [(f"<0x{i:02X}>", -10.0, spc.BYTE) for i in range(256)]
    c = _codec(pieces, byte_fallback=True, add_dummy_prefix=False)
    ids = _ids(c, "héllo")
    byte0 = len(_BASE_PIECES)
    # "é" is 2 UTF-8 bytes: 0xC3 0xA9 → two byte pieces between "h" and "llo"
    assert ids == [12, byte0 + 0xC3, byte0 + 0xA9, 9]
    assert c.decode(ids) == "héllo"


def test_decode_roundtrip_and_specials():
    c = _codec()
    ids = c.encode("hello world")
    assert c.decode([c.bos_id()] + ids + [c.eos_id()]) == "hello world"
    assert c.decode([]) == ""
    # newline piece survives the roundtrip (identity normalizer keeps \n)
    ids_nl = c.encode("hello\nworld")
    assert c.decode(ids_nl) == "hello\nworld"


def test_api_surface():
    c = _codec()
    assert c.vocab_size() == len(_BASE_PIECES)
    assert (c.bos_id(), c.eos_id(), c.unk_id(), c.pad_id()) == (1, 2, 0, -1)
    assert c.id_to_piece(3) == "▁hello"
    assert c.piece_to_id("▁hello") == 3
    assert c.piece_to_id("<s>") == 1  # non-matchable pieces found by scan
    assert c.piece_to_id("zzz") == c.unk_id()


def test_word_models_and_corrupt_charsmaps_raise():
    with pytest.raises(NotImplementedError, match="unigram/BPE"):
        _codec(model_type=3)  # WORD models need the wheel
    with pytest.raises(ValueError, match="charsmap"):
        _codec(charsmap=b"\x01\x02\x03\x04")  # truncated/garbage trie blob


def test_tokenizer_codec_uses_pure_python_without_wheel(tmp_path, monkeypatch):
    """tokenizer.SentencePieceCodec must resolve the REAL model file without the
    wheel, and PaligemmaTokenizer must then produce ids from it (not the hash
    fallback)."""
    path = tmp_path / "toy_tokenizer.model"
    path.write_bytes(build_model(_BASE_PIECES))
    codec = tok.SentencePieceCodec(str(path))
    ids = codec.encode("hello world", add_bos=True)
    assert ids == [1, 3, 4]  # bos from trainer_spec, then the Viterbi pieces
    assert codec.decode(ids) == "hello world"
    assert codec.vocab_size() == len(_BASE_PIECES)

    monkeypatch.setenv("KAI0_PALIGEMMA_TOKENIZER", str(path))
    pal = tok.PaligemmaTokenizer(max_len=8)
    assert isinstance(pal._codec, tok.SentencePieceCodec)
    tokens, mask = pal.tokenize("hello world")
    assert tokens[0] == 1 and int(mask.sum()) >= 3

    # a typo'd backend is a CONFIG error: it must hard-fail the codec factory,
    # not degrade to the checkpoint-incompatible hash fallback
    monkeypatch.setenv("KAI0_SP_BACKEND", "sentencepice")
    with pytest.raises(tok.UnknownBackendError):
        tok._default_text_codec()


def test_cross_check_against_real_wheel():
    """On hosts that have the sentencepiece wheel, every text must produce the
    SAME ids through the pure-Python codec (skipped where the wheel is absent —
    this is the cheap half of scripts/validate_tokenizer.py)."""
    for kw in (
        dict(),
        dict(add_dummy_prefix=False),
        dict(remove_extra_whitespaces=False),
    ):
        model = build_model(_BASE_PIECES, **kw)
        wheel = _maybe_wheel(model)
        ours = spc.SentencePieceModel(model)
        for text in ("hello world", "  hello   world ", "helloworld", "hello\nworld",
                     "a b", "wor ld hello", ""):
            assert list(wheel.encode(text)) == ours.encode(text), (kw, text)
            ids = ours.encode(text)
            assert wheel.decode(ids) == ours.decode(ids), (kw, text)


def test_cross_check_byte_fallback_against_real_wheel():
    pieces = list(_BASE_PIECES) + [(f"<0x{i:02X}>", -10.0, spc.BYTE) for i in range(256)]
    model = build_model(pieces, byte_fallback=True)
    wheel = _maybe_wheel(model)
    ours = spc.SentencePieceModel(model)
    for text in ("héllo wörld", "hello 日本語", "a\x00b"):
        assert list(wheel.encode(text)) == ours.encode(text), text


def test_digit_heavy_state_strings_stay_stable():
    """The π₀.₅ prompt embeds 256-bin state integers; a vocab with digit pieces
    must segment them deterministically and roundtrip."""
    pieces = list(_BASE_PIECES) + [(str(d), -5.0, None) for d in range(10)]
    c = spc.SentencePieceModel(build_model(pieces))
    state = np.asarray([0.0, -1.0, 0.99])
    bins = np.digitize(state, bins=np.linspace(-1, 1, 257)[:-1]) - 1
    text = " ".join(map(str, bins))
    ids = c.encode(text)
    assert c.decode(ids) == text


_BPE_PIECES = [
    ("<unk>", 0.0, spc.UNKNOWN),
    ("<s>", 0.0, spc.CONTROL),
    ("</s>", 0.0, spc.CONTROL),
    ("a", -10.0, None),
    ("b", -10.0, None),
    ("c", -10.0, None),
    ("▁", -10.5, None),
    ("ab", -1.0, None),
    ("bc", -0.5, None),
    ("abc", -3.0, None),
    ("▁a", -2.0, None),
]


def test_bpe_merge_order_follows_scores():
    """sentencepiece BPE: merge the highest-scoring pair first (bpe_model.cc).
    'abc' → bc (-0.5) wins the first merge over ab (-1.0); then a+bc = abc."""
    c = spc.SentencePieceModel(
        build_model(_BPE_PIECES, model_type=2, add_dummy_prefix=False)
    )
    assert _ids(c, "abc") == [9]
    assert _ids(c, "abcb") == [9, 4]  # leftover 'b' single piece
    assert c.decode(_ids(c, "abc")) == "abc"
    # dummy prefix composes: "▁a" merges, rest unchanged
    c2 = spc.SentencePieceModel(build_model(_BPE_PIECES, model_type=2))
    assert _ids(c2, "a bc") == [10, 6, 8]  # ▁a ▁ bc


def test_bpe_byte_fallback_for_oov_chars():
    pieces = list(_BPE_PIECES) + [(f"<0x{i:02X}>", -12.0, spc.BYTE) for i in range(256)]
    c = spc.SentencePieceModel(
        build_model(pieces, model_type=2, byte_fallback=True, add_dummy_prefix=False)
    )
    byte0 = len(_BPE_PIECES)
    assert _ids(c, "axc") == [3, byte0 + ord("x"), 5]
    ids = _ids(c, "aéc")
    assert ids == [3, byte0 + 0xC3, byte0 + 0xA9, 5]
    assert c.decode(ids) == "aéc"


def test_bpe_user_defined_pieces_are_atomic():
    """USER_DEFINED pieces seed BPE as frozen whole symbols via a
    longest-prefix match (bpe_model.cc's PrefixMatcher) — never merged with
    neighbours, never split. This is what keeps PaliGemma's 1024 <locXXXX> +
    128 <segXXX> pieces single ids; without it they byte-fallback into
    checkpoint-incompatible sequences."""
    pieces = (
        list(_BPE_PIECES)
        + [("<loc0>", 0.0, spc.USER_DEFINED), ("<loc01>", 0.0, spc.USER_DEFINED)]
        + [(f"<0x{i:02X}>", -12.0, spc.BYTE) for i in range(256)]
    )
    c = spc.SentencePieceModel(
        build_model(pieces, model_type=2, byte_fallback=True, add_dummy_prefix=False)
    )
    loc0, loc01 = len(_BPE_PIECES), len(_BPE_PIECES) + 1
    assert _ids(c, "<loc0>") == [loc0]
    assert _ids(c, "<loc01>") == [loc01]  # longest match wins
    # frozen: neighbours still merge among themselves but never across the UD piece
    assert _ids(c, "a<loc0>bc") == [3, loc0, 8]
    assert c.decode([3, loc0, 8]) == "a<loc0>bc"
    # a partial UD surface is NOT matched — it segments like any other text
    # ('c' is a real piece, the rest byte-fallback)
    byte0 = len(_BPE_PIECES) + 2
    assert _ids(c, "<loc1>") == [byte0 + b for b in b"<lo"] + [5] + [byte0 + b for b in b"1>"]


def test_bpe_unused_pieces_resegment():
    """UNUSED pieces join the merge candidates but re-split into their parts at
    emission (bpe_model.cc rev_merge_) — the hierarchical-merge mechanism that
    lets 'ab' (UNUSED) bridge a+b toward 'abc' (NORMAL) while never itself
    appearing in the output."""
    pieces = [
        ("<unk>", 0.0, spc.UNKNOWN),
        ("<s>", 0.0, spc.CONTROL),
        ("</s>", 0.0, spc.CONTROL),
        ("a", -10.0, None),
        ("b", -10.0, None),
        ("c", -10.0, None),
        ("ab", -0.2, spc.UNUSED),
        ("abc", -3.0, None),
    ]
    c = spc.SentencePieceModel(build_model(pieces, model_type=2, add_dummy_prefix=False))
    # 'ab' merges first (best score) then ab+c → abc (NORMAL): single id
    assert _ids(c, "abc") == [7]
    # a bare 'ab' has nowhere to go: the UNUSED symbol resegments to a, b
    assert _ids(c, "ab") == [3, 4]
    assert c.decode([7]) == "abc"
    # an UNUSED piece seeded DIRECTLY (single char — no recorded merge) emits
    # its own id, matching bpe_model.cc's resegment fallthrough
    c2 = spc.SentencePieceModel(
        build_model(pieces + [("q", -5.0, spc.UNUSED)], model_type=2, add_dummy_prefix=False)
    )
    assert _ids(c2, "aq") == [3, 8]


def test_unigram_user_defined_score_bonus():
    """unigram_model.cc gives USER_DEFINED lattice nodes char_len·max_score −
    0.1 instead of their proto score ("extra bonus to always be selected"):
    with conventional 0.0-scored UD pieces max_score is 0, the node score is
    −0.1, and the UD piece beats any real (log-prob-scored) segmentation of
    the same span — regardless of the proto score attached to it."""
    pieces = [
        ("<unk>", 0.0, spc.UNKNOWN),
        ("<s>", 0.0, spc.CONTROL),
        ("</s>", 0.0, spc.CONTROL),
        ("x", -1.0, None),
        ("y", -1.0, None),
        ("xy", 0.0, spc.USER_DEFINED),
    ]
    kw = dict(add_dummy_prefix=False, escape_whitespaces=False)
    c = spc.SentencePieceModel(build_model(pieces, **kw))
    assert _ids(c, "xy") == [5]
    assert _ids(c, "xyx") == [5, 3]
    # the bonus replaces the proto score: a −8.0 UD piece still beats x+y (−2.0)
    c2 = spc.SentencePieceModel(
        build_model(pieces + [("yx", -8.0, spc.USER_DEFINED)], **kw)
    )
    assert _ids(c2, "yx") == [6]


def test_bpe_cross_check_against_real_wheel():
    """Id-for-id BPE equality with the sentencepiece wheel when importable."""
    for kw in (dict(), dict(add_dummy_prefix=False)):
        pieces = (
            list(_BPE_PIECES)
            + [("<loc0>", 0.0, spc.USER_DEFINED), ("<loc01>", 0.0, spc.USER_DEFINED)]
            + [("cb", -0.3, spc.UNUSED), ("q", -5.0, spc.UNUSED)]
            + [(f"<0x{i:02X}>", -12.0, spc.BYTE) for i in range(256)]
        )
        model = build_model(pieces, model_type=2, byte_fallback=True, **kw)
        wheel = _maybe_wheel(model)
        ours = spc.SentencePieceModel(model)
        for text in (
            "abc", "abcb", "a bc", "axc", "aéc", "ccc ab", "",
            "<loc0>", "a<loc0>bc", "<loc01> ab", "<loc1>", "acb", "cb", "aq",
        ):
            assert list(wheel.encode(text)) == ours.encode(text), (kw, text)


def test_charsmap_longest_match_normalization():
    """Precompiled-charsmap normalization (darts-clone trie): longest prefix
    match wins, replacements land before whitespace handling, unmatched chars
    copy through — the wheel's rule-based (nmt_nfkc-style) normalizer."""
    from _sp_model import build_charsmap

    cm = spc.CharsMap(build_charsmap({"A": "a", "ABC": "X", "ẞ": "ss", "É": "E"}))
    assert cm.normalize("AB") == "aB"       # "A" matches, "B" copies
    assert cm.normalize("ABC") == "X"       # longest match beats the "A" prefix
    assert cm.normalize("ABCA") == "Xa"
    assert cm.normalize("ẞÉz") == "ssEz"    # multi-byte UTF-8 keys
    assert cm.normalize("") == ""
    assert cm.normalize("xyz") == "xyz"     # no rule → identity

    # end-to-end: a charsmap-carrying model now encodes through the rules
    pieces = list(_BASE_PIECES)
    model = build_model(pieces, add_dummy_prefix=False,
                        charsmap=build_charsmap({"H": "h", "W": "w"}))
    c = spc.SentencePieceModel(model)
    assert c.encode("Hello World") == c.encode("hello world") == [5, 4]


def test_charsmap_cross_check_against_real_wheel():
    """The wheel must read our hand-built darts blob identically (skipped
    without the wheel — validates the builder AND the reader against the
    reference darts-clone implementation)."""
    from _sp_model import build_charsmap

    model = build_model(
        list(_BASE_PIECES), add_dummy_prefix=False,
        charsmap=build_charsmap({"H": "h", "W": "w", "ẞ": "ss"}),
    )
    wheel = _maybe_wheel(model)
    ours = spc.SentencePieceModel(model)
    for text in ("Hello World", "ẞ hello", "hello"):
        assert list(wheel.encode(text)) == ours.encode(text), text
