"""Synthetic SentencePiece ``.model`` builder (minimal protobuf writer).

The inverse of kai0_tpu/models/sentencepiece_codec.py's reader, shared by
tests that need real-format unigram models without the sentencepiece wheel
(test_sentencepiece_codec.py pins the codec; test_tokenizer.py runs the
prompt/FAST tokenizers through the real-codec path).
"""

import struct

from kai0_tpu.models import sentencepiece_codec as spc

# --------------------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _int_field(field: int, value: int) -> bytes:
    if value < 0:
        value += 1 << 64  # proto int32 negatives are 64-bit two's-complement varints
    return _tag(field, 0) + _varint(value)


def _piece(text: str, score: float, ptype: int | None = None) -> bytes:
    sub = _len_field(1, text.encode()) + _tag(2, 5) + struct.pack("<f", score)
    if ptype is not None:
        sub += _int_field(3, ptype)
    return _len_field(1, sub)


def build_model(
    pieces,
    *,
    model_type: int = 1,
    unk_id: int = 0,
    bos_id: int = 1,
    eos_id: int = 2,
    pad_id: int = -1,
    byte_fallback: bool = False,
    add_dummy_prefix: bool = True,
    remove_extra_whitespaces: bool = True,
    escape_whitespaces: bool = True,
    charsmap: bytes = b"",
) -> bytes:
    """Serialize a ModelProto: ``pieces`` is [(text, score, type|None), ...]."""
    buf = b"".join(_piece(*p) for p in pieces)
    trainer = (
        _int_field(3, model_type)
        + _int_field(4, len(pieces))  # vocab_size
        + _int_field(35, int(byte_fallback))
        + _int_field(40, unk_id)
        + _int_field(41, bos_id)
        + _int_field(42, eos_id)
        + _int_field(43, pad_id)
    )
    normalizer = (
        _len_field(1, b"identity")
        + _len_field(2, charsmap)
        + _int_field(3, int(add_dummy_prefix))
        + _int_field(4, int(remove_extra_whitespaces))
        + _int_field(5, int(escape_whitespaces))
    )
    return buf + _len_field(2, trainer) + _len_field(3, normalizer)


_BASE_PIECES = [
    ("<unk>", 0.0, spc.UNKNOWN),
    ("<s>", 0.0, spc.CONTROL),
    ("</s>", 0.0, spc.CONTROL),
    ("▁hello", -1.0, None),  # None → NORMAL (proto default, field omitted)
    ("▁world", -1.5, None),
    ("hello", -2.0, None),
    ("world", -2.5, None),
    ("▁", -3.0, None),
    ("he", -4.0, None),
    ("llo", -4.5, None),
    ("wor", -4.5, None),
    ("ld", -4.0, None),
    ("h", -8.0, None),
    ("e", -8.0, None),
    ("l", -8.0, None),
    ("o", -8.0, None),
    ("w", -8.0, None),
    ("r", -8.0, None),
    ("d", -8.0, None),
    ("a", -8.0, None),
    ("b", -8.0, None),
    ("\n", -7.0, None),
]




def build_paligemma_like_bpe(vocab_size: int) -> tuple[bytes, int, int]:
    """Full-vocab-size synthetic BPE model shaped like the real PaliGemma
    tokenizer: BPE model_type, byte fallback, 1024 ``<locXXXX>`` + 128
    ``<segXXX>`` USER_DEFINED pieces, UNUSED fill to ``vocab_size``.

    Returns ``(model_bytes, loc0, seg0)`` — the ids of ``<loc0000>`` and
    ``<seg000>``. Shared by test_tokenizer (atomicity through the tokenizer
    stack) and test_tokenizer_goldens (validate_tokenizer record→check flow).
    """
    pieces = [
        ("<pad>", 0.0, spc.CONTROL),
        ("<eos>", 0.0, spc.CONTROL),
        ("<bos>", 0.0, spc.CONTROL),
        ("<unk>", 0.0, spc.UNKNOWN),
    ]
    pieces += [(c, -8.0, None) for c in "abcdefghijklmnopqrstuvwxyz0123456789<>:;,.|▁\n"]
    loc0 = len(pieces)
    pieces += [(f"<loc{i:04d}>", 0.0, spc.USER_DEFINED) for i in range(1024)]
    seg0 = len(pieces)
    pieces += [(f"<seg{i:03d}>", 0.0, spc.USER_DEFINED) for i in range(128)]
    pieces += [(f"<0x{i:02X}>", -12.0, spc.BYTE) for i in range(256)]
    pieces += [(f"<fill{i}>", -20.0, spc.UNUSED) for i in range(vocab_size - len(pieces))]
    model = build_model(
        pieces,
        model_type=2,
        unk_id=3,
        bos_id=2,
        eos_id=1,
        pad_id=0,
        byte_fallback=True,
        add_dummy_prefix=False,
        remove_extra_whitespaces=False,
    )
    return model, loc0, seg0


def build_charsmap(rules: dict[str, str]) -> bytes:
    """Encode normalization rules as a ``precompiled_charsmap`` blob: a
    darts-clone double-array over the UTF-8 source keys plus a NUL-terminated
    replacement blob — the inverse of ``sentencepiece_codec.CharsMap`` (and of
    the wheel's reader, which cross-validates it on asset-equipped hosts)."""
    norm = bytearray()
    values: dict[str, int] = {}
    for src, rep in rules.items():
        values[src] = len(norm)
        norm += rep.encode("utf-8") + b"\0"

    trie: dict = {}
    for src in rules:
        node = trie
        for b in src.encode("utf-8"):
            node = node.setdefault(b, {})
        node[None] = values[src]

    units: dict[int, int] = {}
    used = {0}

    def place(node: dict, pos: int) -> tuple[int, bool]:
        labels = [b for b in node if b is not None]
        slots = ([None] if None in node else []) + labels
        base = 1
        while True:
            needed = [base if s is None else base ^ s for s in slots]
            if all(n not in used and n != 0 for n in needed) and (pos ^ base) < (1 << 21):
                break
            base += 1
        used.update(needed)
        if None in node:
            units[base] = 0x80000000 | node[None]  # value unit
        for b in labels:
            child_pos = base ^ b
            child_off, child_leaf = place(node[b], child_pos)
            units[child_pos] = b | (0x100 if child_leaf else 0) | (child_off << 10)
        return pos ^ base, (None in node)

    root_off, _ = place(trie, 0)
    units[0] = root_off << 10
    arr = [0] * (max(units) + 1)
    for p, u in units.items():
        arr[p] = u
    trie_blob = b"".join(struct.pack("<I", u) for u in arr)
    return struct.pack("<I", len(trie_blob)) + trie_blob + bytes(norm)
