"""Verify the REAL tokenizer codec paths against recorded golden tokenizations.

The offline environment this framework is developed in has neither the
PaliGemma sentencepiece model nor the HF ``physical-intelligence/fast``
processor, so the default codecs are deterministic stand-ins
(``HashWordCodec`` / ``DCTActionCodec`` — see kai0_tpu/models/tokenizer.py).
A user serving a real openpi checkpoint exercises the *real* codec branches
(``SentencePieceCodec``, HF FAST); this script proves those branches on a host
that has the assets:

Record goldens once on a trusted host (e.g. next to a working openpi install,
so the recorded ids ARE the reference's ids):

    KAI0_PALIGEMMA_TOKENIZER=/path/to/paligemma_tokenizer.model \\
        python scripts/validate_tokenizer.py record [--out tests/fixtures/tokenizer_goldens.json]

Check the current implementation against the recorded goldens (run on every
host that has the assets; tests/test_tokenizer_goldens.py runs this check
automatically and skips when assets or goldens are absent):

    KAI0_PALIGEMMA_TOKENIZER=... python scripts/validate_tokenizer.py check

Parity target: reference src/openpi/models/tokenizer.py:24-29 (sentencepiece
encode + BOS) and :136-139 (FAST token mapping into the top of the vocab).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kai0_tpu.models import tokenizer as _tokenizer

DEFAULT_GOLDENS = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "tokenizer_goldens.json"
)

# Deterministic probe inputs: cover prompt cleanup (underscores, newlines,
# casing), π₀ vs π₀.₅ state embedding, bin edges, and a FAST action chunk.
PROBES = {
    "prompts": [
        "pick up the red block",
        "fold_the_tee shirt\nslowly",
        "Transfer   tea from cup",
        # PaliGemma USER_DEFINED pieces (<locXXXX>/<segXXX>): must come out as
        # single ids from BOTH backends (the pure codec seeds them as frozen
        # BPE symbols — a divergence here is checkpoint-incompatible).
        "detect block <loc0012><loc0987> mask <seg045>",
    ],
    "states": [
        [0.0] * 14,
        list(np.round(np.linspace(-1.0, 1.0, 14), 4)),
        list(np.round(np.sin(np.arange(32) * 0.37), 4)),
    ],
    "action_seed": 7,
}


def _have_sentencepiece() -> bool:
    path = os.environ.get("KAI0_PALIGEMMA_TOKENIZER")
    if not (path and os.path.exists(path)):
        return False
    try:
        _tokenizer.SentencePieceCodec(path)
        return True
    except _tokenizer.UnknownBackendError:
        raise  # typo'd KAI0_SP_BACKEND must fail the run, not skip it
    except Exception as e:  # noqa: BLE001
        print(f"sentencepiece codec unavailable: {e}", file=sys.stderr)
        return False


def _have_fast() -> bool:
    codec = _tokenizer._default_fast_codec("physical-intelligence/fast")
    return not isinstance(codec, _tokenizer.DCTActionCodec)


def compute_tokenizations() -> dict:
    """Tokenize every probe through the REAL codecs (assumes assets present)."""
    out: dict = {"paligemma": [], "fast": []}
    pal = _tokenizer.PaligemmaTokenizer(max_len=64)
    assert isinstance(pal._codec, _tokenizer.SentencePieceCodec), (
        "KAI0_PALIGEMMA_TOKENIZER did not resolve to a sentencepiece codec"
    )
    for prompt in PROBES["prompts"]:
        for state in [None, *PROBES["states"]]:
            tokens, mask = pal.tokenize(prompt, None if state is None else np.asarray(state))
            out["paligemma"].append(
                {
                    "prompt": prompt,
                    "state": state,
                    "tokens": tokens.tolist(),
                    "mask_len": int(mask.sum()),
                }
            )
    if _have_fast():
        fast = _tokenizer.FASTTokenizer(max_len=256)
        rng = np.random.default_rng(PROBES["action_seed"])
        actions = np.round(rng.uniform(-1, 1, size=(50, 14)), 4).astype(np.float32)
        for prompt in PROBES["prompts"]:
            tokens, mask, ar, loss = fast.tokenize(prompt, np.asarray(PROBES["states"][0]), actions)
            rt = fast.extract_actions(tokens, action_horizon=50, action_dim=14)
            out["fast"].append(
                {
                    "prompt": prompt,
                    "tokens": tokens.tolist(),
                    "mask_len": int(mask.sum()),
                    "loss_len": int(loss.sum()),
                    "roundtrip_mae": float(np.abs(rt - actions).mean()),
                }
            )

    # Self-check on the real asset: USER_DEFINED pieces must come out as ONE id
    # (frozen BPE seeds in the pure codec; PrefixMatcher in the wheel). Skipped
    # piece-by-piece when the asset lacks them (non-PaliGemma model).
    sp = pal._codec._sp
    for piece in ("<loc0012>", "<loc0987>", "<seg045>"):
        pid = sp.piece_to_id(piece)
        if pid == sp.unk_id():
            continue
        ids = pal._codec.encode(piece)
        if pid not in ids:
            raise AssertionError(
                f"user-defined piece {piece!r} (id {pid}) did not tokenize atomically: {ids}"
            )
    return out


def record(out_path: str) -> int:
    if not _have_sentencepiece():
        print("record requires KAI0_PALIGEMMA_TOKENIZER pointing at the real model", file=sys.stderr)
        return 2
    goldens = compute_tokenizations()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(goldens, f, indent=1)
    print(
        f"recorded {len(goldens['paligemma'])} paligemma + {len(goldens['fast'])} FAST goldens "
        f"to {out_path}"
    )
    return 0


def check(goldens_path: str) -> int:
    if not _have_sentencepiece():
        print("SKIP: no sentencepiece assets (set KAI0_PALIGEMMA_TOKENIZER)", file=sys.stderr)
        return 3
    if not os.path.exists(goldens_path):
        print(f"SKIP: no goldens at {goldens_path} (run `record` on a trusted host first)", file=sys.stderr)
        return 3
    with open(goldens_path) as f:
        goldens = json.load(f)
    # When the wheel is importable, check BOTH backends against the goldens —
    # the pure-Python codec (KAI0_SP_BACKEND=pure) must match id-for-id. A
    # caller-pinned KAI0_SP_BACKEND means they asked for exactly one backend:
    # honor it with a single pass (and restore it afterwards either way).
    ambient = os.environ.get("KAI0_SP_BACKEND")
    rc = _check_against(goldens)
    if ambient is not None:
        return rc
    try:
        import sentencepiece  # noqa: F401
    except ImportError:
        return rc
    os.environ["KAI0_SP_BACKEND"] = "pure"
    try:
        print("re-checking with the pure-Python sentencepiece codec...", file=sys.stderr)
        rc2 = _check_against(goldens)
    finally:
        del os.environ["KAI0_SP_BACKEND"]
    return rc or rc2


def _check_against(goldens: dict) -> int:
    got = compute_tokenizations()
    failures = 0
    for kind in ("paligemma", "fast"):
        want_list = goldens.get(kind, [])
        got_list = got.get(kind, [])
        if kind == "fast" and want_list and not got_list:
            print("SKIP fast: goldens exist but the HF FAST processor is absent here", file=sys.stderr)
            continue
        if not want_list and got_list:
            # Goldens recorded on a host without this codec; nothing to compare.
            print(
                f"SKIP {kind}: goldens were recorded without this codec — "
                f"re-run `record` on an asset-equipped host to cover it",
                file=sys.stderr,
            )
            continue
        if len(want_list) != len(got_list):
            failures += 1
            print(
                f"MISMATCH {kind}: {len(want_list)} recorded goldens vs "
                f"{len(got_list)} current probes — stale goldens or changed "
                f"PROBES; re-run `record` on a trusted host"
            )
            continue
        for want, have in zip(want_list, got_list, strict=True):
            keys = [k for k in want if k != "roundtrip_mae"]
            for k in keys:
                if want[k] != have[k]:
                    failures += 1
                    print(f"MISMATCH {kind} {want.get('prompt')!r} field {k}:\n  want {want[k]}\n  got  {have[k]}")
            if "roundtrip_mae" in want and abs(want["roundtrip_mae"] - have["roundtrip_mae"]) > 1e-4:
                failures += 1
                print(f"MISMATCH {kind} roundtrip_mae: want {want['roundtrip_mae']} got {have['roundtrip_mae']}")
    if failures:
        print(f"FAIL: {failures} golden mismatches")
        return 1
    print("OK: all goldens match the real codec paths")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("mode", choices=["record", "check"])
    ap.add_argument("--out", default=DEFAULT_GOLDENS, help="goldens JSON path")
    args = ap.parse_args()
    return record(args.out) if args.mode == "record" else check(args.out)


if __name__ == "__main__":
    sys.exit(main())
