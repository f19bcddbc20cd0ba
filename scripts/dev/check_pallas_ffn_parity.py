"""On-chip parity check: LoRA-epilogue Pallas matmul vs the XLA fused-FFN path.

The interpret-mode tests (tests/test_quant.py) tolerate isolated 1-bf16-ulp
flips in ``int8_matmul_lora``: zero-padding the LoRA rank to 128 changes the
f32 reduction order *on CPU*. On the real MXU both paths accumulate across the
same 128-wide contraction (the zero padding contributes exactly 0.0, which is
exact in f32), so the outputs should be bit-identical. Run this ON THE TPU
before relying on ``KAI0_INT8_PALLAS_FFN=1`` for convergence-parity runs:

    python scripts/dev/check_pallas_ffn_parity.py

Exit code 0 = bit-identical on this backend/toolchain; nonzero = elements
differ (report shows how many and the worst bf16-ulp distance).
"""

from __future__ import annotations

import os
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax
import jax.numpy as jnp
import numpy as np

from kai0_tpu.ops import pallas_quant
from kai0_tpu.ops import quant


def _xla_ref(xq, w, sx, sn, u, b):
    base = (
        jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32).astype(jnp.float32)
        * sx
        * sn
    )
    return (base + jnp.dot(u, b).astype(jnp.float32)).astype(jnp.bfloat16)


def main() -> int:
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    ref_fn = jax.jit(_xla_ref)
    lora_fn = jax.jit(pallas_quant.int8_matmul_lora)
    worst = 0
    # The π₀.₅ train sites: gate/up [rows,2048]→[rows,16384] halves, down
    # [rows,16384]→[rows,2048], rank 16; plus an odd-M serve-suffix shape.
    for m, k, n, r in [(13552, 2048, 16384, 16), (13552, 16384, 2048, 16), (51, 2048, 16384, 16)]:
        key = jax.random.key(m + k + n)
        ks = jax.random.split(key, 5)
        xq = jax.random.randint(ks[0], (m, k), -127, 128, jnp.int8)
        w = jax.random.randint(ks[1], (k, n), -127, 128, jnp.int8)
        sx = jax.random.uniform(ks[2], (m, 1), jnp.float32) * 0.1
        sn = jax.random.uniform(ks[3], (n,), jnp.float32) * 0.01
        u = (jax.random.normal(ks[4], (m, r)) * 0.1).astype(jnp.bfloat16)
        b = jax.random.normal(jax.random.fold_in(key, 9), (r, n)).astype(jnp.bfloat16)
        y_p = np.asarray(jax.device_get(lora_fn(xq, w, sx, sn, u, b)), np.float32)
        y_x = np.asarray(jax.device_get(ref_fn(xq, w, sx, sn, u, b)), np.float32)
        diffs = int((y_p != y_x).sum())
        ulp = 0
        if diffs:
            bp = y_p.astype(np.float32).view(np.int32)
            bx = y_x.astype(np.float32).view(np.int32)
            ulp = int(np.abs((bp >> 16) - (bx >> 16)).max())
        print(f"[{m}x{k}x{n} r={r}] mismatched: {diffs}/{y_p.size} (max ~{ulp} bf16 ulp)")
        worst = max(worst, diffs)
    if worst == 0:
        print("PARITY: bit-identical on this backend")
        return 0
    print("PARITY: NOT bit-identical (see counts above)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
