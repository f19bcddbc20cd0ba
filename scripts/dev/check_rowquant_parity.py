"""On-chip parity check: Pallas row_quant vs the jitted XLA _row_quant.

The interpret-mode tests (tests/test_quant.py) prove the kernel's *program* is
bit-identical to ``quant._row_quant``, but interpret mode executes via XLA —
real Mosaic lowering of the f32 divide/round chain can differ by 1 ulp and flip
individual int8 codes. Run this ON THE TPU before relying on
``KAI0_INT8_ROWQUANT=pallas`` for convergence-parity runs:

    python scripts/dev/check_rowquant_parity.py

Exit code 0 = bit-identical on this backend/toolchain (safe to treat the knob
as exact); nonzero = codes differ (report shows how many, by at most one step —
still usually fine for training, but not for exact-parity claims).
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

from kai0_tpu.ops import pallas_rowquant
from kai0_tpu.ops import quant


def main() -> int:
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    xla_rowquant = jax.jit(quant._row_quant)
    worst = 0
    # The hot shapes: FFN activations [rows, 2048/16384] and odd row counts to
    # exercise the masked boundary blocks.
    for m, k in [(11616, 2048), (3872, 16384), (1000, 2048), (37, 4304)]:
        for dtype in (jnp.bfloat16, jnp.float32):
            x = jax.random.normal(jax.random.key(m * k), (m, k), dtype) * 3.0
            q_p, s_p = jax.device_get(pallas_rowquant.row_quant(x))
            q_x, s_x = jax.device_get(xla_rowquant(x))
            flips = int(np.sum(q_p.astype(np.int32) != q_x.astype(np.int32)))
            max_step = int(np.max(np.abs(q_p.astype(np.int32) - q_x.astype(np.int32)))) if flips else 0
            scale_ok = bool(np.array_equal(s_p, s_x))
            print(
                f"[{m}x{k} {np.dtype(dtype).name}] flipped codes: {flips}/{q_p.size}"
                f" (max {max_step} step) scales equal: {scale_ok}"
            )
            worst = max(worst, flips if scale_ok else q_p.size)
    if worst == 0:
        print("PARITY: bit-identical on this backend")
        return 0
    print("PARITY: NOT bit-identical (see counts above)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
