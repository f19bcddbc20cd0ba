"""Serve an action chunk one step at a time.

Parity: reference ``openpi_client/action_chunk_broker.py:10-50`` — a new call to the
wrapped policy happens only when the current chunk is exhausted; per-step fields
(leading dim = chunk size) are sliced at the current step.
"""

from __future__ import annotations

import numpy as np

from kai0_client import base_policy as _base_policy


class ActionChunkBroker(_base_policy.BasePolicy):
    def __init__(self, policy: _base_policy.BasePolicy, action_horizon: int):
        self._policy = policy
        self._action_horizon = action_horizon
        self._cur_step: int = 0
        self._last_results: dict | None = None

    def infer(self, obs: dict) -> dict:
        if self._last_results is None:
            self._last_results = self._policy.infer(obs)
            self._cur_step = 0

        def slicer(x):
            return x[self._cur_step, ...] if isinstance(x, np.ndarray) else x

        results = _map_structure(slicer, self._last_results)
        self._cur_step += 1
        if self._cur_step >= self._action_horizon:
            self._last_results = None
        return results

    def reset(self) -> None:
        self._policy.reset()
        self._last_results = None
        self._cur_step = 0


def _map_structure(fn, obj):
    if isinstance(obj, dict):
        return {k: _map_structure(fn, v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_map_structure(fn, v) for v in obj)
    return fn(obj)
