"""Request coalescing for multi-robot serving.

TPU addition (no reference counterpart — the reference serves one request at a
time, ``src/openpi/serving/websocket_policy_server.py``): batch-1 ``sample_actions``
on a 3B model is HBM-bandwidth-bound, so the weight stream costs the same whether
it computes 1 or 8 action chunks. ``BatchingPolicy`` funnels concurrent ``infer``
calls (the websocket server runs each request on an executor thread) into a queue
drained by one dispatcher thread that runs ``Policy.infer_batch`` over whatever is
pending, up to ``max_batch``. Batch sizes are padded up to power-of-two buckets so
at most ``log2(max_batch)+1`` programs are compiled.

Requests carrying RTC kwargs (``prev_action_chunk``/...) bypass the batcher and
run solo — their guidance state is per-client and ``infer_batch`` rejects them.
"""

from __future__ import annotations

import concurrent.futures
import logging
import queue
import threading
import time
from typing import Any

logger = logging.getLogger("kai0_tpu")

_RTC_KEYS = ("prev_action_chunk", "inference_delay", "execute_horizon")


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class BatchingPolicy:
    """Wrap a ``Policy`` so concurrent ``infer`` calls share one device batch.

    ``wait_ms`` optionally holds the first request of a batch briefly so peers
    arriving within the window join it — worth it when many clients poll at a
    similar cadence and device time dominates the wait; default 0 (drain only
    what is already queued, adding zero latency).
    """

    def __init__(self, policy, max_batch: int, *, wait_ms: float = 0.0):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._policy = policy
        self._max_batch = max_batch
        self._wait_s = wait_ms / 1000.0
        self._queue: queue.Queue = queue.Queue()
        self.batch_sizes: list[int] = []  # dispatch log, for tests/monitoring
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True, name="kai0-batcher")
        self._thread.start()

    @property
    def metadata(self) -> dict[str, Any]:
        return getattr(self._policy, "metadata", {})

    @property
    def model_config(self):
        return self._policy.model_config

    def infer(self, obs: dict) -> dict:
        if any(key in obs for key in _RTC_KEYS):
            return self._policy.infer(obs)
        future: concurrent.futures.Future = concurrent.futures.Future()
        self._queue.put((obs, future))
        return future.result()

    def reset(self) -> None:
        self._policy.reset()

    def warmup(self, example: dict | None = None) -> float:
        """Warm the wrapped policy, then compile every batch-bucket program."""
        start = time.monotonic()
        self._policy.warmup(example)
        if example is not None:
            size = 2
            while size <= self._max_batch:
                try:
                    self._policy.infer_batch([example] * 2, pad_to=size)
                except Exception as e:  # noqa: BLE001 — warmup is best-effort (spec/example mismatch)
                    logger.warning(f"Batch-bucket warmup failed at size {size} ({e})")
                    break
                size *= 2
        return time.monotonic() - start

    def close(self) -> None:
        self._queue.put(None)
        self._thread.join(timeout=5)

    def _dispatch_loop(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            group = [item]
            if self._wait_s:
                time.sleep(self._wait_s)
            while len(group) < self._max_batch:
                try:
                    extra = self._queue.get_nowait()
                except queue.Empty:
                    break
                if extra is None:
                    self._finish(group)
                    return
                group.append(extra)
            self._finish(group)

    def _finish(self, group: list) -> None:
        self.batch_sizes.append(len(group))
        try:
            if len(group) == 1:
                results = [self._policy.infer(group[0][0])]
            else:
                results = self._policy.infer_batch(
                    [obs for obs, _ in group], pad_to=_bucket(len(group), self._max_batch)
                )
            for (_, future), result in zip(group, results):
                future.set_result(result)
        except Exception as e:  # noqa: BLE001 — propagate to every waiting client
            for _, future in group:
                if not future.done():
                    future.set_exception(e)
