"""Policy runtime: transform chains around a jitted ``sample_actions``.

Behavioral parity with reference ``src/openpi/policies/policy.py``: ``infer`` copies
the observation, applies input transforms on host (resize/tokenize/normalize),
batches and moves to device, samples an action chunk, unbatches, applies output
transforms, and reports ``policy_timing.infer_ms``. RTC kwargs
(``prev_action_chunk``/``inference_delay``/``execute_horizon``) pass through from the
observation as traced arrays so changing them never recompiles (reference
policy.py:85-90).

TPU-native deviations: the model is functional (config + params pytree), the jitted
sampler takes params explicitly (no weight constants baked into the executable), and
``warmup()`` pre-compiles the sampler before serving traffic so the first request
doesn't pay the multi-minute jit cost (reference §3.2 note).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import pathlib
import time
from collections.abc import Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kai0_tpu import transforms as _transforms
from kai0_tpu.models import model as _model
from kai0_tpu.parallel import sharding as _sharding

logger = logging.getLogger("kai0_tpu")

# sample_actions kwargs that are compile-time constants.
_STATIC_SAMPLE_KWARGS = ("num_steps", "prefix_attention_schedule", "max_guidance_weight")


class Policy:
    def __init__(
        self,
        model_config,
        params: dict,
        *,
        rng: jax.Array | None = None,
        transforms: Sequence[_transforms.DataTransformFn] = (),
        output_transforms: Sequence[_transforms.DataTransformFn] = (),
        sample_kwargs: dict[str, Any] | None = None,
        metadata: dict[str, Any] | None = None,
        prompt_buckets: Sequence[int] | None = None,
        mesh: jax.sharding.Mesh | None = None,
    ):
        self._model_config = model_config
        if mesh is not None:
            # Multi-chip serving (TPU addition): FSDP-shard the params over the mesh
            # and let GSPMD insert the collectives. Batch-1 sampling is HBM-bandwidth
            # bound, so N chips stream the weights ~N× faster; activations stay
            # replicated (batch 1 cannot be data-sharded).
            params = jax.device_put(params, _sharding.fsdp_sharding(params, mesh))
        self._params = params
        self._input_transform = _transforms.compose(transforms)
        self._output_transform = _transforms.compose(output_transforms)
        self._sample_kwargs = sample_kwargs or {}
        self._metadata = metadata or {}
        self._rng = rng if rng is not None else jax.random.key(0)
        # Prompt-length bucketing (TPU addition, flow-matching models only): the
        # tokenizer right-pads to max_token_len, but positions are cumsum(mask)-1 and
        # padding is masked out of attention, so trimming trailing padding to the
        # smallest bucket >= the actual prompt length is numerically equivalent while
        # shrinking the prefill sequence (968 -> 768+bucket tokens) and the KV cache
        # every denoise step reads. One compiled program per bucket (jit shape cache).
        self._prompt_buckets = tuple(sorted(prompt_buckets)) if prompt_buckets else None

        def sample(params, sample_rng, observation, **kwargs):
            return model_config.sample_actions(params, sample_rng, observation, **kwargs)

        self._sample_actions = jax.jit(sample, static_argnames=_STATIC_SAMPLE_KWARGS)

    @property
    def metadata(self) -> dict[str, Any]:
        return self._metadata

    @property
    def model_config(self):
        return self._model_config

    def infer(self, obs: dict, *, noise: np.ndarray | None = None) -> dict:
        t_start = time.monotonic()
        # Copy: transforms may modify inputs in place.
        inputs = jax.tree.map(lambda x: x, obs)
        inputs = self._input_transform(inputs)
        if self._prompt_buckets and "tokenized_prompt" in inputs and "token_ar_mask" not in inputs:
            # FAST decode writes generated tokens past the prompt into an aligned
            # cache, so bucketing applies only to the flow-matching models (no
            # token_ar_mask), where trailing prompt padding is inert.
            inputs = _trim_prompt_to_bucket(inputs, self._prompt_buckets)
        t_staged = time.monotonic()
        inputs = jax.tree.map(lambda x: jnp.asarray(x)[np.newaxis, ...], inputs)
        self._rng, sample_rng = jax.random.split(self._rng)

        sample_kwargs = dict(self._sample_kwargs)
        for key in ("prev_action_chunk", "inference_delay", "execute_horizon"):
            if key in obs:
                sample_kwargs[key] = obs[key]
        if noise is not None:
            noise = jnp.asarray(noise)
            if noise.ndim == 2:
                noise = noise[None, ...]
            sample_kwargs["noise"] = noise

        observation = _model.Observation.from_dict(inputs)
        start_time = time.monotonic()
        actions = self._sample_actions(self._params, sample_rng, observation, **sample_kwargs)
        outputs = {"state": inputs["state"], "actions": actions}
        outputs = jax.tree.map(lambda x: np.asarray(x[0, ...]), outputs)
        t_fetched = time.monotonic()
        model_time = t_fetched - start_time

        outputs = self._output_transform(outputs)
        t_end = time.monotonic()
        # infer_ms keeps the reference's semantics (model call incl. device
        # fetch, reference policy.py:119-121). transform_ms is the PURE
        # host-side transform chain (numpy resize/tokenize/normalize + output
        # unnormalize); stage_ms (host→device staging) is separate because over
        # a tunneled TPU it is RPC-dominated while co-located it is ~µs — the
        # co-located p50 composes as transform_ms + device-side ms/chunk +
        # websocket overhead (PERF.md "Serving latency" round 3).
        outputs["policy_timing"] = {
            "infer_ms": model_time * 1000,
            "transform_ms": ((t_staged - t_start) + (t_end - t_fetched)) * 1000,
            "stage_ms": (start_time - t_staged) * 1000,
        }
        return outputs

    def infer_batch(
        self,
        obs_list: Sequence[dict],
        *,
        noise: np.ndarray | None = None,
        pad_to: int | None = None,
    ) -> list[dict]:
        """Run one batched ``sample_actions`` over several observations.

        TPU addition (no reference counterpart): batch-1 serving is HBM-bandwidth
        bound — the 3B weight stream costs the same whether it serves 1 or 8
        robots — so coalescing concurrent requests into one device batch
        multiplies multi-client throughput at near-constant latency (PERF.md).
        ``pad_to`` pads the device batch by repeating row 0 (padding outputs are
        discarded) so callers can quantize batch sizes to a few compiled programs;
        RTC kwargs are not supported here (the server dispatches RTC requests solo).
        """
        if not obs_list:
            return []
        for obs in obs_list:
            for key in ("prev_action_chunk", "inference_delay", "execute_horizon"):
                if key in obs:
                    raise ValueError(f"infer_batch does not support RTC kwarg {key!r}; dispatch solo")

        inputs_list = [self._input_transform(jax.tree.map(lambda x: x, obs)) for obs in obs_list]
        if (
            self._prompt_buckets
            and all("tokenized_prompt" in i and "token_ar_mask" not in i for i in inputs_list)
        ):
            # One common bucket for the whole batch: the largest any member needs.
            used = max(_used_prompt_len(i) for i in inputs_list)
            full = inputs_list[0]["tokenized_prompt_mask"].shape[-1]
            bucket = next((b for b in self._prompt_buckets if b >= used), full)
            if bucket < full:
                inputs_list = [
                    {
                        **i,
                        "tokenized_prompt": np.asarray(i["tokenized_prompt"])[..., :bucket],
                        "tokenized_prompt_mask": np.asarray(i["tokenized_prompt_mask"])[..., :bucket],
                    }
                    for i in inputs_list
                ]
        n = len(inputs_list)
        m = max(pad_to, n) if pad_to else n
        batch = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs] + [jnp.asarray(xs[0])] * (m - n)),
            *inputs_list,
        )

        self._rng, sample_rng = jax.random.split(self._rng)
        sample_kwargs = dict(self._sample_kwargs)
        if noise is not None:
            noise = jnp.asarray(noise)
            if noise.ndim == 2:
                noise = jnp.broadcast_to(noise, (m, *noise.shape))
            elif noise.shape[0] != m:
                noise = jnp.concatenate([noise, jnp.broadcast_to(noise[:1], (m - noise.shape[0], *noise.shape[1:]))])
            sample_kwargs["noise"] = noise

        observation = _model.Observation.from_dict(batch)
        start_time = time.monotonic()
        actions = self._sample_actions(self._params, sample_rng, observation, **sample_kwargs)
        stacked = {"state": batch["state"], "actions": actions}
        stacked = jax.tree.map(np.asarray, stacked)
        model_time = time.monotonic() - start_time

        results = []
        for i in range(n):
            outputs = self._output_transform(jax.tree.map(lambda x: x[i], stacked))
            outputs["policy_timing"] = {"infer_ms": model_time * 1000, "batch_size": n}
            results.append(outputs)
        return results

    def reset(self) -> None:
        pass

    def warmup(self, example: dict | None = None) -> float:
        """Compile the sampler on a fake observation; returns warmup seconds."""
        start = time.monotonic()
        done = False
        if example is not None:
            try:
                self.infer(example)
                done = True
            except Exception as e:  # noqa: BLE001 — example/transform mismatch: spec warmup below
                logger.warning(f"Example warmup failed ({e}); falling back to spec warmup")
        if not done:
            observation = self._model_config.fake_obs(1)
            sample_kwargs = dict(self._sample_kwargs)
            self._sample_actions(self._params, jax.random.key(0), observation, **sample_kwargs)
        if self._prompt_buckets:
            # Compile every bucket's program up front so no client request pays a jit.
            obs = self._model_config.fake_obs(1)
            if obs.tokenized_prompt is not None and obs.token_ar_mask is None:
                full = obs.tokenized_prompt.shape[-1]
                for bucket in self._prompt_buckets:
                    if bucket >= full:
                        continue
                    trimmed = dataclasses.replace(
                        obs,
                        tokenized_prompt=obs.tokenized_prompt[:, :bucket],
                        tokenized_prompt_mask=obs.tokenized_prompt_mask[:, :bucket],
                    )
                    self._sample_actions(self._params, jax.random.key(0), trimmed, **dict(self._sample_kwargs))
        elapsed = time.monotonic() - start
        logger.info(f"Policy warmup took {elapsed:.1f}s")
        return elapsed


def _used_prompt_len(inputs: dict) -> int:
    """Number of leading valid prompt tokens (tokenizer right-pads)."""
    valid = np.flatnonzero(np.asarray(inputs["tokenized_prompt_mask"]))
    return int(valid[-1]) + 1 if valid.size else 0


def _trim_prompt_to_bucket(inputs: dict, buckets: tuple[int, ...]) -> dict:
    """Trim trailing prompt padding to the smallest bucket >= the used length.

    Host-side, pre-batching: operates on the unbatched numpy dict produced by the
    input transform chain (tokenizer right-pads, so validity is a prefix).
    """
    mask = np.asarray(inputs["tokenized_prompt_mask"])
    full = mask.shape[-1]
    bucket = next((b for b in buckets if b >= _used_prompt_len(inputs)), full)
    if bucket < full:
        inputs = dict(inputs)
        inputs["tokenized_prompt"] = np.asarray(inputs["tokenized_prompt"])[..., :bucket]
        inputs["tokenized_prompt_mask"] = mask[..., :bucket]
    return inputs


class PolicyRecorder:
    """Records observations/outputs of a wrapped policy to npy files.

    Parity: reference policy.py:129-151.
    """

    def __init__(self, policy, record_dir: str):
        self._policy = policy
        self._record_dir = pathlib.Path(record_dir)
        self._record_dir.mkdir(parents=True, exist_ok=True)
        self._record_step = 0
        logger.info(f"Dumping policy records to: {self._record_dir}")

    @property
    def metadata(self) -> dict:
        return getattr(self._policy, "metadata", {})

    def infer(self, obs: dict) -> dict:
        results = self._policy.infer(obs)
        data = _transforms.flatten_dict({"inputs": obs, "outputs": results})
        output_path = self._record_dir / f"step_{self._record_step}"
        self._record_step += 1
        np.save(output_path, np.asarray(data, dtype=object))
        return results

    def reset(self) -> None:
        self._policy.reset()
