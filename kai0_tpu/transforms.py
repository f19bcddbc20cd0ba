"""Data-transform library: the contract between datasets, training, and serving.

Behavioral parity with reference ``src/openpi/transforms.py`` (the exact normalize /
delta / pad / tokenize semantics define the "actions match within 1e-3" fidelity
surface):

- ``Group``/``compose`` (:39-76), ``RepackTransform`` (:79-101),
- ``InjectDefaultPrompt`` (:105-111), ``InsertAdvantageIntoPrompt`` (:113-121),
- ``Normalize``/``Unnormalize`` z-score ``(x-mean)/(std+1e-6)`` and quantile
  ``(x-q01)/(q99-q01+1e-6)*2-1`` (:124-191),
- ``ResizeImages`` (:194-201), ``SubsampleActions`` (:204-210),
- ``DeltaActions``/``AbsoluteActions`` mask-selected relative actions (:213-254),
- ``TokenizePrompt`` (:279-298), ``TokenizeFASTInputs``/``ExtractFASTActions``
  (:301-338), ``PromptFromLeRobotTask`` (:341-356), ``PadStatesAndActions`` (:359-369),
- helpers ``flatten_dict``/``unflatten_dict``/``transform_dict``/``apply_tree``/
  ``pad_to_dim``/``make_bool_mask`` (:372-484).

All transforms operate on unbatched nested dicts of numpy arrays (CPU side).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
import dataclasses
import re
from typing import Protocol, TypeAlias, TypeVar, runtime_checkable

import numpy as np

from kai0_tpu.shared import normalize as _normalize

DataDict: TypeAlias = dict
NormStats: TypeAlias = _normalize.NormStats

T = TypeVar("T")
S = TypeVar("S")


@runtime_checkable
class DataTransformFn(Protocol):
    def __call__(self, data: DataDict) -> DataDict: ...


@dataclasses.dataclass(frozen=True)
class Group:
    """A group of transforms applied around the model (inputs before, outputs after)."""

    inputs: Sequence[DataTransformFn] = ()
    outputs: Sequence[DataTransformFn] = ()

    def push(self, *, inputs: Sequence[DataTransformFn] = (), outputs: Sequence[DataTransformFn] = ()) -> "Group":
        """Append ``inputs`` to the end of input transforms and ``outputs`` to the beginning of output transforms."""
        return Group(inputs=(*self.inputs, *inputs), outputs=(*outputs, *self.outputs))


@dataclasses.dataclass(frozen=True)
class CompositeTransform(DataTransformFn):
    transforms: Sequence[DataTransformFn]

    def __call__(self, data: DataDict) -> DataDict:
        for transform in self.transforms:
            data = transform(data)
        return data


def compose(transforms: Sequence[DataTransformFn]) -> DataTransformFn:
    return CompositeTransform(transforms)


@dataclasses.dataclass(frozen=True)
class RepackTransform(DataTransformFn):
    """Repacks a flat input dictionary into a new structure.

    ``structure`` maps new keys to flattened '/'-separated paths into the old dict:
    ``{"images": {"cam_high": "observation.images.top"}, "state": "observation.state"}``
    """

    structure: dict

    def __call__(self, data: DataDict) -> DataDict:
        flat_item = flatten_dict(data)
        return _map_structure(lambda k: flat_item[k], self.structure)


@dataclasses.dataclass(frozen=True)
class InjectDefaultPrompt(DataTransformFn):
    prompt: str | None

    def __call__(self, data: DataDict) -> DataDict:
        if self.prompt is not None and "prompt" not in data:
            data["prompt"] = np.asarray(self.prompt)
        return data


@dataclasses.dataclass(frozen=True)
class InsertAdvantageIntoPrompt(DataTransformFn):
    """Appends ``, Advantage: {x:.4f}`` to the prompt (Stage Advantage conditioning)."""

    def __call__(self, data: DataDict) -> DataDict:
        if "advantage" not in data:
            raise ValueError(f"advantage is not in data, data_keys: {list(data.keys())}")
        if "prompt" not in data:
            raise ValueError(f"prompt is not in data, data_keys: {list(data.keys())}")
        advantage = data["advantage"]
        prompt = data["prompt"]
        if not isinstance(prompt, str):
            prompt = prompt.item()
        data["prompt"] = prompt + f", Advantage: {float(advantage):.4f}"
        return data


@dataclasses.dataclass(frozen=True)
class Normalize(DataTransformFn):
    norm_stats: dict | None
    # If true, use quantile normalization; otherwise z-score.
    use_quantiles: bool = False
    # If true, raise if a norm-stats key is missing from the data.
    strict: bool = False

    def __post_init__(self):
        if self.norm_stats is not None and self.use_quantiles:
            _assert_quantile_stats(self.norm_stats)

    def __call__(self, data: DataDict) -> DataDict:
        if self.norm_stats is None:
            return data
        return apply_tree(
            data,
            self.norm_stats,
            self._normalize_quantile if self.use_quantiles else self._normalize,
            strict=self.strict,
        )

    def _normalize(self, x, stats: NormStats):
        mean, std = stats.mean[..., : x.shape[-1]], stats.std[..., : x.shape[-1]]
        return (x - mean) / (std + 1e-6)

    def _normalize_quantile(self, x, stats: NormStats):
        assert stats.q01 is not None
        assert stats.q99 is not None
        q01, q99 = stats.q01[..., : x.shape[-1]], stats.q99[..., : x.shape[-1]]
        return (x - q01) / (q99 - q01 + 1e-6) * 2.0 - 1.0


@dataclasses.dataclass(frozen=True)
class Unnormalize(DataTransformFn):
    norm_stats: dict | None
    use_quantiles: bool = False

    def __post_init__(self):
        if self.norm_stats is not None and self.use_quantiles:
            _assert_quantile_stats(self.norm_stats)

    def __call__(self, data: DataDict) -> DataDict:
        if self.norm_stats is None:
            return data
        return apply_tree(
            data,
            self.norm_stats,
            self._unnormalize_quantile if self.use_quantiles else self._unnormalize,
            strict=True,
        )

    def _unnormalize(self, x, stats: NormStats):
        mean = pad_to_dim(stats.mean, x.shape[-1], axis=-1, value=0.0)
        std = pad_to_dim(stats.std, x.shape[-1], axis=-1, value=1.0)
        return x * (std + 1e-6) + mean

    def _unnormalize_quantile(self, x, stats: NormStats):
        assert stats.q01 is not None
        assert stats.q99 is not None
        q01, q99 = stats.q01, stats.q99
        if (dim := q01.shape[-1]) < x.shape[-1]:
            return np.concatenate([(x[..., :dim] + 1.0) / 2.0 * (q99 - q01 + 1e-6) + q01, x[..., dim:]], axis=-1)
        return (x + 1.0) / 2.0 * (q99 - q01 + 1e-6) + q01


@dataclasses.dataclass(frozen=True)
class ResizeImages(DataTransformFn):
    height: int
    width: int

    def __call__(self, data: DataDict) -> DataDict:
        from kai0_tpu.shared import image_tools

        data["image"] = {
            k: image_tools.resize_with_pad_np(np.asarray(v), self.height, self.width)
            for k, v in data["image"].items()
        }
        return data


@dataclasses.dataclass(frozen=True)
class SubsampleActions(DataTransformFn):
    stride: int

    def __call__(self, data: DataDict) -> DataDict:
        data["actions"] = data["actions"][:: self.stride]
        return data


@dataclasses.dataclass(frozen=True)
class DeltaActions(DataTransformFn):
    """Repacks absolute actions into delta action space for mask-selected dims."""

    mask: Sequence[bool] | None

    def __call__(self, data: DataDict) -> DataDict:
        if "actions" not in data or self.mask is None:
            return data
        state, actions = data["state"], data["actions"]
        mask = np.asarray(self.mask)
        dims = mask.shape[-1]
        actions[..., :dims] -= np.expand_dims(np.where(mask, state[..., :dims], 0), axis=-2)
        data["actions"] = actions
        return data


@dataclasses.dataclass(frozen=True)
class AbsoluteActions(DataTransformFn):
    """Repacks delta actions back into absolute action space for mask-selected dims."""

    mask: Sequence[bool] | None

    def __call__(self, data: DataDict) -> DataDict:
        if "actions" not in data or self.mask is None:
            return data
        state, actions = data["state"], data["actions"]
        mask = np.asarray(self.mask)
        dims = mask.shape[-1]
        actions[..., :dims] += np.expand_dims(np.where(mask, state[..., :dims], 0), axis=-2)
        data["actions"] = actions
        return data


@dataclasses.dataclass(frozen=True)
class TokenizePrompt(DataTransformFn):
    tokenizer: object  # PaligemmaTokenizer protocol: .tokenize(prompt, state|None)
    discrete_state_input: bool = False

    def __call__(self, data: DataDict) -> DataDict:
        if (prompt := data.pop("prompt", None)) is None:
            raise ValueError("Prompt is required")
        if self.discrete_state_input:
            if (state := data.get("state", None)) is None:
                raise ValueError("State is required.")
        else:
            state = None
        if not isinstance(prompt, str):
            prompt = prompt.item()
        tokens, token_masks = self.tokenizer.tokenize(prompt, state)
        return {**data, "tokenized_prompt": tokens, "tokenized_prompt_mask": token_masks}


@dataclasses.dataclass(frozen=True)
class TokenizeFASTInputs(DataTransformFn):
    tokenizer: object  # FASTTokenizer protocol

    def __call__(self, data: DataDict) -> DataDict:
        if (prompt := data.pop("prompt", None)) is None:
            raise ValueError("Prompt is required")
        if not isinstance(prompt, str):
            prompt = prompt.item()
        state, actions = data["state"], data.get("actions")
        tokens, token_mask, ar_mask, loss_mask = self.tokenizer.tokenize(prompt, state, actions)
        return {
            **data,
            "tokenized_prompt": tokens,
            "tokenized_prompt_mask": token_mask,
            "token_ar_mask": ar_mask,
            "token_loss_mask": loss_mask,
        }


@dataclasses.dataclass(frozen=True)
class ExtractFASTActions(DataTransformFn):
    tokenizer: object
    action_horizon: int
    action_dim: int

    def __call__(self, data: DataDict) -> DataDict:
        if "actions" not in data:
            return data
        tokens = data.pop("actions")  # for FAST models these are tokens
        actions = self.tokenizer.extract_actions(np.asarray(tokens).astype(np.int32), self.action_horizon, self.action_dim)
        return {**data, "actions": actions}


@dataclasses.dataclass(frozen=True)
class PromptFromLeRobotTask(DataTransformFn):
    """Extracts a prompt from the current LeRobot dataset task (AWBC conditioning hook)."""

    tasks: dict[int, str]

    def __call__(self, data: DataDict) -> DataDict:
        if "task_index" not in data:
            raise ValueError('Cannot extract prompt without "task_index"')
        task_index = int(data["task_index"])
        if (prompt := self.tasks.get(task_index)) is None:
            raise ValueError(f"{task_index=} not found in task mapping: {self.tasks}")
        return {**data, "prompt": prompt}


@dataclasses.dataclass(frozen=True)
class PadStatesAndActions(DataTransformFn):
    """Zero-pads states and actions to the model action dimension."""

    model_action_dim: int

    def __call__(self, data: DataDict) -> DataDict:
        data["state"] = pad_to_dim(data["state"], self.model_action_dim, axis=-1)
        if "actions" in data:
            data["actions"] = pad_to_dim(data["actions"], self.model_action_dim, axis=-1)
        return data


# --------------------------------------------------------------------------------------
# Helpers
# --------------------------------------------------------------------------------------


def flatten_dict(tree: dict, sep: str = "/") -> dict:
    """Flatten a nested dictionary using ``sep`` as the separator."""
    out = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}{sep}{k}" if prefix else str(k))
        else:
            out[prefix] = node

    rec(tree, "")
    return out


def unflatten_dict(tree: dict, sep: str = "/") -> dict:
    """Inverse of ``flatten_dict``."""
    out: dict = {}
    for key, value in tree.items():
        parts = key.split(sep)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def _map_structure(fn: Callable, structure):
    if isinstance(structure, dict):
        return {k: _map_structure(fn, v) for k, v in structure.items()}
    return fn(structure)


def transform_dict(patterns: Mapping[str, str | None], tree: dict) -> dict:
    """Rename/remove keys of a nested dict using (ordered) full-match regex patterns.

    Keys are flattened '/'-paths; values may use backreferences; ``None`` removes the key.
    Only the first matching pattern applies. Parity: reference transforms.py:382-433.
    """
    data = flatten_dict(tree)
    compiled = {re.compile(k): v for k, v in patterns.items()}

    output = {}
    for k in data:
        for pattern, repl in compiled.items():
            if pattern.fullmatch(k):
                new_k = pattern.sub(repl, k, count=1) if repl is not None else None
                break
        else:
            new_k = k
        if new_k is not None:
            if new_k in output:
                raise ValueError(f"Key '{new_k}' already exists in output")
            output[new_k] = data[k]

    names = sorted(output)
    for i in range(len(names) - 1):
        name, next_name = names[i : i + 2]
        if next_name.startswith(name + "/"):
            raise ValueError(f"Leaf '{name}' aliases a node of '{next_name}'")
    return unflatten_dict(output)


def apply_tree(tree: dict, selector: dict, fn: Callable[[T, S], T], *, strict: bool = False) -> dict:
    tree = flatten_dict(tree)
    selector = flatten_dict(selector)

    if strict:
        for k in selector:
            if k not in tree:
                raise ValueError(f"Selector key {k} not found in tree")

    def transform(k: str, v):
        if k in selector:
            return fn(v, selector[k])
        return v

    return unflatten_dict({k: transform(k, v) for k, v in tree.items()})


def pad_to_dim(x: np.ndarray, target_dim: int, axis: int = -1, value: float = 0.0) -> np.ndarray:
    """Pad an array to the target dimension along ``axis`` with ``value``."""
    x = np.asarray(x)
    current_dim = x.shape[axis]
    if current_dim < target_dim:
        pad_width = [(0, 0)] * len(x.shape)
        pad_width[axis] = (0, target_dim - current_dim)
        return np.pad(x, pad_width, constant_values=value)
    return x


def make_bool_mask(*dims: int) -> tuple[bool, ...]:
    """``make_bool_mask(2, -2, 2) == (True, True, False, False, True, True)``."""
    result = []
    for dim in dims:
        if dim > 0:
            result.extend([True] * dim)
        else:
            result.extend([False] * (-dim))
    return tuple(result)


def _assert_quantile_stats(norm_stats) -> None:
    for k, v in flatten_dict(norm_stats).items():
        if v.q01 is None or v.q99 is None:
            raise ValueError(
                f"quantile stats must be provided if use_quantile_norm is True. Key {k} is missing q01 or q99."
            )
