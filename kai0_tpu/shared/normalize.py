"""Normalization statistics: streaming accumulation + norm_stats.json (de)serialization.

Behavioral parity with the reference's ``src/openpi/shared/normalize.py`` (RunningStats
:17-117, JSON io :124-147): streaming mean / mean-of-squares, adaptive 5000-bin
histograms for on-the-fly 1%/99% quantiles, and a JSON format that is byte-layout
compatible with the reference's ``norm_stats.json`` files (pydantic there, plain
dataclass + json here — same structure: ``{"norm_stats": {key: {mean, std, q01, q99}}}``).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np

_NUM_QUANTILE_BINS = 5000


@dataclasses.dataclass
class NormStats:
    mean: np.ndarray
    std: np.ndarray
    q01: np.ndarray | None = None  # 1st percentile
    q99: np.ndarray | None = None  # 99th percentile

    def __post_init__(self):
        self.mean = np.asarray(self.mean)
        self.std = np.asarray(self.std)
        if self.q01 is not None:
            self.q01 = np.asarray(self.q01)
        if self.q99 is not None:
            self.q99 = np.asarray(self.q99)


class RunningStats:
    """Streaming statistics over batches of vectors.

    Matches the reference accumulation order exactly (normalize.py:30-71) so that
    feeding identical batches produces bit-identical statistics: running mean update
    ``mean += (batch_mean - mean) * (n/total)``, adaptive histogram rebinning when the
    observed min/max range grows, and histogram-based quantile extraction.
    """

    def __init__(self):
        self._count = 0
        self._mean: np.ndarray | None = None
        self._mean_of_squares: np.ndarray | None = None
        self._min: np.ndarray | None = None
        self._max: np.ndarray | None = None
        self._histograms: list[np.ndarray] | None = None
        self._bin_edges: list[np.ndarray] | None = None
        self._num_quantile_bins = _NUM_QUANTILE_BINS

    def update(self, batch: np.ndarray) -> None:
        batch = np.asarray(batch).reshape(-1, np.asarray(batch).shape[-1])
        num_elements, vector_length = batch.shape
        if self._count == 0:
            self._mean = np.mean(batch, axis=0)
            self._mean_of_squares = np.mean(batch**2, axis=0)
            self._min = np.min(batch, axis=0)
            self._max = np.max(batch, axis=0)
            self._histograms = [np.zeros(self._num_quantile_bins) for _ in range(vector_length)]
            self._bin_edges = [
                np.linspace(self._min[i] - 1e-10, self._max[i] + 1e-10, self._num_quantile_bins + 1)
                for i in range(vector_length)
            ]
        else:
            if vector_length != self._mean.size:
                raise ValueError("The length of new vectors does not match the initialized vector length.")
            new_max = np.max(batch, axis=0)
            new_min = np.min(batch, axis=0)
            max_changed = np.any(new_max > self._max)
            min_changed = np.any(new_min < self._min)
            self._max = np.maximum(self._max, new_max)
            self._min = np.minimum(self._min, new_min)
            if max_changed or min_changed:
                self._adjust_histograms()

        self._count += num_elements

        batch_mean = np.mean(batch, axis=0)
        batch_mean_of_squares = np.mean(batch**2, axis=0)
        self._mean += (batch_mean - self._mean) * (num_elements / self._count)
        self._mean_of_squares += (batch_mean_of_squares - self._mean_of_squares) * (num_elements / self._count)

        self._update_histograms(batch)

    def get_statistics(self) -> NormStats:
        if self._count < 2:
            raise ValueError("Cannot compute statistics for less than 2 vectors.")
        variance = self._mean_of_squares - self._mean**2
        stddev = np.sqrt(np.maximum(0, variance))
        q01, q99 = self._compute_quantiles([0.01, 0.99])
        return NormStats(mean=self._mean, std=stddev, q01=q01, q99=q99)

    def _adjust_histograms(self) -> None:
        for i in range(len(self._histograms)):
            old_edges = self._bin_edges[i]
            new_edges = np.linspace(self._min[i], self._max[i], self._num_quantile_bins + 1)
            new_hist, _ = np.histogram(old_edges[:-1], bins=new_edges, weights=self._histograms[i])
            self._histograms[i] = new_hist
            self._bin_edges[i] = new_edges

    def _update_histograms(self, batch: np.ndarray) -> None:
        for i in range(batch.shape[1]):
            hist, _ = np.histogram(batch[:, i], bins=self._bin_edges[i])
            self._histograms[i] += hist

    def _compute_quantiles(self, quantiles):
        results = []
        for q in quantiles:
            target_count = q * self._count
            q_values = []
            for hist, edges in zip(self._histograms, self._bin_edges, strict=True):
                cumsum = np.cumsum(hist)
                idx = np.searchsorted(cumsum, target_count)
                q_values.append(edges[idx])
            results.append(np.array(q_values))
        return results


def _stats_to_jsonable(stats: NormStats) -> dict:
    out = {"mean": np.asarray(stats.mean).tolist(), "std": np.asarray(stats.std).tolist()}
    out["q01"] = np.asarray(stats.q01).tolist() if stats.q01 is not None else None
    out["q99"] = np.asarray(stats.q99).tolist() if stats.q99 is not None else None
    return out


def _stats_from_jsonable(d: dict) -> NormStats:
    return NormStats(
        mean=np.asarray(d["mean"]),
        std=np.asarray(d["std"]),
        q01=np.asarray(d["q01"]) if d.get("q01") is not None else None,
        q99=np.asarray(d["q99"]) if d.get("q99") is not None else None,
    )


def serialize_json(norm_stats: dict[str, NormStats]) -> str:
    return json.dumps({"norm_stats": {k: _stats_to_jsonable(v) for k, v in norm_stats.items()}}, indent=2)


def deserialize_json(data: str) -> dict[str, NormStats]:
    parsed = json.loads(data)
    if "norm_stats" not in parsed:
        raise ValueError("norm_stats JSON missing 'norm_stats' key")
    return {k: _stats_from_jsonable(v) for k, v in parsed["norm_stats"].items()}


def save(directory: pathlib.Path | str, norm_stats: dict[str, NormStats]) -> None:
    path = pathlib.Path(directory) / "norm_stats.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(serialize_json(norm_stats))


def load(directory: pathlib.Path | str) -> dict[str, NormStats]:
    path = pathlib.Path(directory) / "norm_stats.json"
    if not path.exists():
        raise FileNotFoundError(f"Norm stats file not found at: {path}")
    return deserialize_json(path.read_text())
