"""Discretize predicted advantages into task_index labels + prompt table.

Library form of the reference ``stage_advantage/annotation/discretize_advantage.py``:

- binary mode: frames in the top ``threshold``% of advantage get task_index=1
  ("Advantage: positive"), the rest 0 ("Advantage: negative") (:211-253);
- n_slices mode: task_index 0..n−1 by advantage percentile bins (higher → higher);
- staged mode (``stage_nums``>1): each frame's stage comes from its
  ``stage_progress_gt`` ∈ [i/stages, (i+1)/stages), and percentiles are computed
  per stage (:254-318, :60-81);
- rewrites ``meta/tasks.jsonl`` with advantage-suffixed prompts (:178-209).
"""

from __future__ import annotations

import pathlib

import numpy as np

from kai0_tpu.data import lerobot_meta as _meta

STAGE_COL = "stage_progress_gt"


def get_stage_index(stage_progress: float, stage_nums: int) -> int:
    if stage_nums == 1:
        return 0
    idx = int(stage_progress * stage_nums)
    return min(idx, stage_nums - 1)


def _stage_indices(stage_progress: np.ndarray, stage_nums: int) -> np.ndarray:
    if stage_nums == 1:
        return np.zeros(len(stage_progress), dtype=np.int32)
    return np.minimum((np.asarray(stage_progress) * stage_nums).astype(np.int32), stage_nums - 1)


def collect_rewards_by_stage(
    parquet_files: list[pathlib.Path],
    advantage_source: str,
    stage_nums: int,
) -> dict[int, np.ndarray]:
    import pandas as pd

    rewards: dict[int, list[np.ndarray]] = {i: [] for i in range(stage_nums)}
    for path in parquet_files:
        df = pd.read_parquet(path)
        if advantage_source not in df.columns:
            raise ValueError(
                f"{path} has no {advantage_source!r} column — run the annotation step "
                "(stage_advantage/annotation/eval.py) first and point --data-glob at "
                "its data_<tag>/ output."
            )
        vals = df[advantage_source].to_numpy(dtype=np.float32)
        if stage_nums == 1:
            rewards[0].append(vals)
        else:
            if STAGE_COL not in df.columns:
                raise ValueError(f"Column {STAGE_COL!r} required when stage_nums > 1 ({path})")
            stages = _stage_indices(df[STAGE_COL].to_numpy(), stage_nums)
            for s in range(stage_nums):
                rewards[s].append(vals[stages == s])
    return {
        s: (np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.float32))
        for s, chunks in rewards.items()
    }


def reward_statistics(rewards: np.ndarray) -> dict:
    if len(rewards) == 0:
        return {"mean": 0.0, "std": 0.0, "min": 0.0, "max": 0.0, "percentiles": {}}
    pct = list(range(0, 101, 10))
    return {
        "mean": float(np.mean(rewards)),
        "std": float(np.std(rewards)),
        "min": float(np.min(rewards)),
        "max": float(np.max(rewards)),
        "percentiles": dict(zip(pct, np.percentile(rewards, pct).tolist())),
    }


def _assign(
    rewards: np.ndarray,
    stages: np.ndarray,
    *,
    discretion_type: str,
    thresholds: dict[int, float],
    boundaries: dict[int, np.ndarray],
    n_slices: int,
) -> np.ndarray:
    task_index = np.zeros(len(rewards), dtype=np.int32)
    for s in np.unique(stages):
        mask = stages == s
        if discretion_type == "binary":
            task_index[mask] = (rewards[mask] >= thresholds[int(s)]).astype(np.int32)
        elif discretion_type == "n_slices":
            # searchsorted over the lower boundaries: bin i covers [b_i, b_{i+1}).
            b = np.asarray(boundaries[int(s)])
            task_index[mask] = np.clip(np.searchsorted(b, rewards[mask], side="right") - 1, 0, n_slices - 1)
        else:
            raise ValueError(f"Unknown discretion_type: {discretion_type}")
    return task_index


def advantage_task_table(discretion_type: str, n_slices: int, base_prompt: str) -> list[dict]:
    if discretion_type == "binary":
        return [
            {"task_index": 0, "task": f"{base_prompt}, Advantage: negative"},
            {"task_index": 1, "task": f"{base_prompt}, Advantage: positive"},
        ]
    return [{"task_index": i, "task": f"{base_prompt}, Advantage: {i}"} for i in range(n_slices)]


def discretize_dataset(
    data_path: pathlib.Path | str,
    *,
    threshold: float = 70.0,
    discretion_type: str = "binary",
    n_slices: int = 10,
    advantage_source: str = "absolute_advantage",
    stage_nums: int = 1,
    base_prompt: str = "fold the cloth",
    data_glob: str = "data/chunk-*/*.parquet",
    dry_run: bool = False,
) -> dict[int, dict]:
    """Compute per-stage advantage stats; unless dry_run, rewrite task_index + tasks.jsonl.

    Returns the per-stage statistics dict (for logging/tests).
    """
    import pandas as pd

    base = pathlib.Path(data_path)
    parquet_files = sorted(base.glob(data_glob))
    if not parquet_files:
        raise ValueError(f"No parquet files found under {base / data_glob}")

    rewards_by_stage = collect_rewards_by_stage(parquet_files, advantage_source, stage_nums)
    stats = {s: reward_statistics(r) for s, r in rewards_by_stage.items()}

    thresholds: dict[int, float] = {}
    boundaries: dict[int, np.ndarray] = {}
    for s, rewards in rewards_by_stage.items():
        if len(rewards) == 0:
            thresholds[s] = 0.0
            boundaries[s] = np.zeros(n_slices)
            continue
        # Top `threshold`% ⇒ cut at the (100 − threshold) percentile.
        thresholds[s] = float(np.percentile(rewards, 100 - threshold))
        boundaries[s] = np.percentile(rewards, [100 / n_slices * i for i in range(n_slices)])

    if dry_run:
        return stats

    for path in parquet_files:
        df = pd.read_parquet(path)
        vals = df[advantage_source].to_numpy(dtype=np.float32)
        stages = (
            _stage_indices(df[STAGE_COL].to_numpy(), stage_nums)
            if stage_nums > 1
            else np.zeros(len(vals), dtype=np.int32)
        )
        df["task_index"] = _assign(
            vals,
            stages,
            discretion_type=discretion_type,
            thresholds=thresholds,
            boundaries=boundaries,
            n_slices=n_slices,
        )
        df.to_parquet(path, index=False)

    _meta.write_jsonl(
        base / "meta" / "tasks.jsonl", advantage_task_table(discretion_type, n_slices, base_prompt)
    )
    return stats
