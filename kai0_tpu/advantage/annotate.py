"""Annotate a LeRobot dataset with predicted per-frame advantages.

Library form of the reference ``stage_advantage/annotation/eval.py``: per-episode
loop over the dataset, batched estimator inference over the three camera videos, and
output parquets with appended ``relative_advantage`` / ``absolute_value`` /
``absolute_advantage`` columns written to ``data_<tag>/`` alongside the original
``data/`` (:107-124, :161-224). Swap ``data_<tag>`` in for ``data`` (or point
``info.json``'s ``data_path`` at it) to train on the annotated copy.
"""

from __future__ import annotations

import logging
import pathlib

from kai0_tpu.advantage.evaluator import SimpleValueEvaluator
from kai0_tpu.data import lerobot_meta as _meta

logger = logging.getLogger(__name__)

ADVANTAGE_COLS = ("relative_advantage", "absolute_value", "absolute_advantage")


def edit_parquet_file(src_parquet: pathlib.Path, output_path: pathlib.Path, results: list[dict]) -> None:
    """Append the predicted advantage columns to a copy of the source parquet."""
    import pandas as pd

    df = pd.read_parquet(src_parquet)
    res = pd.DataFrame(results)
    if len(res) != len(df):
        raise ValueError(f"{src_parquet}: {len(res)} results for {len(df)} frames")
    for col in ADVANTAGE_COLS:
        if col not in df.columns and col in res.columns:
            df[col] = res[col].to_numpy()
    output_path.parent.mkdir(parents=True, exist_ok=True)
    df.to_parquet(output_path, index=False)


def annotate_dataset(
    evaluator: SimpleValueEvaluator,
    repo_root: pathlib.Path | str,
    *,
    prompt: str,
    output_tag: str,
    cameras: tuple[str, str, str] = ("top_head", "hand_left", "hand_right"),
    mode: str = "2timesteps",
    relative_interval: int = 50,
    batch_size: int | None = None,
    overwrite: bool = False,
) -> list[pathlib.Path]:
    """Run the evaluator over every episode; returns the written parquet paths."""
    meta = _meta.LeRobotMetadata.load(repo_root)
    repo_root = pathlib.Path(repo_root)
    written = []
    for ep in meta.episodes:
        i = ep["episode_index"]
        parquet_file = meta.data_path(i)
        if not parquet_file.exists():
            logger.warning(f"Parquet {parquet_file} not found, skipping")
            continue
        video_paths = [meta.video_path(i, f"observation.images.{cam}") for cam in cameras]
        if not all(p.exists() for p in video_paths):
            # Some repos key videos without the observation.images prefix.
            video_paths = [meta.video_path(i, cam) for cam in cameras]
        if not all(p.exists() for p in video_paths):
            logger.warning(f"Missing video file(s) for episode {i}, skipping")
            continue

        output_path = repo_root / f"data_{output_tag}" / parquet_file.relative_to(repo_root / "data")
        if output_path.exists() and not overwrite:
            logger.info(f"Output {output_path} exists, skipping")
            continue

        if mode == "1timestep":
            results = evaluator.evaluate_video_1timestep_advantage(
                video_paths, prompt, batch_size=batch_size
            )
        else:
            results = evaluator.evaluate_video_2timesteps_advantages(
                video_paths, prompt, batch_size=batch_size, relative_interval=relative_interval
            )
        edit_parquet_file(parquet_file, output_path, results)
        written.append(output_path)
    return written
