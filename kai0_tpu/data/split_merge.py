"""Episode-level split and merge of LeRobot datasets.

Library form of the reference's ``scripts/split_lerobot.py`` (shuffled episode
split into ``split_0..N`` full datasets, re-indexed parquets/videos/meta) and
``scripts/merge_lerobot.py`` (concatenate repos with feature-compat checks and
task-table remapping). Both operate at the file level — parquet rows are re-indexed,
videos are copied verbatim — so no video re-encode is needed.

Reference behavior mirrored: ``scripts/split_lerobot.py:27-150`` (renumber episodes
0..n-1, cumulative ``index`` rebase, info totals, episodes_stats index fixup) and
``scripts/merge_lerobot.py:37-56`` (feature compatibility) / :90+ (merge loop).
"""

from __future__ import annotations

import json
import pathlib
import random
import shutil

import numpy as np

from kai0_tpu.data import lerobot_meta as _meta


def _copy_episode_files(
    src_meta: _meta.LeRobotMetadata,
    old_index: int,
    dst_meta_root: pathlib.Path,
    new_index: int,
    new_frame_start: int,
    chunks_size: int,
) -> int:
    """Copy one episode's parquet (re-indexed) + videos; returns its frame count."""
    import pandas as pd

    df = pd.read_parquet(src_meta.data_path(old_index))
    n = len(df)
    if "index" in df.columns:
        df["index"] = np.arange(new_frame_start, new_frame_start + n, dtype=np.int64)
    if "episode_index" in df.columns:
        df["episode_index"] = new_index
    dst_parquet = dst_meta_root / _meta.DEFAULT_DATA_PATH.format(
        episode_chunk=new_index // chunks_size, episode_index=new_index
    )
    dst_parquet.parent.mkdir(parents=True, exist_ok=True)
    df.to_parquet(dst_parquet, index=False)

    for video_key in src_meta.video_keys:
        src_video = src_meta.video_path(old_index, video_key)
        if not src_video.exists():
            continue
        dst_video = dst_meta_root / _meta.DEFAULT_VIDEO_PATH.format(
            episode_chunk=new_index // chunks_size, episode_index=new_index, video_key=video_key
        )
        dst_video.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(src_video, dst_video)
    return n


def _write_subset(
    src_meta: _meta.LeRobotMetadata, dst_root: pathlib.Path, episode_indices: list[int]
) -> _meta.LeRobotMetadata:
    """Write the selected episodes (renumbered 0..n-1 in sorted order) as a full dataset."""
    old_order = sorted(episode_indices)
    chunks_size = src_meta.chunks_size
    dst_root.mkdir(parents=True, exist_ok=True)

    episodes_by_index = {ep["episode_index"]: ep for ep in src_meta.episodes}
    new_episodes = []
    frame_cursor = 0
    for new_index, old_index in enumerate(old_order):
        n = _copy_episode_files(src_meta, old_index, dst_root, new_index, frame_cursor, chunks_size)
        row = dict(episodes_by_index[old_index])
        row["episode_index"] = new_index
        new_episodes.append(row)
        frame_cursor += n

    info = dict(src_meta.info)
    info["total_episodes"] = len(old_order)
    info["total_frames"] = frame_cursor
    info["total_videos"] = len(old_order) * len(src_meta.video_keys)
    info["total_chunks"] = (len(old_order) + chunks_size - 1) // chunks_size if old_order else 0
    info["splits"] = {"train": f"0:{len(old_order)}"}

    dst_meta = _meta.LeRobotMetadata(
        root=dst_root, info=info, episodes=new_episodes, tasks=dict(src_meta.tasks)
    )
    dst_meta.save()

    # episodes_stats.jsonl: keep per-episode stats, rebasing the running frame index
    # (reference split_lerobot.py:62-84).
    stats_path = src_meta.root / "meta" / "episodes_stats.jsonl"
    if stats_path.exists():
        stats = {s["episode_index"]: s for s in _meta.read_jsonl(stats_path)}
        new_stats = []
        cursor = 0
        for new_index, old_index in enumerate(old_order):
            if old_index not in stats:
                continue
            row = json.loads(json.dumps(stats[old_index]))  # deep copy
            row["episode_index"] = new_index
            idx = row.get("stats", {}).get("index")
            if idx is not None:
                count = int(idx["count"][0])
                idx["min"] = [cursor]
                idx["max"] = [cursor + count - 1]
                idx["mean"] = [(2 * cursor + count - 1) / 2]
                idx["std"] = [float(np.std(np.arange(cursor, cursor + count)))]
                cursor += count
            new_stats.append(row)
        _meta.write_jsonl(dst_root / "meta" / "episodes_stats.jsonl", new_stats)

    return dst_meta


def split_dataset(
    source: pathlib.Path | str,
    dst: pathlib.Path | str,
    split_num: int = 4,
    seed: int = 42,
) -> list[pathlib.Path]:
    """Shuffle episodes and split into ``split_num`` disjoint full datasets."""
    src_meta = _meta.LeRobotMetadata.load(source)
    dst = pathlib.Path(dst)
    episode_indices = [ep["episode_index"] for ep in src_meta.episodes]
    rng = random.Random(seed)
    rng.shuffle(episode_indices)
    parts = np.array_split(np.asarray(episode_indices), split_num)
    outputs = []
    for i, part in enumerate(parts):
        out = dst / f"split_{i}"
        _write_subset(src_meta, out, [int(x) for x in part])
        outputs.append(out)
    return outputs


def ensure_features_compatible(
    tgt_info: dict, src_info: dict, src_name: str, *, force: bool = False
) -> list[str]:
    """Check fps and feature schemas match; returns warnings (raises unless force)."""
    warnings = []
    if tgt_info["fps"] != src_info["fps"]:
        msg = f"{src_name}: fps mismatch ({src_info['fps']} vs {tgt_info['fps']})"
        if not force:
            raise ValueError(msg)
        warnings.append(msg)
    tgt_feats, src_feats = tgt_info["features"], src_info["features"]
    for key in sorted(set(tgt_feats) | set(src_feats)):
        if key not in src_feats or key not in tgt_feats:
            msg = f"{src_name}: feature {key!r} present in only one dataset"
            if not force:
                raise ValueError(msg)
            warnings.append(msg)
            continue
        for field in ("dtype", "shape"):
            if list(np.atleast_1d(tgt_feats[key].get(field, []))) != list(
                np.atleast_1d(src_feats[key].get(field, []))
            ):
                msg = f"{src_name}: feature {key!r} {field} mismatch"
                if not force:
                    raise ValueError(msg)
                warnings.append(msg)
    return warnings


def merge_datasets(
    sources: list[pathlib.Path | str],
    dst: pathlib.Path | str,
    *,
    force: bool = False,
) -> _meta.LeRobotMetadata:
    """Concatenate LeRobot repos into one, renumbering episodes/frames/tasks."""
    import pandas as pd

    if not sources:
        raise ValueError("Need at least one source dataset")
    metas = [_meta.LeRobotMetadata.load(s) for s in sources]
    warnings: list[str] = []
    for m in metas[1:]:
        warnings += ensure_features_compatible(metas[0].info, m.info, str(m.root), force=force)
    for w in warnings:
        print(f"WARNING: {w}")

    dst = pathlib.Path(dst)
    dst.mkdir(parents=True, exist_ok=True)
    chunks_size = metas[0].chunks_size

    # Merged task table: union of task strings, first-seen order.
    merged_tasks: dict[str, int] = {}
    for m in metas:
        for _, task in sorted(m.tasks.items()):
            if task not in merged_tasks:
                merged_tasks[task] = len(merged_tasks)

    new_episodes = []
    new_index = 0
    frame_cursor = 0
    for m in metas:
        task_remap = {old: merged_tasks[task] for old, task in m.tasks.items()}
        for ep in m.episodes:
            old_index = ep["episode_index"]
            df = pd.read_parquet(m.data_path(old_index))
            n = len(df)
            if "index" in df.columns:
                df["index"] = np.arange(frame_cursor, frame_cursor + n, dtype=np.int64)
            if "episode_index" in df.columns:
                df["episode_index"] = new_index
            if "task_index" in df.columns:
                df["task_index"] = df["task_index"].map(lambda t: task_remap.get(int(t), int(t)))
            out_parquet = dst / _meta.DEFAULT_DATA_PATH.format(
                episode_chunk=new_index // chunks_size, episode_index=new_index
            )
            out_parquet.parent.mkdir(parents=True, exist_ok=True)
            df.to_parquet(out_parquet, index=False)

            for video_key in m.video_keys:
                src_video = m.video_path(old_index, video_key)
                if not src_video.exists():
                    continue
                out_video = dst / _meta.DEFAULT_VIDEO_PATH.format(
                    episode_chunk=new_index // chunks_size,
                    episode_index=new_index,
                    video_key=video_key,
                )
                out_video.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy(src_video, out_video)

            row = dict(ep)
            row["episode_index"] = new_index
            new_episodes.append(row)
            new_index += 1
            frame_cursor += n

    info = dict(metas[0].info)
    info["total_episodes"] = new_index
    info["total_frames"] = frame_cursor
    info["total_tasks"] = len(merged_tasks)
    info["total_videos"] = new_index * len(metas[0].video_keys)
    info["total_chunks"] = (new_index + chunks_size - 1) // chunks_size if new_index else 0
    info["splits"] = {"train": f"0:{new_index}"}
    info["data_path"] = _meta.DEFAULT_DATA_PATH
    info["video_path"] = _meta.DEFAULT_VIDEO_PATH

    merged = _meta.LeRobotMetadata(
        root=dst,
        info=info,
        episodes=new_episodes,
        tasks={i: t for t, i in merged_tasks.items()},
    )
    merged.save()
    return merged
