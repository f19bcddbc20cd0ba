"""RLDS-based DROID data pipeline (tf.data), for datasets too large for LeRobot.

TPU-native redesign of the reference ``src/openpi/training/droid_rlds_dataset.py``:
the same semantics — success-episode filter via file path, infinite repeat,
per-frame idle filtering from a JSON range dict, joint-position/velocity action
concat with gripper, random exterior-camera and language-instruction sampling,
action chunking with tail clamping, weighted interleave across datasets, large
shuffle buffer, deferred image decode — but built on plain ``tf.data`` trajectory
transforms instead of ``dlimp`` (not available here), and TF pinned off every
accelerator so it never clobbers JAX's TPU (reference :59).

``tensorflow_datasets`` is only needed to *read* RLDS from disk and is imported
lazily; the transformation pipeline (:func:`build_frame_pipeline`) takes any
trajectory-level ``tf.data.Dataset`` so it is unit-testable with synthetic data.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import logging
import pathlib
from collections.abc import Sequence

logger = logging.getLogger("kai0_tpu")


class DroidActionSpace(enum.Enum):
    JOINT_POSITION = enum.auto()
    JOINT_VELOCITY = enum.auto()


@dataclasses.dataclass(frozen=True)
class RLDSDataset:
    name: str
    version: str
    weight: float
    filter_dict_path: str | None = None


def _tf():
    import tensorflow as tf

    # Keep TF off every accelerator: JAX owns the TPU/GPU (reference :59).
    tf.config.set_visible_devices([], "GPU")
    try:
        tf.config.set_visible_devices([], "TPU")
    except Exception:  # noqa: BLE001 — older TF without a TPU device registry
        pass
    return tf


def make_filter_table(filter_dict_path: str | None):
    """StaticHashTable mapping '<episode-key>--<t>' → keep? (reference :82-113)."""
    tf = _tf()
    if filter_dict_path is None:
        return tf.lookup.StaticHashTable(
            tf.lookup.KeyValueTensorInitializer([""], [True]), default_value=True
        )
    with pathlib.Path(filter_dict_path).open() as f:
        filter_dict = json.load(f)
    logger.info(f"Using filter dictionary with {len(filter_dict)} episodes")
    keys, values = [], []
    for episode_key, ranges in filter_dict.items():
        for start, end in ranges:
            for t in range(start, end):
                keys.append(f"{episode_key}--{t}")
                values.append(True)
    return tf.lookup.StaticHashTable(
        tf.lookup.KeyValueTensorInitializer(keys, values), default_value=False
    )


def restructure_trajectory(traj, *, action_space: DroidActionSpace, filter_table):
    """Reformat one trajectory dict: actions, cameras, instruction, step ids (:115-169)."""
    tf = _tf()
    action_key = (
        "joint_position" if action_space == DroidActionSpace.JOINT_POSITION else "joint_velocity"
    )
    actions = tf.concat(
        (traj["action_dict"][action_key], traj["action_dict"]["gripper_position"]), axis=-1
    )
    # Randomly train on one of the two exterior (left-stereo) cameras.
    exterior_img = tf.cond(
        tf.random.uniform(shape=[]) > 0.5,
        lambda: traj["observation"]["exterior_image_1_left"],
        lambda: traj["observation"]["exterior_image_2_left"],
    )
    wrist_img = traj["observation"]["wrist_image_left"]
    # Randomly sample one of the three annotated instructions.
    instruction = tf.random.shuffle(
        [traj["language_instruction"], traj["language_instruction_2"], traj["language_instruction_3"]]
    )[0]

    traj_len = tf.shape(traj["actions"] if "actions" in traj else actions)[0]
    indices = tf.as_string(tf.range(traj_len))
    step_id = (
        traj["traj_metadata"]["episode_metadata"]["recording_folderpath"]
        + "--"
        + traj["traj_metadata"]["episode_metadata"]["file_path"]
        + "--"
        + indices
    )
    return {
        "actions": actions,
        "observation": {
            "image": exterior_img,
            "wrist_image": wrist_img,
            "joint_position": traj["observation"]["joint_position"],
            "gripper_position": traj["observation"]["gripper_position"],
        },
        "prompt": instruction,
        "step_id": step_id,
        "passes_filter": filter_table.lookup(step_id),
    }


def chunk_actions(traj, action_chunk_size: int):
    """[T, D] → [T, chunk, D] with tail chunks clamped to the last action (:173-192)."""
    tf = _tf()
    traj_len = tf.shape(traj["actions"])[0]
    idx = tf.broadcast_to(tf.range(action_chunk_size)[None], [traj_len, action_chunk_size])
    idx = idx + tf.broadcast_to(tf.range(traj_len)[:, None], [traj_len, action_chunk_size])
    idx = tf.minimum(idx, traj_len - 1)
    traj = dict(traj)
    traj["actions"] = tf.gather(traj["actions"], idx)
    return traj


def _flatten_trajectories(traj_dataset):
    """Trajectory dataset → frame dataset (dlimp ``flatten`` equivalent)."""
    tf = _tf()
    return traj_dataset.flat_map(tf.data.Dataset.from_tensor_slices)


def build_frame_pipeline(
    traj_dataset,
    *,
    action_space: DroidActionSpace = DroidActionSpace.JOINT_POSITION,
    action_chunk_size: int = 16,
    filter_table=None,
    num_parallel_calls=None,
    decode_images: bool = True,
):
    """Trajectory-level tf.data.Dataset → filtered frame dataset of action chunks."""
    tf = _tf()
    npc = num_parallel_calls or tf.data.AUTOTUNE
    if filter_table is None:
        filter_table = make_filter_table(None)

    ds = traj_dataset.map(
        lambda traj: restructure_trajectory(traj, action_space=action_space, filter_table=filter_table),
        num_parallel_calls=npc,
    )
    ds = ds.map(lambda traj: chunk_actions(traj, action_chunk_size), num_parallel_calls=npc)
    ds = _flatten_trajectories(ds)
    ds = ds.filter(lambda frame: frame["passes_filter"])

    def _finalize(frame):
        frame = dict(frame)
        frame.pop("passes_filter")
        if decode_images:
            # RLDS stores encoded images; decode as late as possible (:212-222).
            for key in ("image", "wrist_image"):
                img = frame["observation"][key]
                if img.dtype == tf.string:
                    frame["observation"][key] = tf.io.decode_image(
                        img, expand_animations=False, dtype=tf.uint8
                    )
        return frame

    return ds.map(_finalize, num_parallel_calls=npc)


class DroidRldsDataset:
    """Weighted multi-dataset DROID loader (reference ``DroidRldsDataset`` :36-248)."""

    def __init__(
        self,
        data_dir: str,
        batch_size: int,
        datasets: Sequence[RLDSDataset],
        *,
        shuffle: bool = True,
        action_chunk_size: int = 16,
        action_space: DroidActionSpace = DroidActionSpace.JOINT_POSITION,
        shuffle_buffer_size: int = 250_000,
        num_parallel_reads=None,
        num_parallel_calls=None,
    ):
        tf = _tf()
        try:
            import tensorflow_datasets as tfds
        except ImportError as e:
            raise ImportError(
                "The RLDS DROID data path requires tensorflow_datasets "
                "(pip install tensorflow_datasets); the LeRobot path has no such dependency."
            ) from e

        if abs(sum(d.weight for d in datasets) - 1.0) > 1e-6:
            raise ValueError("Dataset weights must sum to 1.0")

        def prepare(dataset_cfg: RLDSDataset):
            builder = tfds.builder(dataset_cfg.name, data_dir=data_dir, version=dataset_cfg.version)
            ds = builder.as_dataset(
                split="train",
                shuffle_files=shuffle,
                decoders={"steps": tfds.decode.SkipDecoding()},
                read_config=tfds.ReadConfig(
                    num_parallel_calls_for_interleave_files=num_parallel_reads or tf.data.AUTOTUNE
                ),
            )
            # Success-only episodes, identified by file path (:72-77).
            ds = ds.filter(
                lambda traj: tf.strings.regex_full_match(
                    traj["traj_metadata"]["episode_metadata"]["file_path"][0], ".*success.*"
                )
            )
            ds = ds.repeat()
            return build_frame_pipeline(
                ds,
                action_space=action_space,
                action_chunk_size=action_chunk_size,
                filter_table=make_filter_table(dataset_cfg.filter_dict_path),
                num_parallel_calls=num_parallel_calls,
            )

        pipelines = [prepare(d) for d in datasets]
        weights = [d.weight for d in datasets]
        final = (
            tf.data.Dataset.sample_from_datasets(pipelines, weights=weights)
            if len(pipelines) > 1
            else pipelines[0]
        )
        final = final.shuffle(shuffle_buffer_size)
        final = final.batch(batch_size)
        options = tf.data.Options()
        options.autotune.ram_budget = 1  # reference :236 — lowers memory without slowdown
        self.dataset = final.with_options(options)
        self.batch_size = batch_size
        self.shuffle = shuffle

    def __iter__(self):
        yield from self.dataset.as_numpy_iterator()

    def __len__(self):
        # Approximate post-filter sample count for DROID (reference :245-248).
        return 20_000_000
