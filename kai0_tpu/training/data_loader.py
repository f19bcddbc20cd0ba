"""Data loading: datasets, transform application, batching, device placement.

Behavioral counterpart of reference ``src/openpi/training/data_loader.py``:
``Dataset``/``DataLoader`` protocols, ``TransformedDataset``, ``FakeDataset`` from
``inputs_spec``, LeRobot-style chunked action sequences via delta timestamps, the
transform assembly order (repack → data → Normalize → model), and batches delivered as
``(Observation, actions)`` with arrays already placed on device with the data sharding.

TPU-native redesign of the execution: instead of torch worker *processes* +
``jax.make_array_from_process_local_data`` (reference :533), loading runs in a
thread-pool pipeline with double-buffered ``jax.device_put`` into HBM — numpy work
releases the GIL (parquet decode, cv2 ops), and the device transfer of the *next*
batch overlaps the current train step. The reference's "jax.process_count() > 1 is
unsupported" restriction (:479-480) does not exist here: per-process shards are
assembled with ``jax.make_array_from_process_local_data`` when running multi-host.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from collections.abc import Iterator, Sequence
from typing import Protocol, TypeVar, runtime_checkable

import jax
import numpy as np

from kai0_tpu.models import model as _model
from kai0_tpu import transforms as _transforms

T_co = TypeVar("T_co", covariant=True)


@runtime_checkable
class Dataset(Protocol[T_co]):
    def __getitem__(self, index: int) -> T_co: ...

    def __len__(self) -> int: ...


class DataLoader(Protocol):
    def data_config(self) -> "object": ...

    def __iter__(self) -> Iterator[tuple[_model.Observation, np.ndarray]]: ...


# Defined in a jax-free module so worker processes unpickling it stay lightweight.
from kai0_tpu.data.transformed import TransformedDataset  # noqa: E402


class FakeDataset:
    """Random tensors drawn from the model's ``inputs_spec`` (reference :100-128)."""

    def __init__(self, model_config, num_samples: int):
        self._num_samples = num_samples
        self._observation_spec, self._action_spec = model_config.inputs_spec()

    def __getitem__(self, index: int) -> dict:
        rng = np.random.default_rng(index)

        def make_from_spec(spec: jax.ShapeDtypeStruct):
            shape = spec.shape[1:]  # drop batch dim: samples are unbatched
            if spec.dtype == np.bool_:
                return rng.random(size=shape) > 0.5
            if np.issubdtype(spec.dtype, np.integer):
                return rng.integers(0, 1000, size=shape).astype(spec.dtype)
            return rng.standard_normal(size=shape).astype(spec.dtype)

        observation = jax.tree.map(make_from_spec, self._observation_spec)
        action = make_from_spec(self._action_spec)
        return {**observation.to_dict(), "actions": action}

    def __len__(self) -> int:
        return self._num_samples


def transform_stack(data_config, model_config) -> list:
    """The canonical input-transform order (reference :233-281):
    repack → robot data transforms → Normalize → model transforms."""
    norm_stats = None if getattr(data_config, "skip_norm_stats", False) else data_config.norm_stats
    return [
        *data_config.repack_transforms.inputs,
        *data_config.data_transforms.inputs,
        _transforms.Normalize(norm_stats, use_quantiles=data_config.use_quantile_norm),
        *data_config.model_transforms.inputs,
    ]


def create_dataset(data_config, model_config, *, advantage: bool = False, split: str = "all") -> Dataset:
    """Dataset dispatch: fake data, or a LeRobot parquet dataset with action chunking.

    ``advantage=True`` wraps the dataset with random same-episode comparison-frame
    sampling for estimator training; ``split`` selects the per-task 90/10 episode
    split (reference data_loader.py:154-212).
    """
    repo_id = data_config.repo_id
    if repo_id is None or repo_id == "fake":
        # Fail as loudly as the real paths would: a debug/CI run that sets
        # augmentation flags must not silently train unaugmented fake data.
        if getattr(data_config, "augment_time_scale", 1) != 1 or getattr(
            data_config, "augment_mirror", False
        ):
            raise ValueError("train-time augmentation requires a real LeRobot dataset, not fake data")
        return FakeDataset(model_config, num_samples=1024)

    from kai0_tpu.data import lerobot_dataset

    episodes = list(data_config.episodes) if data_config.episodes is not None else None
    dataset = lerobot_dataset.LeRobotDataset(
        repo_id,
        action_horizon=model_config.action_horizon,
        action_sequence_keys=tuple(data_config.action_sequence_keys),
        episodes=episodes,
    )
    if split != "all":
        selected = lerobot_dataset.episodes_split_through_task(dataset, split)
        dataset = lerobot_dataset.LeRobotDataset(
            repo_id,
            action_horizon=model_config.action_horizon,
            action_sequence_keys=tuple(data_config.action_sequence_keys),
            episodes=selected,
        )
    time_scale = getattr(data_config, "augment_time_scale", 1)
    if time_scale < 1:
        raise ValueError(f"augment_time_scale must be >= 1, got {time_scale}")
    if time_scale > 1 or getattr(data_config, "augment_mirror", False):
        if advantage:
            # Estimator training disables augmentation (reference
            # pi0_pytorch.py:487), and the comparison-frame sampler assumes the
            # raw LeRobot episode structure.
            raise ValueError("train-time augmentation is not supported for advantage-estimator datasets")
        from kai0_tpu.data.augment_views import MirroredView, TimeScaledView

        if time_scale > 1:  # must wrap the raw dataset (strided chunk gather)
            dataset = TimeScaledView(dataset, time_scale)
        if data_config.augment_mirror:
            left_dim, right_dim = data_config.augment_mirror_dims
            dataset = MirroredView(dataset, left_dim=left_dim, right_dim=right_dim)
    if advantage:
        from kai0_tpu.data import advantage_dataset

        dataset = advantage_dataset.AdvantageLerobotDataset(dataset)
        inner_tasks = dataset._dataset.tasks
    else:
        inner_tasks = dataset.tasks
    if data_config.prompt_from_task:
        return TransformedDataset(dataset, [_transforms.PromptFromLeRobotTask(inner_tasks)])
    return dataset


@dataclasses.dataclass
class _LoaderState:
    epoch: int = 0


from kai0_tpu.data.transformed import worker_get as _worker_get  # noqa: E402
from kai0_tpu.data.transformed import worker_init as _worker_init  # noqa: E402


class NumpyDataLoader:
    """Prefetching loader producing sharded device batches.

    ``num_workers > 0`` reads items in WORKER PROCESSES (spawn): cv2's FFMPEG
    ``VideoCapture`` holds the GIL during seek/decode, so threads cannot scale
    video-backed datasets — the reference reaches the same conclusion and uses
    torch worker processes (data_loader.py:538-550). ``num_workers == 0`` reads
    in a single producer thread (tests, fake data).
    """

    def __init__(
        self,
        dataset: Dataset,
        *,
        local_batch_size: int,
        sharding: jax.sharding.Sharding,
        shuffle: bool = True,
        num_workers: int = 2,
        seed: int = 0,
        num_batches: int | None = None,
        drop_last: bool = True,
    ):
        if len(dataset) < local_batch_size:
            raise ValueError(f"Local batch size ({local_batch_size}) is larger than the dataset ({len(dataset)}).")
        self._dataset = dataset
        self._batch_size = local_batch_size
        self._sharding = sharding
        self._shuffle = shuffle
        self._num_workers = max(0, num_workers)
        self._seed = seed
        self._num_batches = num_batches
        self._drop_last = drop_last
        self._pool = None

    def _process_pool(self):
        if self._pool is None:
            import multiprocessing
            import os
            import pickle

            ctx = multiprocessing.get_context("spawn")
            # Workers do numpy-only work: force CPU jax and no XLA preallocation
            # in case the dataset module chain imports jax (reference :545-550).
            env_backup = {
                k: os.environ.get(k)
                for k in ("JAX_PLATFORMS", "XLA_PYTHON_CLIENT_PREALLOCATE", "KAI0_DATA_WORKER")
            }
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ["XLA_PYTHON_CLIENT_PREALLOCATE"] = "false"
            os.environ["KAI0_DATA_WORKER"] = "1"
            try:
                self._pool = ctx.Pool(
                    self._num_workers,
                    initializer=_worker_init,
                    initargs=(pickle.dumps(self._dataset),),
                )
            finally:
                for k, v in env_backup.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass

    def _index_stream(self) -> Iterator[np.ndarray]:
        epoch = 0
        while True:
            order = np.arange(len(self._dataset))
            if self._shuffle:
                order = np.random.default_rng(self._seed + epoch).permutation(order)
            limit = (len(order) // self._batch_size) * self._batch_size if self._drop_last else len(order)
            for start in range(0, limit, self._batch_size):
                yield order[start : start + self._batch_size]
            epoch += 1

    def __iter__(self):
        import concurrent.futures

        indices = self._index_stream()
        produced = 0

        proc_pool = self._process_pool() if self._num_workers > 0 else None
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        prefetch: queue.Queue = queue.Queue(maxsize=2)
        stop = threading.Event()

        def collate(batch_indices):
            if proc_pool is not None:
                chunk = max(1, len(batch_indices) // (self._num_workers * 2))
                items = proc_pool.map(_worker_get, [int(i) for i in batch_indices], chunksize=chunk)
            else:
                items = [self._dataset[int(i)] for i in batch_indices]
            return jax.tree.map(lambda *xs: np.stack(xs), *items)

        def put_until_stopped(item) -> bool:
            # A plain blocking put would leave this thread pinned forever (holding
            # device buffers and racing XLA) once the consumer stops reading.
            while not stop.is_set():
                try:
                    prefetch.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch_indices in indices:
                    if stop.is_set():
                        return
                    batch = collate(batch_indices)
                    # Place on device ahead of consumption (overlaps the train step).
                    device_batch = jax.tree.map(
                        lambda x: _make_global_array(x, self._sharding), batch
                    )
                    if not put_until_stopped(device_batch):
                        return
            except Exception as e:  # noqa: BLE001
                put_until_stopped(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        try:
            while self._num_batches is None or produced < self._num_batches:
                item = prefetch.get()
                if isinstance(item, Exception):
                    raise item
                actions = item.pop("actions")
                yield _model.Observation.from_dict(item), actions
                produced += 1
        finally:
            stop.set()
            # Unblock a producer waiting on a full queue, then reap it.
            while True:
                try:
                    prefetch.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=10)
            pool.shutdown(wait=False, cancel_futures=True)


def _make_global_array(x: np.ndarray, sharding: jax.sharding.Sharding):
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.device_put(x, sharding)


class DataLoaderImpl:
    """Binds a data config to a loader (for checkpoint asset saving, reference :597-607)."""

    def __init__(self, data_config, loader):
        self._data_config = data_config
        self._loader = loader

    def data_config(self):
        return self._data_config

    def __iter__(self):
        yield from self._loader


class RLDSLoader:
    """Streams batched RLDS frames through the transform stack onto devices.

    RLDS batches arrive pre-batched from tf.data, so transforms are applied per
    already-batched dict (reference ``IterableTransformedDataset(is_batched=True)``
    + ``RLDSDataLoader``).
    """

    def __init__(self, rlds_dataset, transforms, sharding, num_batches: int | None = None):
        self._dataset = rlds_dataset
        self._transforms = transforms
        self._sharding = sharding
        self._num_batches = num_batches

    def __iter__(self):
        produced = 0
        for batch in self._dataset:
            if self._num_batches is not None and produced >= self._num_batches:
                return
            for transform in self._transforms:
                batch = transform(batch)
            batch = jax.tree.map(lambda x: _make_global_array(np.asarray(x), self._sharding), batch)
            actions = batch.pop("actions")
            yield _model.Observation.from_dict(batch), actions
            produced += 1


def create_rlds_dataset(data_config, action_horizon: int, batch_size: int, *, shuffle: bool = True):
    from kai0_tpu.training import droid_rlds_dataset as _rlds

    return _rlds.DroidRldsDataset(
        data_config.rlds_data_dir,
        batch_size,
        list(data_config.rlds_datasets),
        shuffle=shuffle,
        action_chunk_size=action_horizon,
        action_space=data_config.action_space or _rlds.DroidActionSpace.JOINT_POSITION,
    )


def create_data_loader(
    config,
    *,
    sharding: jax.sharding.Sharding | None = None,
    shuffle: bool = True,
    num_batches: int | None = None,
    skip_norm_stats: bool = False,
) -> DataLoaderImpl:
    """Create the training data loader from a ``TrainConfig`` (reference :284-330)."""
    data_config = config.data.create(config.assets_dirs, config.model)
    if skip_norm_stats or config.skip_norm_stats:
        data_config = dataclasses.replace(data_config, norm_stats=None)

    if sharding is None:
        sharding = jax.sharding.NamedSharding(
            jax.sharding.Mesh(jax.devices(), ("B",)), jax.sharding.PartitionSpec("B")
        )

    if data_config.rlds_data_dir is not None:
        if getattr(data_config, "augment_mirror", False) or getattr(data_config, "augment_time_scale", 1) != 1:
            # The augmentation views wrap random-access LeRobot datasets; the
            # RLDS stream has no equivalent — fail loudly instead of silently
            # training unaugmented.
            raise ValueError("augment_mirror/augment_time_scale are not supported on the RLDS path")
        rlds_dataset = create_rlds_dataset(
            data_config, config.model.action_horizon, config.batch_size, shuffle=shuffle
        )
        loader = RLDSLoader(
            rlds_dataset,
            transform_stack(data_config, config.model),
            sharding,
            num_batches=num_batches,
        )
        return DataLoaderImpl(data_config, loader)

    dataset = create_dataset(
        data_config, config.model, advantage=config.advantage_estimator, split=config.split
    )
    dataset = TransformedDataset(dataset, transform_stack(data_config, config.model))

    if config.batch_size % jax.process_count() != 0:
        raise ValueError(f"Batch size {config.batch_size} must be divisible by process count.")

    loader = NumpyDataLoader(
        dataset,
        local_batch_size=config.batch_size // jax.process_count(),
        sharding=sharding,
        shuffle=shuffle,
        num_workers=config.num_workers,
        seed=config.seed,
        num_batches=num_batches,
        drop_last=config.drop_last,
    )
    return DataLoaderImpl(data_config, loader)
