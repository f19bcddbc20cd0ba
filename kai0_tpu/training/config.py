"""Training config registry + CLI.

Parity: reference ``src/openpi/training/config.py`` — frozen-dataclass configs
(``AssetsConfig``, ``DataConfig``, factory classes resolved at run time so norm-stats
load and transform assembly are config-driven), a named-config registry with
uniqueness check and did-you-mean CLI (:1396-1412), and the kai0 additions
(``advantage_estimator``/``split``/``skip_norm_stats``, ``fsdp_devices``).

The robot-specific data config factories live here as in the reference; they build on
the policy transform pairs in ``kai0_tpu/policies``.
"""

from __future__ import annotations

import abc
from collections.abc import Sequence
import dataclasses
import logging
import os
import pathlib
from typing import Any, Protocol

from kai0_tpu import knobs as _knobs
from kai0_tpu import transforms as _transforms
from kai0_tpu.models import model as _model
from kai0_tpu.models import pi0 as pi0_config
from kai0_tpu.models import tokenizer as _tokenizer
from kai0_tpu.ops import quant as _quant
from kai0_tpu.shared import download as _download
from kai0_tpu.shared import normalize as _normalize
from kai0_tpu.training import cli as _cli
from kai0_tpu.training import optimizer as _optimizer
from kai0_tpu.training import weight_loaders

logger = logging.getLogger("kai0_tpu")

ModelType = _model.ModelType


@dataclasses.dataclass(frozen=True)
class AssetsConfig:
    """Location of assets (e.g. norm stats) used to set up the data pipeline.

    Assets are replicated inside the checkpoint under ``assets/<asset_id>``.
    """

    # If not provided, the config assets_dirs is used.
    assets_dir: str | None = None
    # If not provided, the repo id is used.
    asset_id: str | None = None


@dataclasses.dataclass(frozen=True)
class DataConfig:
    # LeRobot repo id. If None, fake data is created.
    repo_id: str | None = None
    # Directory within the assets directory containing the data assets.
    asset_id: str | None = None
    # Precomputed normalization stats. If None, normalization is skipped.
    norm_stats: dict[str, _normalize.NormStats] | None = None

    # dataset-format → common-format repack.
    repack_transforms: _transforms.Group = dataclasses.field(default_factory=_transforms.Group)
    # Robot-specific transforms, applied before normalization.
    data_transforms: _transforms.Group = dataclasses.field(default_factory=_transforms.Group)
    # Model-specific transforms, applied after normalization.
    model_transforms: _transforms.Group = dataclasses.field(default_factory=_transforms.Group)
    # Quantile vs z-score normalization.
    use_quantile_norm: bool = False

    # Keys used by the data loader to build the action sequence (length = action_horizon).
    action_sequence_keys: Sequence[str] = ("actions",)

    # If true, the LeRobot dataset task defines the prompt (AWBC conditioning).
    prompt_from_task: bool = False

    # Optional episode subset (Model Arithmetic splits, advantage train/val).
    episodes: Sequence[int] | None = None

    # Train-time space-mirroring augmentation (kai0_tpu/data/augment_views.py):
    # the dataset view serves every frame plus its horizontally mirrored twin —
    # the offline create_mirror_and_merge pipeline without the disk double or
    # the lossy video re-encode. Dims follow the bimanual [L(7)][R(7)] layout.
    augment_mirror: bool = False
    augment_mirror_dims: tuple[int, int] = (7, 7)
    # Train-time time-scaling (every Nth frame; 1 = off): the offline
    # time_scale_dataset rewrite as a view. For the offline split mode (scale a
    # fraction, merge with the rest) keep using augment/time_scaling.py.
    augment_time_scale: int = 1

    # RLDS path (large-scale DROID training, reference config.py:549-614). When
    # ``rlds_data_dir`` is set the loader streams tf.data RLDS instead of LeRobot.
    rlds_data_dir: str | None = None
    action_space: Any | None = None
    rlds_datasets: Sequence[Any] = ()


class GroupFactory(Protocol):
    def __call__(self, model_config) -> _transforms.Group: ...


@dataclasses.dataclass(frozen=True)
class ModelTransformFactory(GroupFactory):
    """Creates the per-ModelType model transforms (reference config.py:109-166)."""

    default_prompt: str | None = None

    def __call__(self, model_config) -> _transforms.Group:
        mt = model_config.model_type
        if mt in (ModelType.PI0, ModelType.PI0_RTC):
            return _transforms.Group(
                inputs=[
                    _transforms.InjectDefaultPrompt(self.default_prompt),
                    _transforms.ResizeImages(224, 224),
                    _transforms.TokenizePrompt(_tokenizer.PaligemmaTokenizer(model_config.max_token_len)),
                    _transforms.PadStatesAndActions(model_config.action_dim),
                ],
            )
        if mt in (ModelType.PI05, ModelType.PI05_RTC):
            return _transforms.Group(
                inputs=[
                    _transforms.InjectDefaultPrompt(self.default_prompt),
                    _transforms.ResizeImages(224, 224),
                    _transforms.TokenizePrompt(
                        _tokenizer.PaligemmaTokenizer(model_config.max_token_len),
                        discrete_state_input=model_config.discrete_state_input,
                    ),
                    _transforms.PadStatesAndActions(model_config.action_dim),
                ],
            )
        if mt == ModelType.PI0_FAST:
            tokenizer = _tokenizer.FASTTokenizer(model_config.max_token_len)
            return _transforms.Group(
                inputs=[
                    _transforms.InjectDefaultPrompt(self.default_prompt),
                    _transforms.ResizeImages(224, 224),
                    _transforms.TokenizeFASTInputs(tokenizer),
                ],
                outputs=[
                    _transforms.ExtractFASTActions(
                        tokenizer,
                        action_horizon=model_config.action_horizon,
                        action_dim=model_config.action_dim,
                    )
                ],
            )
        raise ValueError(f"Unsupported model type {mt}")


@dataclasses.dataclass(frozen=True)
class DataConfigFactory(abc.ABC):
    repo_id: str = "MISSING"
    assets: AssetsConfig = dataclasses.field(default_factory=AssetsConfig)
    base_config: DataConfig | None = None

    @abc.abstractmethod
    def create(self, assets_dirs: pathlib.Path, model_config) -> DataConfig: ...

    def create_base_config(self, assets_dirs: pathlib.Path, model_config) -> DataConfig:
        repo_id = self.repo_id if self.repo_id != "MISSING" else None
        asset_id = self.assets.asset_id or repo_id
        return dataclasses.replace(
            self.base_config or DataConfig(),
            repo_id=repo_id,
            asset_id=asset_id,
            norm_stats=self._load_norm_stats(pathlib.Path(self.assets.assets_dir or assets_dirs), asset_id),
            use_quantile_norm=model_config.model_type not in (ModelType.PI0, ModelType.PI0_RTC),
        )

    def _load_norm_stats(self, assets_dir: pathlib.Path, asset_id: str | None):
        if asset_id is None:
            return None
        data_assets_dir = str(assets_dir / asset_id)
        try:
            norm_stats = _normalize.load(_download.maybe_download(data_assets_dir))
            logger.info(f"Loaded norm stats from {data_assets_dir}")
            return norm_stats
        except FileNotFoundError:
            logger.info(f"Norm stats not found in {data_assets_dir}, skipping.")
        return None


@dataclasses.dataclass(frozen=True)
class FakeDataConfig(DataConfigFactory):
    repo_id: str = "fake"

    def create(self, assets_dirs: pathlib.Path, model_config) -> DataConfig:
        # Honor base_config overrides (the dotted CLI reaches DataConfig fields
        # through it) — fake data ignores most of them, but e.g. a debug config
        # pointed at a real repo_id must keep its augment/episode settings.
        return dataclasses.replace(self.base_config or DataConfig(), repo_id=self.repo_id)


@dataclasses.dataclass(frozen=True)
class SimpleDataConfig(DataConfigFactory):
    data_transforms: GroupFactory = dataclasses.field(default_factory=lambda: (lambda mc: _transforms.Group()))
    model_transforms: GroupFactory = dataclasses.field(default_factory=ModelTransformFactory)

    def create(self, assets_dirs: pathlib.Path, model_config) -> DataConfig:
        return dataclasses.replace(
            self.create_base_config(assets_dirs, model_config),
            data_transforms=self.data_transforms(model_config),
            model_transforms=self.model_transforms(model_config),
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # Unique config name used to reference this config from the CLI.
    name: str
    project_name: str = "kai0_tpu"
    # Experiment name; names the metadata and checkpoint directories.
    exp_name: str = "MISSING"

    model: Any = dataclasses.field(default_factory=pi0_config.Pi0Config)

    # Optionally loads (possibly partial) weights after model init.
    weight_loader: weight_loaders.WeightLoader = dataclasses.field(default_factory=weight_loaders.NoOpWeightLoader)

    lr_schedule: _optimizer.LRScheduleConfig = dataclasses.field(default_factory=_optimizer.CosineDecaySchedule)
    optimizer: _optimizer.OptimizerConfig = dataclasses.field(default_factory=_optimizer.AdamW)
    ema_decay: float | None = 0.99

    data: DataConfigFactory = dataclasses.field(default_factory=FakeDataConfig)

    assets_base_dir: str = "./assets"
    checkpoint_base_dir: str = "./checkpoints"

    seed: int = 42
    # Global batch size.
    batch_size: int = 32
    num_workers: int = 2
    num_train_steps: int = 30_000

    log_interval: int = 100
    save_interval: int = 1000

    # Stage-advantage / estimator additions (parity: reference config.py:709-717).
    advantage_estimator: bool = False
    is_train: bool = True
    split: str = "all"  # one of ['train', 'val', 'all']
    drop_last: bool = True
    skip_norm_stats: bool = False

    # Existing checkpoints with step % keep_period == 0 are retained.
    keep_period: int | None = 5000

    overwrite: bool = False
    resume: bool = False

    # Metrics logging (JSONL always; wandb when installed and enabled).
    wandb_enabled: bool = True

    # jax.profiler trace capture: at `profile_start_step`, capture `profile_steps`
    # steps to <checkpoint_dir>/profile (view with XProf/TensorBoard). The reference
    # has no profiler integration (SURVEY.md §5); 0 disables.
    profile_start_step: int = 0
    profile_steps: int = 0

    # Metadata passed to the policy server.
    policy_metadata: dict[str, Any] | None = None

    # Quantize frozen base weights to int8 (LoRA fine-tunes only; no-op when nothing
    # is frozen). TPU-native addition: the v5e MXU runs int8 matmuls at 2x bf16 peak
    # and the frozen base never updates, so it is quantized once at init
    # (kai0_tpu/ops/quant.py). Default off — bf16 numerics match the reference.
    # The default is read from KAI0_INT8 at construction; an explicit value wins.
    quantize_frozen: bool = dataclasses.field(default_factory=lambda: _quant.env_flag("KAI0_INT8"))

    # Storage dtype for TRAINABLE params. None keeps the model's init dtype (f32 —
    # exact reference parity). "bfloat16" halves param HBM and switches the train
    # step to stochastically-rounded updates (optimizer.apply_updates_sr) so
    # sub-ulp AdamW steps still accumulate; combined with
    # optimizer.state_dtype="int8" this is what fits a full π₀.₅ fine-tune on a
    # single 16 GB chip (PERF.md round 4).
    param_dtype: str | None = None

    # FSDP sharding degree; >1 shards params across this many devices.
    fsdp_devices: int = 1
    # Tensor-parallel degree (third mesh axis): >1 shards attention heads and FFN
    # hidden dims across this many devices via the name-aware rules in
    # kai0_tpu/parallel/sharding.py. TPU-native addition beyond the reference's
    # 2-axis mesh; 1 keeps the (batch, fsdp) mesh unchanged.
    tp_devices: int = 1
    # Arrays smaller than this are replicated rather than FSDP-sharded. Lowered to 0
    # by the multi-chip dryrun so tiny debug models still exercise param sharding.
    fsdp_min_size_mbytes: int = 4

    # Rematerialization policy for the gemma layer scans (see gemma._remat_policy:
    # nothing | attn | attnres | attn+res | attn+vitmlp | vitmlp | dots | none) and
    # an optional separate policy for the SigLIP tower. None defers to knobs/env;
    # a value set here is authoritative for the config and is what a run's
    # metadata records — reproducible from the config name alone. (Kept as
    # top-level fields for CLI back-compat; equivalent to knobs.remat/remat_vit.)
    remat: str | None = None
    remat_vit: str | None = None
    # Full model/ops knob override set (kai0_tpu.knobs.Knobs): every performance
    # knob as a typed config field, overridable on the CLI by dotted path
    # (``--knobs.int8_ffn=split``). Precedence: env var > this field > default.
    knobs: _knobs.Knobs = dataclasses.field(default_factory=_knobs.Knobs)

    def apply_model_knobs(self) -> dict:
        """Install this config's knob overrides as the process-wide config layer.

        Called once per entry point (train / bench / dryrun / serve) BEFORE any
        tracing. Env vars set by the user win over config values (the CLI
        layer); returns the *effective* non-default mapping, which entry points
        record into run metadata / checkpoint metadata / the bench JSON.
        """
        overrides = self.knobs
        if self.remat is not None and overrides.remat is None:
            overrides = dataclasses.replace(overrides, remat=self.remat)
        if self.remat_vit is not None and overrides.remat_vit is None:
            overrides = dataclasses.replace(overrides, remat_vit=self.remat_vit)
        _knobs.configure(overrides)
        effective = _knobs.as_dict()
        effective["quantize_frozen"] = self.quantize_frozen
        return effective

    @property
    def assets_dirs(self) -> pathlib.Path:
        return (pathlib.Path(self.assets_base_dir) / self.name).resolve()

    @property
    def checkpoint_dir(self) -> pathlib.Path:
        if not self.exp_name or self.exp_name == "MISSING":
            raise ValueError("--exp_name must be set")
        return (pathlib.Path(self.checkpoint_base_dir) / self.name / self.exp_name).resolve()

    def trainable_mask(self, params: dict) -> dict:
        """Bool pytree: True = trainable. Derived from the model's LoRA freeze filter."""
        frozen_fn = self.model.freeze_filter()
        flat = _transforms.flatten_dict(params)
        return _transforms.unflatten_dict({k: not frozen_fn(k) for k in flat})

    def __post_init__(self) -> None:
        if self.resume and self.overwrite:
            raise ValueError("Cannot resume and overwrite at the same time.")


# --------------------------------------------------------------------------------------
# Named configs
# --------------------------------------------------------------------------------------


def _agilex_transforms(model_config) -> _transforms.Group:
    from kai0_tpu.policies import agilex_policy

    return _transforms.Group(
        inputs=[agilex_policy.AgilexInputs(action_dim=model_config.action_dim, model_type=model_config.model_type)],
        outputs=[agilex_policy.AgilexOutputs()],
    )


def _configs() -> list[TrainConfig]:
    from kai0_tpu.training import robot_configs

    debug_model = pi0_config.Pi0Config(
        paligemma_variant="dummy", action_expert_variant="dummy", vision_variant="mu/14", dtype="float32"
    )
    configs = [
        TrainConfig(
            name="debug",
            model=debug_model,
            data=FakeDataConfig(),
            batch_size=2,
            num_train_steps=4,
            save_interval=2,
            keep_period=2,
            log_interval=1,
            num_workers=0,
            wandb_enabled=False,
            ema_decay=None,
        ),
        # Restores the `debug` run's final checkpoint through the weight-loader path
        # (reference config.py:1149-1158; their debug saves at step 9, ours at 3 —
        # the last of num_train_steps=4 zero-indexed steps).
        TrainConfig(
            name="debug_restore",
            model=debug_model,
            data=FakeDataConfig(),
            batch_size=2,
            num_train_steps=4,
            save_interval=2,
            keep_period=2,
            log_interval=1,
            num_workers=0,
            wandb_enabled=False,
            ema_decay=None,
            weight_loader=weight_loaders.CheckpointWeightLoader("./checkpoints/debug/debug/3/params"),
        ),
        TrainConfig(
            name="debug_pi05",
            model=dataclasses.replace(debug_model, pi05=True),
            data=FakeDataConfig(),
            batch_size=2,
            num_train_steps=4,
            save_interval=2,
            keep_period=2,
            log_interval=1,
            num_workers=0,
            wandb_enabled=False,
        ),
        # LoRA-mode debug config: dummy-size experts with LoRA + frozen bf16 base,
        # so the freeze-filter/quantize paths (KAI0_INT8=1) run in seconds on CPU
        # or one chip — incl. the dequantized checkpoint save and requantizing
        # resume (tests/test_quant.py uses the same shape of config).
        TrainConfig(
            name="debug_lora",
            model=dataclasses.replace(
                debug_model,
                pi05=True,
                paligemma_variant="dummy_lora",
                action_expert_variant="dummy_lora",
                dtype="bfloat16",
            ),
            data=FakeDataConfig(),
            batch_size=2,
            num_train_steps=4,
            save_interval=2,
            keep_period=2,
            log_interval=1,
            num_workers=0,
            wandb_enabled=False,
            ema_decay=None,
        ),
        # Serving smoke config: debug-size model with the full production transform
        # chain (robot inputs → tokenize/resize/pad), so the serve path is
        # exercisable end-to-end without a 3B checkpoint.
        TrainConfig(
            name="debug_serve",
            model=debug_model,
            data=SimpleDataConfig(
                repo_id="fake",
                data_transforms=_agilex_transforms,
            ),
            batch_size=2,
            num_train_steps=4,
            save_interval=2,
            log_interval=1,
            num_workers=0,
            wandb_enabled=False,
            ema_decay=None,
        ),
        TrainConfig(
            name="pi0_base",
            model=pi0_config.Pi0Config(),
            data=FakeDataConfig(),
        ),
        TrainConfig(
            name="pi05_base",
            model=pi0_config.Pi0Config(pi05=True),
            data=FakeDataConfig(),
        ),
    ]
    configs.extend(robot_configs.configs())

    # Baseline config packs (reference config.py:1391-1393).
    from kai0_tpu.training.misc import polaris_config, roboarena_config

    configs.extend(roboarena_config.get_roboarena_configs())
    configs.extend(polaris_config.get_polaris_configs())
    return configs


_CONFIGS_CACHE: dict[str, TrainConfig] | None = None


def registry() -> dict[str, TrainConfig]:
    global _CONFIGS_CACHE
    if _CONFIGS_CACHE is None:
        configs = _configs()
        if len({c.name for c in configs}) != len(configs):
            raise ValueError("Config names must be unique.")
        _CONFIGS_CACHE = {c.name: c for c in configs}
    return _CONFIGS_CACHE


def get_config(config_name: str) -> TrainConfig:
    """Get a config by name with did-you-mean suggestions (reference :1405-1412)."""
    configs = registry()
    if config_name not in configs:
        import difflib

        closest = difflib.get_close_matches(config_name, configs.keys(), n=5, cutoff=0.0)
        raise ValueError(f"Config {config_name!r} not found. Did you mean one of: {closest}?")
    return configs[config_name]


def cli(argv: list[str] | None = None) -> TrainConfig:
    return _cli.cli(registry(), argv)
