"""Per-robot data config factories + the named train-config registry.

Parity target: reference ``src/openpi/training/config.py:231-653`` (factories) and
``:761-1394`` (named configs). Config *names* are public CLI surface
(``train.py <name> --exp_name=…``) and match the reference exactly, including the
kai0 task configs (FlattenFold / TeeShirtSort / HangCloth: normal, AWBC, advantage
estimator, RTC inference). The reference's torch-backend advantage configs keep
their historical ``ADVANTAGE_TORCH_*`` names but run on the JAX estimator here.

Placeholder ``<path…>`` repo ids mirror the reference's release convention: users
point them at local datasets/checkpoints via CLI overrides.
"""

from __future__ import annotations

import dataclasses
import pathlib
from collections.abc import Sequence

from kai0_tpu import transforms as _transforms
from kai0_tpu.models import advantage as _advantage_model
from kai0_tpu.models import pi0 as pi0_config
from kai0_tpu.models import pi0_fast as pi0_fast_config
from kai0_tpu.models import pi0_rtc as pi0_rtc_config
from kai0_tpu.policies import agilex_policy, aloha_policy, arx_policy, droid_policy, libero_policy
from kai0_tpu.training import config as _config
from kai0_tpu.training import optimizer as _optimizer
from kai0_tpu.training import weight_loaders

ModelTransformFactory = None  # set lazily to avoid import cycle


def _model_transforms(model_config, default_prompt=None):
    return _config.ModelTransformFactory(default_prompt=default_prompt)(model_config)


# --------------------------------------------------------------------------------------
# Data config factories
# --------------------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LeRobotAlohaDataConfig(_config.DataConfigFactory):
    """Aloha datasets (reference config.py:231-281)."""

    use_delta_joint_actions: bool = True
    default_prompt: str | None = None
    adapt_to_pi: bool = True
    repack_transforms: _transforms.Group = dataclasses.field(
        default_factory=lambda: _transforms.Group(
            inputs=[
                _transforms.RepackTransform(
                    {
                        "images": {"cam_high": "observation.images.top"},
                        "state": "observation.state",
                        "actions": "action",
                    }
                )
            ]
        )
    )
    action_sequence_keys: Sequence[str] = ("action",)

    def create(self, assets_dirs: pathlib.Path, model_config) -> _config.DataConfig:
        data_transforms = _transforms.Group(
            inputs=[aloha_policy.AlohaInputs(adapt_to_pi=self.adapt_to_pi)],
            outputs=[aloha_policy.AlohaOutputs(adapt_to_pi=self.adapt_to_pi)],
        )
        if self.use_delta_joint_actions:
            delta_action_mask = _transforms.make_bool_mask(6, -1, 6, -1)
            data_transforms = data_transforms.push(
                inputs=[_transforms.DeltaActions(delta_action_mask)],
                outputs=[_transforms.AbsoluteActions(delta_action_mask)],
            )
        return dataclasses.replace(
            self.create_base_config(assets_dirs, model_config),
            repack_transforms=self.repack_transforms,
            data_transforms=data_transforms,
            model_transforms=_model_transforms(model_config, self.default_prompt),
            action_sequence_keys=tuple(self.action_sequence_keys),
        )


@dataclasses.dataclass(frozen=True)
class LeRobotLiberoDataConfig(_config.DataConfigFactory):
    """Libero datasets (reference config.py:284-358)."""

    extra_delta_transform: bool = False

    def create(self, assets_dirs: pathlib.Path, model_config) -> _config.DataConfig:
        repack_transforms = _transforms.Group(
            inputs=[
                _transforms.RepackTransform(
                    {
                        "observation/image": "image",
                        "observation/wrist_image": "wrist_image",
                        "observation/state": "state",
                        "actions": "actions",
                        "prompt": "prompt",
                    }
                )
            ]
        )
        data_transforms = _transforms.Group(
            inputs=[libero_policy.LiberoInputs(model_type=model_config.model_type)],
            outputs=[libero_policy.LiberoOutputs()],
        )
        if self.extra_delta_transform:
            delta_action_mask = _transforms.make_bool_mask(6, -1)
            data_transforms = data_transforms.push(
                inputs=[_transforms.DeltaActions(delta_action_mask)],
                outputs=[_transforms.AbsoluteActions(delta_action_mask)],
            )
        return dataclasses.replace(
            self.create_base_config(assets_dirs, model_config),
            repack_transforms=repack_transforms,
            data_transforms=data_transforms,
            model_transforms=_model_transforms(model_config),
        )


def _bimanual_repack(cameras: dict[str, str], *, history: bool = False, extra: dict | None = None):
    images = dict(cameras)
    if history:
        images.update({f"his_-100_{k}": f"his_-100_{v}" for k, v in cameras.items()})
    structure = {
        "images": images,
        "state": "observation.state",
        "actions": "action",
    }
    structure.update(extra or {})
    return _transforms.Group(inputs=[_transforms.RepackTransform(structure)])


_AGILEX_CAMERAS = {
    "top_head": "observation.images.top_head",
    "hand_left": "observation.images.hand_left",
    "hand_right": "observation.images.hand_right",
}


@dataclasses.dataclass(frozen=True)
class LerobotAgilexDataConfig(_config.DataConfigFactory):
    """Agilex dual-arm datasets — the kai0 task robot (reference config.py:360-453)."""

    use_delta_joint_actions: bool = True
    default_prompt: str | None = None
    episodes: Sequence[int] | None = None
    repack_transforms: _transforms.Group | None = None
    action_sequence_keys: Sequence[str] = ("action",)
    mask_state: bool = False
    insert_advantage_into_prompt: bool = False
    # Advantage-estimator training: include history cameras + progress columns.
    advantage_fields: bool = False

    _inputs_cls = agilex_policy.AgilexInputs
    _outputs_cls = agilex_policy.AgilexOutputs

    def create(self, assets_dirs: pathlib.Path, model_config) -> _config.DataConfig:
        default_prompt = self.default_prompt
        repack_transforms = self.repack_transforms
        if repack_transforms is None:
            extra = None
            if self.advantage_fields:
                extra = {
                    "episode_length": "episode_length",
                    "frame_index": "frame_index",
                    "episode_index": "episode_index",
                    "stage_progress_gt": "stage_progress_gt",
                    "progress": "progress",
                }
            repack_transforms = _bimanual_repack(
                _AGILEX_CAMERAS, history=self.advantage_fields, extra=extra
            )

        if self.base_config and self.base_config.prompt_from_task:
            # AWBC: the per-frame task string (with advantage suffix) is the prompt.
            default_prompt = None
            repack = repack_transforms.inputs[0]
            structure = dict(repack.structure)
            structure["prompt"] = "prompt"
            repack_transforms = _transforms.Group(inputs=[_transforms.RepackTransform(structure)])

        data_transforms = _transforms.Group(
            inputs=[
                self._inputs_cls(
                    action_dim=model_config.action_dim,
                    model_type=model_config.model_type,
                    mask_state=self.mask_state,
                )
            ],
            outputs=[self._outputs_cls()],
        )
        if self.insert_advantage_into_prompt:
            data_transforms = _transforms.Group(
                inputs=[_transforms.InsertAdvantageIntoPrompt(), *data_transforms.inputs],
                outputs=data_transforms.outputs,
            )
        if self.use_delta_joint_actions:
            # Dual-arm layout: joints 0-5 + gripper 6, joints 7-12 + gripper 13.
            delta_action_mask = _transforms.make_bool_mask(6, -1, 6, -1)
            data_transforms = data_transforms.push(
                inputs=[_transforms.DeltaActions(delta_action_mask)],
                outputs=[_transforms.AbsoluteActions(delta_action_mask)],
            )

        return dataclasses.replace(
            self.create_base_config(assets_dirs, model_config),
            repack_transforms=repack_transforms,
            data_transforms=data_transforms,
            model_transforms=_model_transforms(model_config, default_prompt),
            action_sequence_keys=tuple(self.action_sequence_keys),
            episodes=tuple(self.episodes) if self.episodes is not None else None,
        )


@dataclasses.dataclass(frozen=True)
class LerobotARXDataConfig(LerobotAgilexDataConfig):
    """ARX dual-arm datasets — same pipeline, no [−π, π] clipping (config.py:455-547)."""

    _inputs_cls = arx_policy.ARXInputs
    _outputs_cls = arx_policy.ARXOutputs


@dataclasses.dataclass(frozen=True)
class LeRobotDROIDDataConfig(_config.DataConfigFactory):
    """DROID LeRobot datasets (reference config.py:617-653)."""

    default_prompt: str | None = None

    def create(self, assets_dirs: pathlib.Path, model_config) -> _config.DataConfig:
        repack_transforms = _transforms.Group(
            inputs=[
                _transforms.RepackTransform(
                    {
                        "observation/exterior_image_1_left": "observation.images.exterior_image_1_left",
                        "observation/wrist_image_left": "observation.images.wrist_image_left",
                        "observation/joint_position": "observation.joint_position",
                        "observation/gripper_position": "observation.gripper_position",
                        "actions": "action",
                        "prompt": "prompt",
                    }
                )
            ]
        )
        data_transforms = _transforms.Group(
            inputs=[droid_policy.DroidInputs(model_type=model_config.model_type)],
            outputs=[droid_policy.DroidOutputs()],
        )
        return dataclasses.replace(
            self.create_base_config(assets_dirs, model_config),
            repack_transforms=repack_transforms,
            data_transforms=data_transforms,
            model_transforms=_model_transforms(model_config, self.default_prompt),
            action_sequence_keys=("action",),
        )


@dataclasses.dataclass(frozen=True)
class RLDSDroidDataConfig(_config.DataConfigFactory):
    """DROID via tf.data RLDS, for datasets too large for LeRobot (reference config.py:549-614)."""

    rlds_data_dir: str | None = None
    action_space: object | None = None
    datasets: tuple = ()

    def create(self, assets_dirs: pathlib.Path, model_config) -> _config.DataConfig:
        from kai0_tpu.training import droid_rlds_dataset as _rlds

        if self.rlds_data_dir is None:
            raise ValueError("Need to set rlds_data_dir for the RLDS data loader.")
        datasets = self.datasets or (
            _rlds.RLDSDataset(name="droid", version="1.0.1", weight=1.0),
        )
        action_space = self.action_space or _rlds.DroidActionSpace.JOINT_POSITION

        repack_transforms = _transforms.Group(
            inputs=[
                _transforms.RepackTransform(
                    {
                        "observation/exterior_image_1_left": "observation/image",
                        "observation/wrist_image_left": "observation/wrist_image",
                        "observation/joint_position": "observation/joint_position",
                        "observation/gripper_position": "observation/gripper_position",
                        "actions": "actions",
                        "prompt": "prompt",
                    }
                )
            ]
        )
        data_transforms = _transforms.Group(
            inputs=[droid_policy.DroidInputs(model_type=model_config.model_type)],
            outputs=[droid_policy.DroidOutputs()],
        )
        if action_space == _rlds.DroidActionSpace.JOINT_POSITION:
            # Loader yields absolute joint positions — train on deltas (gripper stays absolute).
            delta_action_mask = _transforms.make_bool_mask(7, -1)
            data_transforms = data_transforms.push(
                inputs=[_transforms.DeltaActions(delta_action_mask)],
                outputs=[_transforms.AbsoluteActions(delta_action_mask)],
            )
        return dataclasses.replace(
            self.create_base_config(assets_dirs, model_config),
            repack_transforms=repack_transforms,
            data_transforms=data_transforms,
            model_transforms=_model_transforms(model_config, None),
            rlds_data_dir=self.rlds_data_dir,
            action_space=action_space,
            rlds_datasets=datasets,
        )


# --------------------------------------------------------------------------------------
# Named configs
# --------------------------------------------------------------------------------------

_KAI0_TASKS = {
    "flatten_fold": ("FlattenFold", "Flatten and fold the cloth.", LerobotAgilexDataConfig),
    "tee_shirt_sort": (
        "TeeShirtSort",
        "Fetch the clothes, fold the tee shirts and hand-over the collared shirts.",
        LerobotAgilexDataConfig,
    ),
    "hang_cloth": ("HangCloth", "Fetch and hang the cloth.", LerobotARXDataConfig),
}

_PI05_BASE_CKPT = "<path/to/pi05_base/checkpoint>/params"


def _kai0_finetune(name: str, task: str, *, awbc: bool = False) -> _config.TrainConfig:
    dataset_dir, prompt, data_cls = _KAI0_TASKS[task]
    variant = "advantage" if awbc else "base"
    return _config.TrainConfig(
        name=name,
        model=pi0_config.Pi0Config(pi05=True),
        data=data_cls(
            repo_id=f"data/{dataset_dir}/{variant}",
            default_prompt=prompt,
            use_delta_joint_actions=False,
            base_config=_config.DataConfig(prompt_from_task=True) if awbc else None,
        ),
        weight_loader=weight_loaders.CheckpointWeightLoader(_PI05_BASE_CKPT),
        num_train_steps=100_000,
        keep_period=5000,
        num_workers=8,
        batch_size=256,
    )


def _kai0_advantage(name: str, task: str) -> _config.TrainConfig:
    dataset_dir, prompt, data_cls = _KAI0_TASKS[task]
    return _config.TrainConfig(
        name=name,
        advantage_estimator=True,
        model=_advantage_model.AdvantageEstimatorConfig(
            pi05=True,
            loss_value_weight=1.0,
            loss_action_weight=0.0,
            discrete_state_input=False,
        ),
        data=data_cls(
            repo_id=f"data/{dataset_dir}/annotated",
            default_prompt=prompt,
            use_delta_joint_actions=False,
            advantage_fields=True,
        ),
        weight_loader=weight_loaders.CheckpointWeightLoader(_PI05_BASE_CKPT),
        num_train_steps=30_000,
        keep_period=5000,
        num_workers=8,
        batch_size=32,
        split="train",
    )


def configs() -> list[_config.TrainConfig]:
    TrainConfig = _config.TrainConfig
    aloha_ckpt = "gs://openpi-assets/checkpoints/pi0_base/params"
    pi05_ckpt = "gs://openpi-assets/checkpoints/pi05_base/params"

    out = [
        # ------------------------- Aloha -------------------------
        TrainConfig(
            name="pi0_aloha",
            model=pi0_config.Pi0Config(),
            data=LeRobotAlohaDataConfig(assets=_config.AssetsConfig(asset_id="trossen")),
            weight_loader=weight_loaders.CheckpointWeightLoader(aloha_ckpt),
        ),
        TrainConfig(
            name="pi05_aloha",
            model=pi0_config.Pi0Config(pi05=True),
            data=LeRobotAlohaDataConfig(assets=_config.AssetsConfig(asset_id="trossen")),
            weight_loader=weight_loaders.CheckpointWeightLoader(pi05_ckpt),
        ),
        TrainConfig(
            name="pi0_aloha_towel",
            model=pi0_config.Pi0Config(),
            data=LeRobotAlohaDataConfig(
                default_prompt="fold the towel",
                assets=_config.AssetsConfig(asset_id="trossen"),
            ),
            weight_loader=weight_loaders.CheckpointWeightLoader(aloha_ckpt),
        ),
        TrainConfig(
            name="pi0_aloha_tupperware",
            model=pi0_config.Pi0Config(),
            data=LeRobotAlohaDataConfig(
                default_prompt="open the tupperware and put the food on the plate",
                assets=_config.AssetsConfig(asset_id="trossen"),
            ),
            weight_loader=weight_loaders.CheckpointWeightLoader(aloha_ckpt),
        ),
        TrainConfig(
            name="pi0_aloha_pen_uncap",
            model=pi0_config.Pi0Config(),
            data=LeRobotAlohaDataConfig(
                repo_id="physical-intelligence/aloha_pen_uncap_diverse",
                default_prompt="uncap the pen",
                assets=_config.AssetsConfig(
                    assets_dir="gs://openpi-assets/checkpoints/pi0_base/assets", asset_id="trossen"
                ),
            ),
            weight_loader=weight_loaders.CheckpointWeightLoader(aloha_ckpt),
            num_train_steps=20_000,
        ),
        TrainConfig(
            name="pi05_aloha_pen_uncap",
            model=pi0_config.Pi0Config(pi05=True),
            data=LeRobotAlohaDataConfig(
                repo_id="physical-intelligence/aloha_pen_uncap_diverse",
                default_prompt="uncap the pen",
                assets=_config.AssetsConfig(
                    assets_dir="gs://openpi-assets/checkpoints/pi05_base/assets", asset_id="trossen"
                ),
            ),
            weight_loader=weight_loaders.CheckpointWeightLoader(pi05_ckpt),
            num_train_steps=20_000,
        ),
        TrainConfig(
            name="pi0_aloha_sim",
            model=pi0_config.Pi0Config(),
            data=LeRobotAlohaDataConfig(
                repo_id="lerobot/aloha_sim_transfer_cube_human",
                default_prompt="Transfer cube",
                use_delta_joint_actions=False,
                adapt_to_pi=False,
            ),
            weight_loader=weight_loaders.CheckpointWeightLoader(aloha_ckpt),
            num_train_steps=20_000,
        ),
        # ------------------------- DROID -------------------------
        TrainConfig(
            name="pi0_droid",
            model=pi0_config.Pi0Config(action_horizon=10),
            data=LeRobotDROIDDataConfig(repo_id="lerobot/droid_100"),
            weight_loader=weight_loaders.CheckpointWeightLoader(aloha_ckpt),
        ),
        TrainConfig(
            name="pi0_fast_droid",
            model=pi0_fast_config.Pi0FASTConfig(action_dim=8, action_horizon=10),
            data=LeRobotDROIDDataConfig(repo_id="lerobot/droid_100"),
            weight_loader=weight_loaders.CheckpointWeightLoader(
                "gs://openpi-assets/checkpoints/pi0_fast_base/params"
            ),
        ),
        TrainConfig(
            name="pi05_droid",
            model=pi0_config.Pi0Config(pi05=True, action_horizon=16),
            data=LeRobotDROIDDataConfig(repo_id="lerobot/droid_100"),
            weight_loader=weight_loaders.CheckpointWeightLoader(pi05_ckpt),
            lr_schedule=_optimizer.CosineDecaySchedule(peak_lr=5e-5, decay_lr=5e-5 / 10),
        ),
        # Full-DROID RLDS fine-tunes (reference config.py:1032-1096): tf.data RLDS
        # loading for the full DROID dataset; num_workers=0 because tf.data does its
        # own parallelism. rlds_data_dir is a placeholder the user overrides.
        TrainConfig(
            name="pi0_fast_full_droid_finetune",
            model=pi0_fast_config.Pi0FASTConfig(action_dim=8, action_horizon=16, max_token_len=180),
            data=RLDSDroidDataConfig(repo_id="droid", rlds_data_dir="<path_to_droid_rlds_dataset>"),
            weight_loader=weight_loaders.CheckpointWeightLoader(
                "gs://openpi-assets/checkpoints/pi0_fast_base/params"
            ),
            lr_schedule=_optimizer.CosineDecaySchedule(
                warmup_steps=1_000, peak_lr=5e-5, decay_steps=1_000_000, decay_lr=5e-5
            ),
            num_train_steps=100_000,
            batch_size=256,
            log_interval=100,
            save_interval=5000,
            keep_period=20_000,
            num_workers=0,
        ),
        TrainConfig(
            name="pi05_full_droid_finetune",
            model=pi0_config.Pi0Config(pi05=True, action_dim=32, action_horizon=16),
            data=RLDSDroidDataConfig(
                repo_id="droid",
                rlds_data_dir="<path_to_droid_rlds_dataset>",
                assets=_config.AssetsConfig(
                    assets_dir="gs://openpi-assets/checkpoints/pi05_base/assets/", asset_id="droid"
                ),
            ),
            weight_loader=weight_loaders.CheckpointWeightLoader(pi05_ckpt),
            lr_schedule=_optimizer.CosineDecaySchedule(
                warmup_steps=1_000, peak_lr=5e-5, decay_steps=1_000_000, decay_lr=5e-5
            ),
            num_train_steps=100_000,
            batch_size=256,
            log_interval=100,
            save_interval=5000,
            keep_period=10_000,
            num_workers=0,
        ),
        # Custom (smaller) DROID fine-tune in LeRobot format, reusing the original
        # DROID norm stats (reference config.py:1097-1121).
        TrainConfig(
            name="pi05_droid_finetune",
            model=pi0_config.Pi0Config(pi05=True, action_dim=32, action_horizon=16),
            data=LeRobotDROIDDataConfig(
                repo_id="your_hf_username/my_droid_dataset",
                base_config=_config.DataConfig(prompt_from_task=True),
                assets=_config.AssetsConfig(
                    assets_dir="gs://openpi-assets/checkpoints/pi05_droid/assets", asset_id="droid"
                ),
            ),
            weight_loader=weight_loaders.CheckpointWeightLoader(
                "gs://openpi-assets/checkpoints/pi05_droid/params"
            ),
            num_train_steps=20_000,
            batch_size=32,
        ),
        # ------------------------- Libero -------------------------
        TrainConfig(
            name="pi0_libero",
            model=pi0_config.Pi0Config(),
            data=LeRobotLiberoDataConfig(
                repo_id="physical-intelligence/libero", extra_delta_transform=True
            ),
            weight_loader=weight_loaders.CheckpointWeightLoader(aloha_ckpt),
            num_train_steps=30_000,
        ),
        TrainConfig(
            name="pi0_libero_low_mem_finetune",
            model=pi0_config.Pi0Config(
                paligemma_variant="gemma_2b_lora", action_expert_variant="gemma_300m_lora"
            ),
            data=LeRobotLiberoDataConfig(
                repo_id="physical-intelligence/libero", extra_delta_transform=True
            ),
            weight_loader=weight_loaders.CheckpointWeightLoader(aloha_ckpt),
            num_train_steps=30_000,
            ema_decay=None,
        ),
        TrainConfig(
            name="pi0_fast_libero",
            model=pi0_fast_config.Pi0FASTConfig(action_dim=7, action_horizon=10, max_token_len=180),
            data=LeRobotLiberoDataConfig(repo_id="physical-intelligence/libero"),
            weight_loader=weight_loaders.CheckpointWeightLoader(
                "gs://openpi-assets/checkpoints/pi0_fast_base/params"
            ),
            num_train_steps=30_000,
        ),
        TrainConfig(
            name="pi0_fast_libero_low_mem_finetune",
            model=pi0_fast_config.Pi0FASTConfig(
                paligemma_variant="gemma_2b_lora", action_dim=7, action_horizon=10, max_token_len=180
            ),
            data=LeRobotLiberoDataConfig(repo_id="physical-intelligence/libero"),
            weight_loader=weight_loaders.CheckpointWeightLoader(
                "gs://openpi-assets/checkpoints/pi0_fast_base/params"
            ),
            num_train_steps=30_000,
            ema_decay=None,
        ),
        TrainConfig(
            name="pi05_libero",
            model=pi0_config.Pi0Config(pi05=True),
            data=LeRobotLiberoDataConfig(repo_id="physical-intelligence/libero"),
            weight_loader=weight_loaders.CheckpointWeightLoader(pi05_ckpt),
            num_train_steps=30_000,
        ),
        # ------------------------- kai0 tasks -------------------------
        _kai0_finetune("pi05_flatten_fold_normal", "flatten_fold"),
        _kai0_finetune("pi05_tee_shirt_sort_normal", "tee_shirt_sort"),
        _kai0_finetune("pi05_hang_cloth_normal", "hang_cloth"),
        _kai0_finetune("pi05_flatten_fold_awbc", "flatten_fold", awbc=True),
        _kai0_finetune("pi05_tee_shirt_sort_awbc", "tee_shirt_sort", awbc=True),
        _kai0_finetune("pi05_hang_cloth_awbc", "hang_cloth", awbc=True),
        _kai0_advantage("ADVANTAGE_TORCH_KAI0_FLATTEN_FOLD", "flatten_fold"),
        # PI06 variant: absolute-value estimator (loss over absolute progress).
        dataclasses.replace(
            _kai0_advantage("ADVANTAGE_TORCH_PI06_FLATTEN_FOLD", "flatten_fold"),
        ),
        # RTC inference config (serving only; same data/weights as normal fine-tune).
        TrainConfig(
            name="pi05_rtc_flatten_fold_inference",
            model=pi0_rtc_config.Pi0RTCConfig(pi05=True),
            data=LerobotAgilexDataConfig(
                repo_id="data/FlattenFold/base",
                default_prompt="Flatten and fold the cloth.",
                use_delta_joint_actions=False,
            ),
            weight_loader=weight_loaders.CheckpointWeightLoader(_PI05_BASE_CKPT),
            num_train_steps=100_000,
            keep_period=5000,
            num_workers=8,
            batch_size=256,
        ),
    ]
    return out
