"""PolaRiS DROID joint-position policy configs (reference misc/polaris_config.py).

Co-training on DROID (weight 0.9) + the PolaRiS cotrain dataset (weight 0.1) over
the RLDS pipeline, in π₀.₅ / π₀-FAST / π₀ variants, plus a binning baseline.
"""

from __future__ import annotations

from kai0_tpu import transforms as _transforms
from kai0_tpu.models import model as _model
from kai0_tpu.models import pi0 as pi0_config
from kai0_tpu.models import pi0_fast
from kai0_tpu.models import tokenizer as _tokenizer
from kai0_tpu.policies import droid_policy
from kai0_tpu.training import droid_rlds_dataset
from kai0_tpu.training import optimizer as _optimizer
from kai0_tpu.training import weight_loaders

ModelType = _model.ModelType

_POLARIS_DATASETS = (
    droid_rlds_dataset.RLDSDataset(name="droid", version="1.0.1", weight=0.9),
    droid_rlds_dataset.RLDSDataset(name="polaris_droid_cotrain_dataset", version="1.0.0", weight=0.1),
)
_POLARIS_LR = _optimizer.CosineDecaySchedule(
    warmup_steps=1_000, peak_lr=5e-5, decay_steps=1_000_000, decay_lr=5e-5
)


def get_polaris_configs():
    # Import here to avoid circular imports.
    from kai0_tpu.training.config import AssetsConfig, DataConfig, SimpleDataConfig, TrainConfig
    from kai0_tpu.training.robot_configs import RLDSDroidDataConfig

    def polaris_data(ckpt_name: str):
        return RLDSDroidDataConfig(
            assets=AssetsConfig(
                assets_dir=f"gs://openpi-assets/checkpoints/polaris/{ckpt_name}/assets",
                asset_id="droid",
            ),
            datasets=_POLARIS_DATASETS,
            rlds_data_dir="<path_to_droid_rlds_dataset>",
            action_space=droid_rlds_dataset.DroidActionSpace.JOINT_POSITION,
        )

    def polaris_train(name: str, model, *, num_train_steps: int = 1_000) -> TrainConfig:
        return TrainConfig(
            name=name,
            model=model,
            data=polaris_data(name),
            weight_loader=weight_loaders.CheckpointWeightLoader(
                f"gs://openpi-assets/checkpoints/polaris/{name}/params"
            ),
            lr_schedule=_POLARIS_LR,
            num_train_steps=num_train_steps,
            batch_size=128,
            log_interval=100,
            save_interval=1000,
            keep_period=1000,
            # RLDS pipeline does its own parallelism; loader workers must be 0.
            num_workers=0,
        )

    return [
        polaris_train(
            "pi05_droid_jointpos_polaris", pi0_config.Pi0Config(action_horizon=15, pi05=True)
        ),
        polaris_train(
            "pi0_fast_droid_jointpos_polaris",
            pi0_fast.Pi0FASTConfig(action_dim=8, action_horizon=15),
        ),
        polaris_train(
            "pi0_droid_jointpos_polaris", pi0_config.Pi0Config(action_horizon=15, action_dim=8)
        ),
        polaris_train(
            "pi0_droid_jointpos_100k_polaris",
            pi0_config.Pi0Config(action_horizon=15, action_dim=8),
            num_train_steps=100_000,
        ),
        TrainConfig(
            # Binning-tokenizer DROID baseline at joint-position action space.
            name="paligemma_binning_droid_jointpos",
            model=pi0_fast.Pi0FASTConfig(
                action_dim=8,
                action_horizon=15,
                max_token_len=400,
                fast_model_tokenizer=_tokenizer.BinningTokenizer,
            ),
            data=SimpleDataConfig(
                assets=AssetsConfig(asset_id="droid"),
                data_transforms=lambda model: _transforms.Group(
                    inputs=[droid_policy.DroidInputs(model_type=ModelType.PI0_FAST)],
                    outputs=[droid_policy.DroidOutputs()],
                ),
                base_config=DataConfig(prompt_from_task=True),
            ),
        ),
    ]
