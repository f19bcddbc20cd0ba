"""RoboArena DROID baseline inference configs (reference misc/roboarena_config.py).

Five PaliGemma-init baselines over DROID: binning tokenizer (RT-2/OpenVLA style),
universal FAST+ tokenizer, DROID-specialist FAST tokenizer, FSQ/VQ tokenizer, and a
π₀-style diffusion/flow VLA.
"""

from __future__ import annotations

from kai0_tpu import transforms as _transforms
from kai0_tpu.models import model as _model
from kai0_tpu.models import pi0 as pi0_config
from kai0_tpu.models import pi0_fast
from kai0_tpu.models import tokenizer as _tokenizer
from kai0_tpu.policies import droid_policy

ModelType = _model.ModelType


def _droid_transforms(model_type):
    def factory(model):
        return _transforms.Group(
            inputs=[droid_policy.DroidInputs(model_type=model_type)],
            outputs=[droid_policy.DroidOutputs()],
        )

    return factory


def get_roboarena_configs():
    # Import here to avoid circular imports.
    from kai0_tpu.training.config import AssetsConfig, DataConfig, SimpleDataConfig, TrainConfig

    def droid_data(model_type=ModelType.PI0_FAST):
        return SimpleDataConfig(
            assets=AssetsConfig(asset_id="droid"),
            data_transforms=_droid_transforms(model_type),
            base_config=DataConfig(prompt_from_task=True),
        )

    return [
        TrainConfig(
            # Trained from PaliGemma, RT-2 / OpenVLA style binning tokenizer.
            name="paligemma_binning_droid",
            model=pi0_fast.Pi0FASTConfig(
                action_dim=8,
                action_horizon=15,
                max_token_len=400,
                fast_model_tokenizer=_tokenizer.BinningTokenizer,
            ),
            data=droid_data(),
        ),
        TrainConfig(
            # Universal FAST+ tokenizer.
            name="paligemma_fast_droid",
            model=pi0_fast.Pi0FASTConfig(action_dim=8, action_horizon=15),
            data=droid_data(),
        ),
        TrainConfig(
            # FAST tokenizer trained on DROID specifically.
            name="paligemma_fast_specialist_droid",
            model=pi0_fast.Pi0FASTConfig(
                action_dim=8,
                action_horizon=15,
                fast_model_tokenizer=_tokenizer.FASTTokenizer,
                fast_model_tokenizer_kwargs={"fast_tokenizer_path": "KarlP/fast_droid_specialist"},
            ),
            data=droid_data(),
        ),
        TrainConfig(
            # FSQ (VQ) action tokenizer.
            name="paligemma_vq_droid",
            model=pi0_fast.Pi0FASTConfig(
                action_dim=8,
                action_horizon=15,
                fast_model_tokenizer=_tokenizer.FSQTokenizer,
                fast_model_tokenizer_kwargs={"fsq_tokenizer_path": None},
            ),
            data=droid_data(),
        ),
        TrainConfig(
            # π₀-style diffusion/flow VLA trained on DROID from PaliGemma.
            name="paligemma_diffusion_droid",
            model=pi0_config.Pi0Config(action_horizon=10, action_dim=8),
            data=droid_data(ModelType.PI0),
        ),
    ]
