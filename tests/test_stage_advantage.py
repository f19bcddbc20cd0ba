"""Stage Advantage annotation pipeline: evaluator, annotate, discretize."""

import numpy as np
import pandas as pd
import pytest

from kai0_tpu.advantage import annotate as _annotate
from kai0_tpu.advantage import discretize as _discretize
from kai0_tpu.advantage.evaluator import SimpleValueEvaluator
from kai0_tpu.data import lerobot_meta as _meta
from kai0_tpu.data.lerobot_writer import LeRobotDatasetWriter, feature_spec


@pytest.fixture(scope="module")
def annotated_repo(tmp_path_factory):
    """Tiny 3-camera dataset with stage_progress_gt, annotated by a dummy estimator."""
    root = tmp_path_factory.mktemp("adv") / "ds"
    cams = {"top_head": (48, 64), "hand_left": (48, 64), "hand_right": (48, 64)}
    feats = feature_spec(state_dim=4, action_dim=4, cameras=cams, fps=10)
    feats["stage_progress_gt"] = {"dtype": "float32", "shape": [1]}
    writer = LeRobotDatasetWriter(root, feats, fps=10)
    rng = np.random.default_rng(0)
    for ep in range(2):
        T = 12
        writer.add_episode(
            {
                "observation.state": rng.random((T, 4), dtype=np.float32),
                "action": rng.random((T, 4), dtype=np.float32),
                "stage_progress_gt": np.linspace(0, 1, T, dtype=np.float32),
            },
            task="fold the cloth",
            videos={
                f"observation.images.{cam}": rng.integers(0, 255, (T, 48, 64, 3)).astype(np.uint8)
                for cam in cams
            },
        )
    writer.finalize()
    return root


@pytest.fixture(scope="module")
def evaluator():
    """Dummy-size estimator with freshly initialized params (no checkpoint)."""
    import jax

    from kai0_tpu.training import config as _config

    config = _config.get_config("ADVANTAGE_TORCH_KAI0_FLATTEN_FOLD")
    import dataclasses

    model = dataclasses.replace(
        config.model,
        paligemma_variant="dummy",
        action_expert_variant="dummy",
        vision_variant="mu/14",
        dtype="float32",
    )
    params = model.init_params(jax.random.key(0))
    ev = SimpleValueEvaluator.__new__(SimpleValueEvaluator)
    # Manual init to skip config/checkpoint machinery but keep the inference path real.
    import concurrent.futures
    import functools

    import jax as _jax

    from kai0_tpu.models import tokenizer as _tokenizer

    ev.config = None
    ev.model_config = model
    ev.batch_size = 4
    ev.num_workers = 2
    ev._executor = concurrent.futures.ThreadPoolExecutor(max_workers=2)
    ev._params = params
    ev.tokenizer = _tokenizer.PaligemmaTokenizer(model.max_token_len)
    ev._rng = _jax.random.key(0)
    ev._values_fn = _jax.jit(functools.partial(lambda m, p, r, o: m.sample_values(p, r, o), model))
    return ev


def test_evaluator_2timesteps(annotated_repo, evaluator):
    meta = _meta.LeRobotMetadata.load(annotated_repo)
    videos = [meta.video_path(0, f"observation.images.{c}") for c in ("top_head", "hand_left", "hand_right")]
    results = evaluator.evaluate_video_2timesteps_advantages(videos, "fold", relative_interval=4)
    assert len(results) == 12
    r0 = results[0]
    assert r0["frame_idx"] == 0 and r0["future_frame_idx"] == 4
    assert r0["absolute_value"] == 0.0  # first frame by definition
    for r in results:
        assert -1.0 <= r["relative_advantage"] <= 1.0
        assert -1.0 <= r["absolute_advantage"] <= 1.0
    # Tail frames: future clamps to last frame; the very last has zero advantage.
    assert results[-1]["future_frame_idx"] == 11
    assert results[-1]["absolute_advantage"] == 0.0


def test_evaluator_1timestep(annotated_repo, evaluator):
    meta = _meta.LeRobotMetadata.load(annotated_repo)
    videos = [meta.video_path(1, f"observation.images.{c}") for c in ("top_head", "hand_left", "hand_right")]
    results = evaluator.evaluate_video_1timestep_advantage(videos, "fold")
    assert len(results) == 12
    assert results[0]["absolute_value"] == 0.0
    assert all(-1.0 <= r["absolute_value"] <= 1.0 for r in results)


def test_annotate_writes_advantage_parquets(annotated_repo, evaluator):
    written = _annotate.annotate_dataset(
        evaluator, annotated_repo, prompt="fold", output_tag="TEST_1", relative_interval=4
    )
    assert len(written) == 2
    df = pd.read_parquet(written[0])
    for col in ("relative_advantage", "absolute_value", "absolute_advantage"):
        assert col in df.columns
    assert len(df) == 12
    # Re-run without overwrite skips existing outputs.
    again = _annotate.annotate_dataset(
        evaluator, annotated_repo, prompt="fold", output_tag="TEST_1", relative_interval=4
    )
    assert again == []


def test_discretize_binary_and_staged(annotated_repo, evaluator):
    _annotate.annotate_dataset(
        evaluator, annotated_repo, prompt="fold", output_tag="D", relative_interval=4
    )
    # Dry run computes stats without touching files.
    stats = _discretize.discretize_dataset(
        annotated_repo, data_glob="data_D/chunk-*/*.parquet", dry_run=True
    )
    assert 0 in stats and "percentiles" in stats[0]

    stats = _discretize.discretize_dataset(
        annotated_repo,
        threshold=50.0,
        discretion_type="binary",
        stage_nums=2,
        base_prompt="fold the cloth",
        data_glob="data_D/chunk-*/*.parquet",
    )
    assert set(stats) == {0, 1}
    # tasks.jsonl rewritten with the binary advantage prompts.
    tasks = _meta.read_jsonl(annotated_repo / "meta" / "tasks.jsonl")
    assert {t["task"] for t in tasks} == {
        "fold the cloth, Advantage: negative",
        "fold the cloth, Advantage: positive",
    }
    # Roughly half of frames get task_index=1 at the 50% threshold, per stage.
    dfs = [pd.read_parquet(p) for p in sorted((annotated_repo / "data_D").rglob("*.parquet"))]
    all_ti = np.concatenate([d["task_index"].to_numpy() for d in dfs])
    assert set(np.unique(all_ti)) <= {0, 1}
    assert 0.2 <= all_ti.mean() <= 0.8


def test_discretize_n_slices(annotated_repo):
    # Deterministic synthetic advantages: 24 distinct values → exact quartile bins.
    src = sorted((annotated_repo / "data").rglob("*.parquet"))
    out_dir = annotated_repo / "data_S"
    vals = np.linspace(-1, 1, 24)
    cursor = 0
    for p in src:
        df = pd.read_parquet(p)
        df["absolute_advantage"] = vals[cursor : cursor + len(df)]
        cursor += len(df)
        out = out_dir / p.relative_to(annotated_repo / "data")
        out.parent.mkdir(parents=True, exist_ok=True)
        df.to_parquet(out, index=False)

    _discretize.discretize_dataset(
        annotated_repo,
        discretion_type="n_slices",
        n_slices=4,
        base_prompt="fold the cloth",
        data_glob="data_S/chunk-*/*.parquet",
    )
    tasks = _meta.read_jsonl(annotated_repo / "meta" / "tasks.jsonl")
    assert [t["task"] for t in tasks] == [f"fold the cloth, Advantage: {i}" for i in range(4)]
    dfs = [pd.read_parquet(p) for p in sorted(out_dir.rglob("*.parquet"))]
    all_ti = np.concatenate([d["task_index"].to_numpy() for d in dfs])
    # 24 frames into 4 equal-percentile bins: exactly 6 per bin.
    assert np.bincount(all_ti, minlength=4).tolist() == [6, 6, 6, 6]
