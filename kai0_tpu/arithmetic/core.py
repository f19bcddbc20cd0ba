"""Model Arithmetic: weight-space checkpoint merging — TPU-native.

Behavioral counterpart of reference ``model_arithmetic/arithmetic.py`` +
``common.py``. Weighting modes: average, inverse_loss (squared inverse losses,
common.py:64-70), manual weights, gradient_descent / adaptive_gradient_descent
(softmax(log_weights) on the simplex, arithmetic.py:118-294), greedy forward
selection (:330-425). Mixed params are saved as an Orbax step-0 checkpoint and norm
stats are mixed as weighted averages (common.py:31-53).

TPU-native redesign of gradient descent (SURVEY.md §7 item 8): the reference
ping-pongs params between a CPU-jitted mix and GPU loss/grad every iteration because
N full checkpoints don't fit one GPU (arithmetic.py:159-199). Here all N checkpoint
param sets stay resident on device, FSDP-sharded over the mesh in bf16; the mix, the
loss/grad, and the per-checkpoint projections ⟨∇θL, θ_k⟩ are all device computations
— zero host↔device traffic in the loop.
"""

from __future__ import annotations

import json
import logging
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from kai0_tpu.parallel import sharding as _sharding
from kai0_tpu.training import checkpoints as _checkpoints

logger = logging.getLogger("kai0_tpu")


# --------------------------------------------------------------------------------------
# Checkpoint IO
# --------------------------------------------------------------------------------------


def resolve_params_dir(checkpoint_path: str | pathlib.Path) -> pathlib.Path:
    """Accept a params dir, a step dir, or a run dir with step subdirs (:55-66)."""
    path = pathlib.Path(checkpoint_path)
    if path.name == "params" and path.exists():
        return path
    if (path / "params").exists():
        return path / "params"
    step_dirs = sorted((d for d in path.iterdir() if d.is_dir() and d.name.isdigit()), key=lambda d: int(d.name))
    if step_dirs and (step_dirs[-1] / "params").exists():
        return step_dirs[-1] / "params"
    raise FileNotFoundError(f"No params directory found under {checkpoint_path}")


def load_params(checkpoint_path: str | pathlib.Path, dtype=None, model_config=None) -> dict:
    """Load a checkpoint's params as a JAX-layout tree.

    With ``model_config`` given, torch-format checkpoints (``model.safetensors``,
    the reference's PyTorch trainer output) are converted on the fly — so every
    mixing mode works over torch checkpoints too (reference arithmetic_torch.py).
    """
    if model_config is not None:
        from kai0_tpu.interop import is_torch_checkpoint, load_torch_checkpoint

        root = pathlib.Path(checkpoint_path)
        if root.name == "params":
            root = root.parent
        if is_torch_checkpoint(root):
            return load_torch_checkpoint(root, model_config, dtype=dtype, strict=False)
    return _checkpoints.restore_params(resolve_params_dir(checkpoint_path), restore_type=np.ndarray, dtype=dtype)


def save_mixed_checkpoint(params: dict, output_dir: str | pathlib.Path) -> pathlib.Path:
    """Save mixed params as an Orbax params dir under ``output_dir`` (:77-89)."""
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    _checkpoints.save_params(params, output_dir / "params")
    return output_dir


# --------------------------------------------------------------------------------------
# Mixing
# --------------------------------------------------------------------------------------


def mix_params(params_list: list[dict], weights) -> dict:
    """Weighted average in f64 → f32 (bit-parity with reference common.py:11-20)."""
    weights = np.asarray(weights, dtype=np.float64)
    weights /= weights.sum()
    return jax.tree.map(
        lambda *leaves: np.average(
            np.stack([np.asarray(x, dtype=np.float64) for x in leaves]), axis=0, weights=weights
        ).astype(np.float32),
        *params_list,
    )


def mix_norm_stats(norm_stats_list: list[dict], weights=None) -> dict:
    """Weighted average of raw norm-stats JSON dicts (common.py:31-53)."""
    if len(norm_stats_list) == 1:
        return norm_stats_list[0]
    if weights is None:
        weights = [1.0 / len(norm_stats_list)] * len(norm_stats_list)
    total = sum(weights)
    weights = [w / total for w in weights]
    result = {}
    for key in norm_stats_list[0]:
        values = [ns[key] for ns in norm_stats_list]
        if isinstance(values[0], dict):
            result[key] = {
                stat: np.average(
                    np.stack([np.asarray(v[stat], dtype=np.float64) for v in values]), axis=0, weights=weights
                ).tolist()
                for stat in values[0]
            }
        else:
            result[key] = values[0]
    return result


def load_norm_stats_json(path: str | pathlib.Path) -> dict:
    with open(path) as f:
        data = json.load(f)
    if "norm_stats" not in data:
        raise ValueError(f"Invalid norm_stats format in {path}")
    return data["norm_stats"]


def save_norm_stats_json(norm_stats: dict, path: str | pathlib.Path) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump({"norm_stats": norm_stats}, f, indent=2)


def compute_optimal_weights(losses) -> list[float]:
    """Inverse-loss weighting: worse loss → smaller weight (squared, common.py:64-70)."""
    losses = np.asarray(losses)
    inv = (1.0 / (losses + 1e-8)) ** 2
    return (inv / inv.sum()).tolist()


# --------------------------------------------------------------------------------------
# Device-resident loss / optimization
# --------------------------------------------------------------------------------------


class DeviceEnsemble:
    """N checkpoint param sets resident on device (bf16, FSDP-sharded)."""

    def __init__(self, checkpoint_paths: list[str], model_config, mesh=None):
        self.model_config = model_config
        self.mesh = mesh if mesh is not None else _sharding.make_mesh(jax.device_count())
        logger.info(f"Loading {len(checkpoint_paths)} checkpoints onto mesh {dict(self.mesh.shape)}")
        self.params_list = []
        for path in checkpoint_paths:
            host = load_params(path, dtype=jnp.bfloat16, model_config=model_config)
            shardings = _sharding.fsdp_sharding(host, self.mesh)
            self.params_list.append(jax.device_put(host, shardings))

        def mixed_loss(weights, rng, observation, actions, *params_list):
            mixed = jax.tree.map(
                lambda *leaves: jnp.tensordot(weights, jnp.stack([l.astype(jnp.float32) for l in leaves]), axes=1),
                *params_list,
            )
            losses = model_config.compute_loss(mixed, rng, observation, actions, train=False)
            return jnp.mean(losses)

        self._mixed_loss = jax.jit(mixed_loss)
        self._mixed_loss_grad = jax.jit(jax.value_and_grad(mixed_loss, argnums=0))

    def loss(self, weights, batches, rng=None) -> float:
        rng = rng if rng is not None else jax.random.key(0)
        weights = jnp.asarray(weights, jnp.float32)
        total = 0.0
        for observation, actions in batches:
            total += float(self._mixed_loss(weights, rng, observation, actions, *self.params_list))
        return total / len(batches)

    def loss_and_weight_grad(self, weights, batches, rng=None):
        rng = rng if rng is not None else jax.random.key(0)
        weights = jnp.asarray(weights, jnp.float32)
        total_loss, total_grad = 0.0, np.zeros(len(self.params_list))
        for observation, actions in batches:
            loss, grad = self._mixed_loss_grad(weights, rng, observation, actions, *self.params_list)
            total_loss += float(loss)
            total_grad += np.asarray(grad)
        return total_loss / len(batches), total_grad / len(batches)

    def checkpoint_losses(self, batches) -> list[float]:
        n = len(self.params_list)
        return [self.loss(np.eye(n)[i], batches) for i in range(n)]


def optimize_weights_gradient_descent(
    ensemble: DeviceEnsemble,
    batches,
    *,
    num_iterations: int = 50,
    learning_rate: float = 0.05,
    adaptive: bool = False,
) -> list[float]:
    """Simplex-constrained weight optimization via softmax(log_weights) + Adam.

    Parity with reference arithmetic.py:118-294 up to execution placement: the
    gradient wrt the mixing weights is obtained directly from the device-resident
    mixed-loss program (mathematically the reference's ⟨∇θL, θ_k⟩ projections, which
    XLA computes in the same pass) instead of explicit CPU-side dot products.
    """
    import optax

    n = len(ensemble.params_list)
    log_w = jnp.zeros(n)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(log_w)

    best_w, best_loss = None, float("inf")
    for it in range(num_iterations):
        w = jax.nn.softmax(log_w)
        loss, grad_w = ensemble.loss_and_weight_grad(w, batches)
        # d loss / d log_w through the softmax: w ⊙ (g − ⟨g, w⟩).
        g = np.asarray(grad_w)
        wn = np.asarray(w)
        grad_log = wn * (g - np.dot(g, wn))
        if adaptive:
            # Loss-scaled step (reference :287-294): larger loss → larger step.
            grad_log = grad_log * (loss / 0.05) ** 2
        updates, opt_state = tx.update(jnp.asarray(grad_log), opt_state, log_w)
        log_w = optax.apply_updates(log_w, updates)
        if loss < best_loss:
            best_loss, best_w = loss, wn
        logger.info(f"iter {it}: loss={loss:.6f} weights={np.round(wn, 4).tolist()}")

    return np.asarray(best_w if best_w is not None else jax.nn.softmax(log_w)).tolist()


def optimize_weights_greedy(ensemble: DeviceEnsemble, batches, *, grid: int = 5) -> list[float]:
    """Greedy forward selection (reference :330-425): start from the best single
    checkpoint, then repeatedly try blending in each remaining checkpoint at a few
    ratios, keeping any improvement."""
    n = len(ensemble.params_list)
    losses = ensemble.checkpoint_losses(batches)
    weights = np.eye(n)[int(np.argmin(losses))]
    best_loss = min(losses)
    remaining = set(range(n)) - {int(np.argmin(losses))}

    improved = True
    while improved and remaining:
        improved = False
        for k in sorted(remaining):
            for alpha in np.linspace(0.1, 0.5, grid):
                cand = weights * (1 - alpha) + np.eye(n)[k] * alpha
                loss = ensemble.loss(cand, batches)
                if loss < best_loss:
                    best_loss, weights = loss, cand
                    improved = True
                    remaining.discard(k)
                    break
    logger.info(f"greedy final loss={best_loss:.6f} weights={np.round(weights, 4).tolist()}")
    return weights.tolist()
