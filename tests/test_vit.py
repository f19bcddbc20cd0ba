"""Generic ViT (kai0_tpu/models/vit.py) — shape/semantics tests.

Reference counterpart ``src/openpi/models/vit.py`` is unrunnable upstream (missing
``openpi.models.resnet`` import), so the spec here is the vit_jax semantics the
reference adapted: CLS-token/gap/unpooled classifiers, zero-init head, pre_logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kai0_tpu.models import vit


def _tiny(num_classes=10, **kw):
    return vit.Config(
        num_classes=num_classes, patch_size=(8, 8), width=32, depth=2, mlp_dim=64, num_heads=2, **kw
    )


def test_token_classifier_shapes_and_zero_head():
    config = _tiny()
    params = vit.init(jax.random.key(0), config, (32, 32))
    img = jax.random.uniform(jax.random.key(1), (3, 32, 32, 3), minval=-1, maxval=1)
    logits = jax.jit(lambda p, x: vit.apply(p, config, x))(params, img)
    assert logits.shape == (3, 10)
    # Zero-init head + zero head_bias_init → logits are exactly zero at init.
    np.testing.assert_array_equal(np.asarray(logits), 0.0)


def test_gap_and_unpooled_classifiers():
    for classifier, expect in [("gap", (2, 5)), ("unpooled", (2, 16, 32)), ("token_unpooled", (2, 17, 32))]:
        config = _tiny(num_classes=5 if classifier == "gap" else 0, classifier=classifier)
        params = vit.init(jax.random.key(0), config, (32, 32))
        out = vit.apply(params, config, jnp.zeros((2, 32, 32, 3)))
        assert out.shape == expect, classifier


def test_pre_logits_and_head_bias():
    config = _tiny(representation_size=16, head_bias_init=-1.5)
    params = vit.init(jax.random.key(0), config, (32, 32))
    assert params["pre_logits"]["kernel"].shape == (32, 16)
    logits = vit.apply(params, config, jnp.zeros((1, 32, 32, 3)))
    np.testing.assert_allclose(np.asarray(logits), -1.5, atol=1e-6)


def test_get_config_variants():
    config = vit.get_config(100, "Ti/16")
    assert (config.width, config.depth, config.num_heads) == (192, 12, 3)
    assert config.patch_size == (16, 16)


def test_grads_flow():
    config = _tiny(num_classes=3)
    params = vit.init(jax.random.key(0), config, (16, 16))
    img = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))

    def loss(p):
        return jnp.mean(vit.apply(p, config, img) ** 2) + sum(
            jnp.sum(x**2) for x in jax.tree.leaves(p)
        )

    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in flat)
    assert any(np.any(g != 0) for g in flat)
