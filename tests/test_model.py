"""Model-layer checks vs the reference architecture
(tone_bias_model.py:56-152): shapes, log-softmax head, parameter count of
the production config (~51.4M, dominated by the 100352x512 flatten Dense)."""

import numpy as np

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.models import SkinCancerListModel, build_model


def test_forward_shape_and_logprobs():
    # shape contract at production resolution via eval_shape (no compile)
    model = SkinCancerListModel(compute_dtype="float32")
    big = jnp.zeros((2, 224, 224, 3), jnp.float32)
    var_shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, train=False), jax.random.key(0), big
    )
    out_shape = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), var_shapes, big
    )
    assert out_shape.shape == (2, 2) and out_shape.dtype == jnp.float32
    # numerics at a small, fast-compiling resolution
    x = jnp.linspace(0, 1, 2 * 64 * 64 * 3, dtype=jnp.float32).reshape(2, 64, 64, 3)
    params = model.init(jax.random.key(0), x, train=False)["params"]
    out = model.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(
        np.exp(np.asarray(out)).sum(axis=-1), 1.0, rtol=1e-5
    )


def test_param_count_production_config():
    model = SkinCancerListModel(compute_dtype="float32")
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda k, xx: model.init(k, xx, train=False), jax.random.key(0), x
    )
    n = sum(p.size for p in jax.tree.leaves(shapes["params"]))
    # conv: 7*7*3*32+32 + 3*3*32*64+64 + 3*3*64*128+128
    # mlp: 100352*512+512 + 512*256+256 + 256*2+2
    expect = (7 * 7 * 3 * 32 + 32) + (3 * 3 * 32 * 64 + 64) + (
        3 * 3 * 64 * 128 + 128
    ) + (128 * 28 * 28 * 512 + 512) + (512 * 256 + 256) + (256 * 2 + 2)
    assert n == expect, (n, expect)
    assert 51_000_000 < n < 52_000_000


def test_dropout_train_vs_eval():
    model = SkinCancerListModel(compute_dtype="float32")
    x = jnp.ones((2, 64, 64, 3), jnp.float32) * 0.5
    params = model.init(jax.random.key(0), x, train=False)["params"]
    eval1 = model.apply({"params": params}, x, train=False)
    eval2 = model.apply({"params": params}, x, train=False)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
    tr1 = model.apply(
        {"params": params}, x, train=True, rngs={"dropout": jax.random.key(1)}
    )
    tr2 = model.apply(
        {"params": params}, x, train=True, rngs={"dropout": jax.random.key(2)}
    )
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))


def test_build_model_from_config():
    cfg = ModelConfig(
        conv_features=(8, 16), linear_features=(32,), dropout=(0.25,),
        image_size=32, compute_dtype="float32",
    )
    model = build_model(cfg)
    x = jnp.zeros((3, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, train=False)["params"]
    out = model.apply({"params": params}, x, train=False)
    assert out.shape == (3, 2)


def test_bfloat16_compute_fp32_params():
    model = SkinCancerListModel()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, train=False)["params"]
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32
    out = model.apply({"params": params}, x, train=False)
    assert out.dtype == jnp.float32  # head always fp32


def test_remat_matches_no_remat():
    """Rematerialized model must be numerically identical (same params,
    same forward, same grads at f32)."""
    base = SkinCancerListModel(
        conv_features=(4, 8), linear_features=(16,), dropout=(0.0,),
        compute_dtype="float32",
    )
    remat = SkinCancerListModel(
        conv_features=(4, 8), linear_features=(16,), dropout=(0.0,),
        compute_dtype="float32", remat=True,
    )
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    params = base.init(jax.random.key(0), x, train=False)["params"]

    def loss(model, p):
        lp = model.apply({"params": p}, x, train=False)
        return jnp.sum(lp[:, 0])

    l1, g1 = jax.value_and_grad(lambda p: loss(base, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
