"""Fast 2x2 maxpool: forward parity with flax nn.max_pool and gradient
correctness."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from skin_image_analysis_tpu.ops.pooling import max_pool_2x2


def test_forward_matches_flax(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 20, 5)), jnp.float32)
    got = max_pool_2x2(x)
    want = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_forward_odd_dims(rng):
    x = jnp.asarray(rng.normal(size=(1, 7, 9, 2)), jnp.float32)
    got = max_pool_2x2(x)
    want = nn.max_pool(x, (2, 2), strides=(2, 2))
    assert got.shape == want.shape == (1, 3, 4, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gradient_matches_reference_no_ties(rng):
    # distinct values → unique argmax → grads must match XLA's exactly
    x = jnp.asarray(
        rng.permutation(16 * 16 * 3).reshape(1, 16, 16, 3), jnp.float32
    )

    def f_ours(x):
        return jnp.sum(max_pool_2x2(x) ** 2)

    def f_ref(x):
        return jnp.sum(nn.max_pool(x, (2, 2), strides=(2, 2)) ** 2)

    g_ours = jax.grad(f_ours)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref))


def test_gradient_ties_conserve_subgradient():
    # all-equal window: our VJP sends the cotangent to every tied max
    x = jnp.ones((1, 2, 2, 1), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(max_pool_2x2(x)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones((1, 2, 2, 1)))


def test_grad_shape_odd_input(rng):
    x = jnp.asarray(rng.normal(size=(1, 5, 6, 2)), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(max_pool_2x2(x)))(x)
    assert g.shape == x.shape
    # cropped odd row receives zero gradient
    assert np.asarray(g)[:, 4, :, :].sum() == 0


def test_hybrid_pool_matches(rng):
    from skin_image_analysis_tpu.ops.pooling import max_pool_2x2_hybrid

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2_hybrid(x)),
        np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))),
    )
    x2 = jnp.asarray(
        rng.permutation(8 * 8 * 3).reshape(1, 8, 8, 3), jnp.float32
    )
    g1 = jax.grad(lambda v: jnp.sum(max_pool_2x2_hybrid(v) ** 2))(x2)
    g2 = jax.grad(
        lambda v: jnp.sum(nn.max_pool(v, (2, 2), strides=(2, 2)) ** 2)
    )(x2)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))
