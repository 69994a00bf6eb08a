"""Fused phase-conv0 Pallas kernel (ops/pallas/convblock_kernel.py) vs
the XLA reference lowering — forward bit-parity (bf16 tolerance) and
gradient parity for dW, db, and dx (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from skin_image_analysis_tpu.ops.pallas.convblock_kernel import (
    fused_phase_conv0,
)


def _stock(x_planar, w, b):
    # f32 reference (the kernel's bf16 MXU accumulation is the only
    # numeric divergence, covered by the tolerances)
    x = jnp.transpose(x_planar, (0, 2, 3, 1))
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    return nn.max_pool(nn.relu(y), (2, 2), strides=(2, 2))


def _rand(key, shape, scale=1.0):
    return jax.random.normal(key, shape, jnp.float32) * scale


def test_forward_matches_stock():
    kx, kw = jax.random.split(jax.random.key(0))
    x = _rand(kx, (2, 3, 16, 16))
    w = _rand(kw, (7, 7, 3, 32), 0.2)
    b = jnp.linspace(-0.05, 0.05, 32)
    got = fused_phase_conv0(x, w, b)
    want = _stock(x, w, b)
    assert got.shape == (2, 8, 8, 32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,  # bf16 matmul accumulation
    )


def test_grads_match_stock():
    kx, kw = jax.random.split(jax.random.key(1))
    x = _rand(kx, (2, 3, 16, 16))
    w = _rand(kw, (7, 7, 3, 32), 0.2)
    b = jnp.zeros((32,))

    def f_fused(x, w, b):
        return jnp.sum(fused_phase_conv0(x, w, b).astype(jnp.float32) ** 2)

    def f_stock(x, w, b):
        return jnp.sum(_stock(x, w, b).astype(jnp.float32) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(f_stock, argnums=(0, 1, 2))(x, w, b)
    # the kernel runs its matmuls in bf16 (f32 accumulation); near-tie
    # pool windows can route to a different (equally maximal in bf16)
    # position than the f32 reference, so compare direction + scaled
    # magnitude rather than elementwise bits
    for a, bb, name in zip(g1, g2, ("dx", "dw", "db")):
        na = np.asarray(a, np.float32).ravel()
        nb = np.asarray(bb, np.float32).ravel()
        cos = float(na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb)))
        assert cos > 0.999, f"{name} direction mismatch (cos={cos})"
        scale = max(np.abs(nb).max(), 1e-3)
        np.testing.assert_allclose(
            na / scale, nb / scale, atol=8e-2,
            err_msg=f"{name} mismatch",
        )


def test_odd_chunking_sizes():
    # H/2 not divisible by 28 exercises the chunk fallback
    kx, kw = jax.random.split(jax.random.key(2))
    x = _rand(kx, (1, 3, 24, 24))
    w = _rand(kw, (7, 7, 3, 32), 0.2)
    b = jnp.zeros((32,))
    got = fused_phase_conv0(x, w, b)
    want = _stock(x, w, b)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )
