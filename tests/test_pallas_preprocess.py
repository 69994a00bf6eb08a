"""Pallas fused preprocess kernel vs the jnp reference implementation
(interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.ops.pallas.preprocess_kernel import (
    fused_preprocess_planar,
    preprocess_planar_batch,
)

_ON_TPU = jax.devices()[0].platform not in ("cpu",)


@pytest.fixture(autouse=True)
def _interpret_on_cpu(monkeypatch):
    if not _ON_TPU:
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


def _ref(pixels, offsets, flips, scale, bias, t):
    """numpy reference of the fused kernel semantics."""
    b, ch, s, _ = pixels.shape
    out = np.empty((b, ch, t, t), np.float32)
    for i in range(b):
        y0, x0 = int(offsets[i, 0]), int(offsets[i, 1])
        tile = pixels[i, :, y0 : y0 + t, x0 : x0 + t].astype(np.float32)
        if flips[i]:
            tile = tile[:, :, ::-1]
        out[i] = tile * scale[:, None, None] + bias[:, None, None]
    return out


def test_kernel_matches_reference():
    rng = np.random.default_rng(0)
    b, ch, s, t = 4, 3, 64, 48
    pixels = rng.integers(0, 255, (b, ch, s, s)).astype(np.uint8)
    offsets = rng.integers(0, s - t + 1, (b, 2)).astype(np.int32)
    flips = np.array([0, 1, 0, 1], np.int32)
    scale = np.array([1 / 255, 2 / 255, 0.5 / 255], np.float32)
    bias = np.array([0.0, -0.1, 0.2], np.float32)
    got = np.asarray(
        fused_preprocess_planar(
            jnp.asarray(pixels), jnp.asarray(offsets), jnp.asarray(flips),
            jnp.asarray(scale), jnp.asarray(bias), image_size=t,
        )
    )
    want = _ref(pixels, offsets, flips, scale, bias, t)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_wrapper_eval_matches_jnp_path():
    """Center-crop eval through the kernel must equal the jnp preprocess
    (up to layout) on same-size inputs."""
    from skin_image_analysis_tpu.ops.preprocess import preprocess_batch

    rng = np.random.default_rng(1)
    b, s, t = 2, 56, 56  # same size → crop degenerates, pure cast
    hwc = rng.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
    planar = np.transpose(hwc, (0, 3, 1, 2)).copy()
    got = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), None, image_size=t, train=False
        )
    )
    want = np.asarray(preprocess_batch(jnp.asarray(hwc), image_size=t))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_wrapper_train_randomness():
    rng = np.random.default_rng(2)
    planar = rng.integers(0, 255, (4, 3, 40, 40)).astype(np.uint8)
    a = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), jax.random.key(0), image_size=32, train=True
        )
    )
    b = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), jax.random.key(1), image_size=32, train=True
        )
    )
    assert a.shape == (4, 32, 32, 3)
    assert not np.allclose(a, b)
    # deterministic under the same key
    a2 = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), jax.random.key(0), image_size=32, train=True
        )
    )
    np.testing.assert_array_equal(a, a2)
