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
    """numpy reference of the fused kernel semantics (per-image affine)."""
    b, ch, s, _ = pixels.shape
    out = np.empty((b, ch, t, t), np.float32)
    for i in range(b):
        y0, x0 = int(offsets[i, 0]), int(offsets[i, 1])
        tile = pixels[i, :, y0 : y0 + t, x0 : x0 + t].astype(np.float32)
        if flips[i]:
            tile = tile[:, :, ::-1]
        out[i] = tile * scale[i][:, None, None] + bias[i][:, None, None]
    return out


def test_kernel_matches_reference():
    rng = np.random.default_rng(0)
    b, ch, s, t = 4, 3, 64, 48
    pixels = rng.integers(0, 255, (b, ch, s, s)).astype(np.uint8)
    offsets = rng.integers(0, s - t + 1, (b, 2)).astype(np.int32)
    flips = np.array([0, 1, 0, 1], np.int32)
    scale = np.tile(
        np.array([1 / 255, 2 / 255, 0.5 / 255], np.float32), (b, 1)
    ) * rng.uniform(0.9, 1.1, (b, 1)).astype(np.float32)
    bias = np.tile(np.array([0.0, -0.1, 0.2], np.float32), (b, 1))
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
    from skin_image_analysis_tpu.ops.preprocess import AugmentConfig

    rng = np.random.default_rng(2)
    planar = rng.integers(0, 255, (4, 3, 40, 40)).astype(np.uint8)
    aug = AugmentConfig()
    a = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), jax.random.key(0), image_size=32,
            train=True, augment=aug,
        )
    )
    b = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), jax.random.key(1), image_size=32,
            train=True, augment=aug,
        )
    )
    assert a.shape == (4, 32, 32, 3)
    assert not np.allclose(a, b)
    # deterministic under the same key
    a2 = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), jax.random.key(0), image_size=32,
            train=True, augment=aug,
        )
    )
    np.testing.assert_array_equal(a, a2)


def test_wrapper_jitter_tail_bounded_and_random():
    """brightness/contrast/saturation jitter: output stays in [0,1]
    pre-normalize, per-image randomness, deterministic under one key."""
    from skin_image_analysis_tpu.ops.preprocess import AugmentConfig

    rng = np.random.default_rng(3)
    planar = rng.integers(0, 255, (4, 3, 40, 40)).astype(np.uint8)
    aug = AugmentConfig(brightness=0.3, contrast=0.3, saturation=0.3)

    def run(seed):
        return np.asarray(
            preprocess_planar_batch(
                jnp.asarray(planar), jax.random.key(seed), image_size=32,
                train=True, augment=aug,
            )
        )

    a, b = run(0), run(1)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert not np.allclose(a, b)
    np.testing.assert_array_equal(a, run(0))


def test_wrapper_brightness_only_folds_into_kernel():
    """brightness-only augment: result equals manual crop*factor/255,
    clipped — proving the fold into the kernel affine is correct."""
    from skin_image_analysis_tpu.ops.preprocess import AugmentConfig

    rng = np.random.default_rng(4)
    planar = rng.integers(0, 255, (2, 3, 32, 32)).astype(np.uint8)
    aug = AugmentConfig(random_crop=False, horizontal_flip=False,
                        brightness=0.5)
    key = jax.random.key(7)
    got = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), key, image_size=32, train=True, augment=aug,
        )
    )
    # reproduce the wrapper's own factor derivation (split order is part
    # of the contract: ky, kx, kf, kb, kc, ks)
    kb = jax.random.split(key, 6)[3]
    f = np.asarray(jax.random.uniform(kb, (2, 1), minval=0.5, maxval=1.5))
    want = np.clip(
        np.transpose(planar, (0, 2, 3, 1)).astype(np.float32) / 255.0
        * f[:, :, None, None],
        0.0, 1.0,
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
