"""Device-side preprocessing semantics (ops/preprocess.py): eval
determinism, crop/flip/jitter behavior, ImageNet normalize, loss paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.ops.losses import cross_entropy_loss, nll_loss
from skin_image_analysis_tpu.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    AugmentConfig,
    preprocess_batch,
)


def test_eval_uint8_cast_and_resize(rng):
    x = rng.integers(0, 255, (2, 40, 40, 3)).astype(np.uint8)
    out = np.asarray(preprocess_batch(jnp.asarray(x), image_size=32))
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # deterministic
    out2 = np.asarray(preprocess_batch(jnp.asarray(x), image_size=32))
    np.testing.assert_array_equal(out, out2)


def test_eval_same_size_is_pure_cast(rng):
    x = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    out = np.asarray(preprocess_batch(jnp.asarray(x), image_size=32))
    np.testing.assert_allclose(out, x.astype(np.float32) / 255.0, atol=1e-7)


def test_train_random_crop_and_flip(rng):
    x = rng.integers(0, 255, (4, 48, 48, 3)).astype(np.uint8)
    aug = AugmentConfig(random_crop=True, horizontal_flip=True)
    a = np.asarray(
        preprocess_batch(jnp.asarray(x), jax.random.key(0), image_size=32,
                         train=True, augment=aug)
    )
    b = np.asarray(
        preprocess_batch(jnp.asarray(x), jax.random.key(1), image_size=32,
                         train=True, augment=aug)
    )
    assert a.shape == (4, 32, 32, 3)
    assert not np.allclose(a, b)  # different keys → different crops/flips
    a2 = np.asarray(
        preprocess_batch(jnp.asarray(x), jax.random.key(0), image_size=32,
                         train=True, augment=aug)
    )
    np.testing.assert_array_equal(a, a2)  # same key → deterministic


def test_color_jitter_stays_in_range(rng):
    x = rng.integers(0, 255, (3, 32, 32, 3)).astype(np.uint8)
    aug = AugmentConfig(random_crop=False, horizontal_flip=False,
                        brightness=0.5, contrast=0.5, saturation=0.5)
    out = np.asarray(
        preprocess_batch(jnp.asarray(x), jax.random.key(2), image_size=32,
                         train=True, augment=aug)
    )
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert not np.allclose(out, x.astype(np.float32) / 255.0)


def test_imagenet_normalize(rng):
    x = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    out = np.asarray(
        preprocess_batch(jnp.asarray(x), image_size=32,
                         normalize_imagenet=True)
    )
    want = (x.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN)) / (
        np.asarray(IMAGENET_STD)
    )
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_nll_matches_cross_entropy(rng):
    logits = jnp.asarray(rng.normal(size=(8, 2)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 8), jnp.int32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    a = float(nll_loss(log_probs, labels))
    b = float(cross_entropy_loss(logits, labels))
    assert a == pytest.approx(b, rel=1e-6)


def test_weighted_nll_torch_semantics(rng):
    """Weighted mean = sum(w_y * l) / sum(w_y), the torch NLLLoss
    weighted-reduction formula (ToneClassifier loss, CNNTrial.py:95)."""
    log_probs = jnp.log(jnp.asarray([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]]))
    labels = jnp.asarray([0, 1, 1], jnp.int32)
    w = (2.0, 0.5)
    got = float(nll_loss(log_probs, labels, jnp.asarray(w)))
    ls = [-np.log(0.9), -np.log(0.8), -np.log(0.4)]
    want = (2.0 * ls[0] + 0.5 * ls[1] + 0.5 * ls[2]) / (2.0 + 0.5 + 0.5)
    assert got == pytest.approx(want, rel=1e-6)


def test_occlusion_map(rng):
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.explain import occlusion_map
    from skin_image_analysis_tpu.models import build_model

    cfg = ModelConfig(conv_features=(4,), linear_features=(8,),
                      dropout=(0.1,), image_size=16, compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x, train=False)["params"]
    target = jnp.zeros((2,), jnp.int32)
    out = occlusion_map(model.apply, params, x, target, patch_size=8, stride=4)
    assert out.shape == (2, 3, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_input_affine_generalizes_imagenet(rng):
    """input_affine=(1/std, -mean/std) is numerically the ImageNet
    normalization; a scalar affine broadcasts; combining with the flag
    errors (exclusive by contract)."""
    import pytest

    from skin_image_analysis_tpu.ops.preprocess import normalize_affine

    x = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    std = np.asarray(IMAGENET_STD, np.float64)
    mean = np.asarray(IMAGENET_MEAN, np.float64)
    affine = normalize_affine(
        (tuple(1.0 / std), tuple(-mean / std)))
    got = np.asarray(
        preprocess_batch(jnp.asarray(x), image_size=32,
                         input_affine=affine)
    )
    want = np.asarray(
        preprocess_batch(jnp.asarray(x), image_size=32,
                         normalize_imagenet=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)

    # the EfficientNetV2-S convention: 255/128 * x01 - 1
    got = np.asarray(
        preprocess_batch(jnp.asarray(x), image_size=32,
                         input_affine=normalize_affine(
                             (255.0 / 128.0, -1.0)))
    )
    want = x.astype(np.float32) / 128.0 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-5)

    with pytest.raises(ValueError, match="exclusive"):
        preprocess_batch(jnp.asarray(x), image_size=32,
                         normalize_imagenet=True,
                         input_affine=normalize_affine((2.0, -1.0)))


def test_normalize_affine_canonicalizes():
    from skin_image_analysis_tpu.ops.preprocess import normalize_affine

    assert normalize_affine(None) is None
    # scalars broadcast; JSON lists become hashable tuples
    got = normalize_affine([[2.0], [0.5, 0.5, 0.5]])
    assert got == ((2.0, 2.0, 2.0), (0.5, 0.5, 0.5))
    hash(got)  # usable as a jit static argument
    assert normalize_affine((3, -1)) == ((3.0,) * 3, (-1.0,) * 3)
