"""Space-to-depth conv stem (docs/PERF.md round-3 ladder): the
phase-packed conv block re-expressed over the 2x2 s2d input layout —
algebraically the same taps, a 4x denser MXU contraction. Equivalence is
pinned against the phase-packed and stock lowerings, and the Pallas
preprocess kernel's s2d emission against the reference layout transform
(reference conv stack: tone_bias_model.py:77-97)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.ops.pooling import (
    phase_packed_conv_block,
    s2d_conv_block,
    s2d_pack_kernel,
    space_to_depth_nhwc,
)


@pytest.mark.parametrize("k", [7, 3, 5])
def test_s2d_conv_block_matches_phase_and_stock(k):
    from flax import linen as nn

    rng = np.random.default_rng(k)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 3, 4)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(4) * 0.1, jnp.float32)

    got = s2d_conv_block(space_to_depth_nhwc(x), w, b)
    ref = phase_packed_conv_block(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    stock = nn.max_pool(nn.relu(y), (2, 2), (2, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(stock),
                               atol=2e-6)


def test_s2d_conv_block_grads_match_stock():
    from flax import linen as nn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 4)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(4) * 0.1, jnp.float32)

    def loss_s2d(w, b):
        return jnp.sum(s2d_conv_block(space_to_depth_nhwc(x), w, b) ** 2)

    def loss_stock(w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return jnp.sum(nn.max_pool(nn.relu(y), (2, 2), (2, 2)) ** 2)

    gw1, gb1 = jax.grad(loss_s2d, argnums=(0, 1))(w, b)
    gw2, gb2 = jax.grad(loss_stock, argnums=(0, 1))(w, b)
    scale = float(jnp.abs(gw2).max())
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                               atol=2e-5 * scale)


def test_s2d_pack_kernel_tap_count():
    """Every original tap appears exactly once in the s2d kernel: the
    packed (k+1)² kernel holds 4 phase copies of the k² taps; the s2d
    re-indexing redistributes them over (ks² z-channels) with zeros
    elsewhere."""
    w = jnp.ones((7, 7, 3, 2), jnp.float32)
    ws = s2d_pack_kernel(w)
    assert ws.shape == (5, 5, 12, 8)
    # total tap mass: 4 phases x (7*7 taps) x 3 cin x 2 cout
    assert float(ws.sum()) == 4 * 49 * 3 * 2
    w3 = jnp.ones((3, 3, 2, 2), jnp.float32)
    ws3 = s2d_pack_kernel(w3)
    assert ws3.shape == (3, 3, 8, 8)
    assert float(ws3.sum()) == 4 * 9 * 2 * 2


def test_space_to_depth_layout():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    z = space_to_depth_nhwc(x)
    assert z.shape == (2, 2, 2, 12)
    for dy in (0, 1):
        for dx in (0, 1):
            for c in range(3):
                np.testing.assert_array_equal(
                    np.asarray(z[:, :, :, c * 4 + 2 * dy + dx]),
                    np.asarray(x[:, dy::2, dx::2, c]),
                )


def test_kernel_s2d_emission_matches_layout_transform():
    """The Pallas preprocess kernel's space_to_depth output must equal
    space_to_depth_nhwc(plain kernel output) — same crops, same flips,
    same jitter tail, only the store layout differs. The contrast mean
    accumulates 12 quarter-tiles instead of 3 full tiles, so the jitter
    path is equal to f32 rounding (~1e-7), not bitwise."""
    from skin_image_analysis_tpu.ops.pallas.preprocess_kernel import (
        preprocess_planar_batch,
    )
    from skin_image_analysis_tpu.ops.preprocess import AugmentConfig

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.integers(0, 256, (4, 3, 16, 16)), jnp.uint8
    )
    aug = AugmentConfig(brightness=0.2, contrast=0.2, saturation=0.2)
    for key in (jax.random.key(0), jax.random.key(7)):
        plain = preprocess_planar_batch(
            pixels, key, image_size=8, train=True, augment=aug,
        )
        s2d = preprocess_planar_batch(
            pixels, key, image_size=8, train=True, augment=aug,
            space_to_depth=True,
        )
        assert s2d.shape == (4, 4, 4, 12)
        np.testing.assert_allclose(
            np.asarray(space_to_depth_nhwc(plain)), np.asarray(s2d),
            atol=2e-6,
        )


def test_kernel_s2d_no_jitter_path():
    from skin_image_analysis_tpu.ops.pallas.preprocess_kernel import (
        preprocess_planar_batch,
    )

    rng = np.random.default_rng(1)
    pixels = jnp.asarray(rng.integers(0, 256, (2, 3, 8, 8)), jnp.uint8)
    plain = preprocess_planar_batch(pixels, None, image_size=8)
    s2d = preprocess_planar_batch(
        pixels, None, image_size=8, space_to_depth=True
    )
    np.testing.assert_array_equal(
        np.asarray(space_to_depth_nhwc(plain)), np.asarray(s2d)
    )


def test_model_s2d_stem_end_to_end():
    """SkinCancerListModel(stem='s2d') must (a) share the param tree with
    the default lowering, (b) produce matching outputs from raw NHWC AND
    from kernel-emitted s2d input, (c) train (grads finite)."""
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models.cnn import build_model

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    kw = dict(conv_features=(8, 16), linear_features=(16,), dropout=(0.0,),
              image_size=32, compute_dtype="float32")
    m_ref = build_model(ModelConfig(**kw))
    m_s2d = build_model(ModelConfig(stem="s2d", **kw))
    v = m_ref.init({"params": jax.random.key(0)}, x, train=False)
    v2 = m_s2d.init({"params": jax.random.key(0)}, x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(v2)

    o_ref = m_ref.apply(v, x, train=False)
    o_nhwc = m_s2d.apply(v, x, train=False)
    o_z = m_s2d.apply(v, space_to_depth_nhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_nhwc),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_nhwc), np.asarray(o_z),
                               atol=1e-6)

    def loss(params):
        return jnp.sum(
            m_s2d.apply({"params": params}, x, train=False) ** 2
        )

    grads = jax.grad(loss)(v["params"])
    assert all(
        bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads)
    )


def test_model_s2d_falls_back_on_even_kernel_or_odd_dims():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models.cnn import build_model

    rng = np.random.default_rng(0)
    kw = dict(conv_features=(4,), linear_features=(8,), dropout=(0.0,),
              compute_dtype="float32")
    # even first kernel: s2d derivation needs SAME odd-kernel padding
    m = build_model(ModelConfig(stem="s2d", first_kernel=4,
                                image_size=16, **kw))
    x = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    assert m.apply(v, x, train=False).shape == (2, 2)
    # odd spatial dims cannot 2x2-s2d
    m2 = build_model(ModelConfig(stem="s2d", image_size=15, **kw))
    x2 = jnp.asarray(rng.random((2, 15, 15, 3)), jnp.float32)
    v2 = m2.init({"params": jax.random.key(0)}, x2, train=False)
    assert m2.apply(v2, x2, train=False).shape == (2, 2)


def test_stem_wants_s2d_mirrors_model_gate():
    """The preprocess-side predicate must match the model's use_s2d gate
    exactly — emitting s2d for a model that will not consume it would
    shape-error at the first conv."""
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models.cnn import stem_wants_s2d

    base = dict(conv_features=(8,), linear_features=(8,), dropout=(0.2,))
    assert stem_wants_s2d(ModelConfig(stem="s2d", **base))
    assert not stem_wants_s2d(ModelConfig(stem="phase", **base))
    assert not stem_wants_s2d(
        ModelConfig(stem="s2d", fused_pool=False, **base)
    )
    assert not stem_wants_s2d(
        ModelConfig(stem="s2d", first_kernel=4, **base)
    )
    assert not stem_wants_s2d(ModelConfig(name="resnet18", stem="s2d"))


def test_legacy_model_threads_s2d_stem():
    """ModelConfig(name='skin_cancer', stem='s2d') must actually thread
    the stem into the legacy model (stem_wants_s2d says the kernel may
    emit the s2d layout for it): raw NHWC and kernel-emitted s2d inputs
    produce identical outputs, both matching the default lowering."""
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models.cnn import build_model, stem_wants_s2d

    cfg = ModelConfig(name="skin_cancer", stem="s2d", image_size=32,
                      compute_dtype="float32")
    assert stem_wants_s2d(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    m_ref = build_model(ModelConfig(name="skin_cancer", image_size=32,
                                    compute_dtype="float32", stem="phase"))
    m = build_model(cfg)
    v = m_ref.init({"params": jax.random.key(0)}, x, train=False)
    assert jax.tree.structure(
        m.init({"params": jax.random.key(0)}, x, train=False)
    ) == jax.tree.structure(v)
    o_ref = m_ref.apply(v, x, train=False)
    o_raw = m.apply(v, x, train=False)
    o_s2d = m.apply(v, space_to_depth_nhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_raw),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_raw), np.asarray(o_s2d),
                               atol=1e-6)


def test_s2d_raw_input_with_4_channels_not_misread_as_phases():
    """A RAW input whose channel count is a multiple of 4 (in_channels=4)
    must still be space-to-depth-transformed — the already-s2d detection
    keys on exactly 4*in_channels, not on divisibility by 4 (a shape-only
    heuristic would silently scramble geometry)."""
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models.cnn import build_model

    kw = dict(conv_features=(8,), linear_features=(8,), dropout=(0.0,),
              image_size=16, in_channels=4, compute_dtype="float32")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 16, 16, 4)), jnp.float32)
    m_ref = build_model(ModelConfig(stem="phase", **kw))
    m = build_model(ModelConfig(stem="s2d", **kw))
    v = m_ref.init({"params": jax.random.key(0)}, x, train=False)
    o_ref = m_ref.apply(v, x, train=False)
    o_raw = m.apply(v, x, train=False)           # must transform inside
    o_pre = m.apply(v, space_to_depth_nhwc(x), train=False)  # 16-channel
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_raw),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_raw), np.asarray(o_pre),
                               atol=1e-6)
