"""utils/flops.py — jaxpr-walk contraction FLOPs counter (the MFU
numerator for any registry family, tools/bench_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.utils.flops import (
    contraction_flops,
    forward_flops_per_img,
)


def test_dot_general_exact():
    a = jax.ShapeDtypeStruct((32, 64), jnp.float32)
    b = jax.ShapeDtypeStruct((64, 16), jnp.float32)
    got = contraction_flops(lambda x, y: x @ y, a, b)
    assert got == 2.0 * 32 * 64 * 16


def test_conv_exact():
    x = jax.ShapeDtypeStruct((4, 16, 16, 8), jnp.float32)
    w = jax.ShapeDtypeStruct((3, 3, 8, 24), jnp.float32)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = contraction_flops(conv, x, w)
    assert got == 2.0 * (4 * 16 * 16 * 24) * 3 * 3 * 8


def test_grouped_conv_counts_per_group():
    # depthwise: feature_group_count == C, kernel [k,k,1,C]
    x = jax.ShapeDtypeStruct((2, 8, 8, 16), jnp.float32)
    w = jax.ShapeDtypeStruct((3, 3, 1, 16), jnp.float32)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=16,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = contraction_flops(conv, x, w)
    assert got == 2.0 * (2 * 8 * 8 * 16) * 3 * 3 * 1


def test_scan_multiplies_by_length():
    w = jax.ShapeDtypeStruct((16, 16), jnp.float32)

    def body(h, _):
        return h @ jnp.eye(16, dtype=h.dtype), None

    def fn(w):
        h, _ = jax.lax.scan(body, w, None, length=5)
        return h

    got = contraction_flops(fn, w)
    assert got == 5 * 2.0 * 16 * 16 * 16


def test_flagship_matches_analytic_within_stem_excess():
    """The hand formula in bench.py counts a 7x7 conv0; the production
    model executes the phase-packed 8x8/s2 form (more MACs, same
    output) — the jaxpr count must sit just above the analytic one."""
    import bench

    cfg = ModelConfig(compute_dtype="bfloat16", image_size=224)
    got = forward_flops_per_img(cfg)
    want = bench._train_flops_per_img(cfg, 224) / 3.0
    assert want < got < 1.15 * want


@pytest.mark.parametrize("name,gmac", [("resnet50", 4.1),
                                       ("mobilenet_v2", 0.3)])
def test_known_family_flops(name, gmac):
    """Literature MAC counts (±10%): resnet50 ~4.1 GMAC,
    mobilenet_v2 ~0.3 GMAC at 224²."""
    cfg = ModelConfig(name=name, image_size=224,
                      compute_dtype="bfloat16")
    got = forward_flops_per_img(cfg)
    assert got == pytest.approx(2e9 * gmac, rel=0.12)
