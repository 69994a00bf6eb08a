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


class TestReluMaxPool:
    """Fused ReLU+pool with the selector-saving VJP
    (ops.pooling.relu_max_pool_2x2)."""

    def test_forward_matches_relu_then_pool(self):
        import flax.linen as nn

        from skin_image_analysis_tpu.ops.pooling import relu_max_pool_2x2

        x = jax.random.normal(jax.random.key(0), (3, 8, 10, 5), jnp.float32)
        ref = nn.max_pool(nn.relu(x), (2, 2), strides=(2, 2))
        out = relu_max_pool_2x2(x)
        assert jnp.allclose(out, ref)

    def test_grad_matches_stock_when_no_ties(self):
        import flax.linen as nn

        from skin_image_analysis_tpu.ops.pooling import relu_max_pool_2x2

        # continuous random input: no exact ties, so the selector VJP and
        # SelectAndScatter route identical gradients
        x = jax.random.normal(jax.random.key(1), (2, 6, 6, 4), jnp.float32)

        def f_fused(x):
            return jnp.sum(relu_max_pool_2x2(x) ** 2)

        def f_stock(x):
            return jnp.sum(nn.max_pool(nn.relu(x), (2, 2), strides=(2, 2)) ** 2)

        g1 = jax.grad(f_fused)(x)
        g2 = jax.grad(f_stock)(x)
        assert jnp.allclose(g1, g2, atol=1e-6)

    def test_dead_window_gets_zero_grad(self):
        from skin_image_analysis_tpu.ops.pooling import relu_max_pool_2x2

        x = -jnp.ones((1, 2, 2, 1), jnp.float32)  # all-negative window
        out, vjp = jax.vjp(relu_max_pool_2x2, x)
        assert float(out[0, 0, 0, 0]) == 0.0
        (dx,) = vjp(jnp.ones_like(out))
        assert jnp.all(dx == 0)

    def test_positive_tie_first_match_wins(self):
        from skin_image_analysis_tpu.ops.pooling import relu_max_pool_2x2

        x = jnp.array([[[[2.0], [2.0]], [[1.0], [2.0]]]])  # 1x2x2x1, tie
        out, vjp = jax.vjp(relu_max_pool_2x2, x)
        (dx,) = vjp(jnp.ones_like(out))
        # full cotangent to position (0,0) only — grad mass is conserved
        assert float(dx.sum()) == 1.0
        assert float(dx[0, 0, 0, 0]) == 1.0

    def test_bf16_and_odd_free_shapes(self):
        from skin_image_analysis_tpu.ops.pooling import relu_max_pool_2x2

        x = jax.random.normal(jax.random.key(2), (2, 4, 4, 3), jnp.bfloat16)
        out = relu_max_pool_2x2(x)
        assert out.shape == (2, 2, 2, 3) and out.dtype == jnp.bfloat16

    def test_model_fused_flag_forward_parity(self):
        """fused_pool=True/False give identical forward log-probs."""
        from skin_image_analysis_tpu.config import ModelConfig
        from skin_image_analysis_tpu.models.cnn import build_model

        x = jax.random.uniform(jax.random.key(3), (2, 16, 16, 3))
        cfgs = [
            ModelConfig(conv_features=(4, 8), linear_features=(16,),
                        dropout=(0.0,), image_size=16,
                        compute_dtype="float32", fused_pool=fp)
            for fp in (True, False)
        ]
        models = [build_model(c) for c in cfgs]
        v = models[0].init({"params": jax.random.key(4)}, x, train=False)
        out_fused = models[0].apply(v, x, train=False)
        out_stock = models[1].apply(v, x, train=False)
        assert jnp.allclose(out_fused, out_stock, atol=1e-6)


class TestPhasePacking:
    """Pool-phase-packed conv block (ops.pooling.phase_packed_conv_block):
    a stride-2 conv with phase-stacked kernels + channel-group max must be
    bit-equal to conv(stride 1, SAME) + ReLU + 2x2 max-pool."""

    def _stock(self, x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return nn.max_pool(nn.relu(y), (2, 2), strides=(2, 2))

    @staticmethod
    def _rand(key, shape):
        return jax.random.normal(key, shape, jnp.float32)

    def test_forward_parity_k7_and_k3(self):
        from skin_image_analysis_tpu.ops.pooling import phase_packed_conv_block

        for k, cin, cout, size in [(7, 3, 8, 16), (3, 8, 16, 12)]:
            kx, kw = jax.random.split(jax.random.key(k))
            x = self._rand(kx, (2, size, size, cin))
            w = self._rand(kw, (k, k, cin, cout)) * 0.2
            b = jnp.linspace(-0.1, 0.1, cout)
            got = phase_packed_conv_block(x, w, b)
            want = self._stock(x, w, b)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
            )

    def test_grad_parity(self):
        from skin_image_analysis_tpu.ops.pooling import phase_packed_conv_block

        kx, kw = jax.random.split(jax.random.key(0))
        x = self._rand(kx, (2, 12, 12, 4))
        w = self._rand(kw, (3, 3, 4, 6)) * 0.3
        b = jnp.zeros((6,))

        def f_packed(x, w):
            return jnp.sum(phase_packed_conv_block(x, w, b) ** 2)

        def f_stock(x, w):
            return jnp.sum(self._stock(x, w, b) ** 2)

        gx1, gw1 = jax.grad(f_packed, argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(f_stock, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   atol=1e-4, rtol=1e-4)

    def test_model_pool_modes_forward_parity(self):
        """phase / selector / stock ConvBlock lowerings share parameters
        and produce identical forward outputs."""
        from skin_image_analysis_tpu.config import ModelConfig
        from skin_image_analysis_tpu.models.cnn import build_model

        x = jax.random.uniform(jax.random.key(3), (2, 16, 16, 3))
        outs = []
        variables = None
        for mode in ("phase", "selector", "stock"):
            cfg = ModelConfig(conv_features=(4, 8), linear_features=(16,),
                              dropout=(0.0,), image_size=16,
                              compute_dtype="float32", pool_mode=mode)
            m = build_model(cfg)
            if variables is None:
                variables = m.init({"params": jax.random.key(4)}, x,
                                   train=False)
            outs.append(m.apply(variables, x, train=False))
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[2]),
                                   atol=1e-5)

    def test_relu_max_phase_dead_and_tie(self):
        from skin_image_analysis_tpu.ops.pooling import relu_max_phase

        # all-negative groups -> zero output, zero grad
        y4 = -jnp.ones((1, 1, 1, 8), jnp.float32)
        out, vjp = jax.vjp(relu_max_phase, y4)
        assert jnp.all(out == 0)
        (d,) = vjp(jnp.ones_like(out))
        assert jnp.all(d == 0)
        # positive tie -> first phase wins, grad mass conserved
        y4 = jnp.array([2.0, 2.0, 1.0, 2.0, 1.0, 1.0, 1.0, 1.0]).reshape(
            1, 1, 1, 8)  # C=2: phases for ch0 = [2,1,1,1], ch1 = [2,2,1,1]... 
        # layout [.., 4, C]: values per (phase, ch)
        y4 = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8) * 0 + \
            jnp.array([5.0, 1.0, 5.0, 1.0, 3.0, 1.0, 2.0, 1.0]).reshape(1, 1, 1, 8)
        out, vjp = jax.vjp(relu_max_phase, y4)
        (d,) = vjp(jnp.ones_like(out))
        assert float(d.sum()) == float(out.shape[-1] * 1.0)


def test_relu_max_pool_odd_dims_match_stock():
    """Odd trailing rows/cols: VALID crop semantics + zero grads there
    (the HPO space pools down to 7x7, tone_bias_optuna.py:138)."""
    from skin_image_analysis_tpu.ops.pooling import relu_max_pool_2x2

    x = jax.random.normal(jax.random.key(9), (2, 7, 9, 4), jnp.float32)
    want = nn.max_pool(nn.relu(x), (2, 2), strides=(2, 2))
    got = relu_max_pool_2x2(x)
    assert got.shape == want.shape == (2, 3, 4, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def f(x):
        return jnp.sum(relu_max_pool_2x2(x) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    # cropped tail gets zero gradient
    assert jnp.all(g[:, 6, :, :] == 0) and jnp.all(g[:, :, 8, :] == 0)


def test_convblock_auto_falls_back_on_odd_input():
    """pool_mode='auto' must not route odd spatial inputs through the
    packed stride-2 conv (boundary semantics differ)."""
    from skin_image_analysis_tpu.models.cnn import ConvBlock

    x = jax.random.uniform(jax.random.key(1), (2, 7, 7, 3))
    blk = ConvBlock(features=8, kernel=3, compute_dtype="float32")
    v = blk.init(jax.random.key(2), x)
    out = blk.apply(v, x)
    ref = ConvBlock(features=8, kernel=3, compute_dtype="float32",
                    pool_mode="stock").apply(v, x)
    assert out.shape == (2, 3, 3, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
