"""Attribution methods: IG completeness, saliency, Grad-CAM tail
equivalence (reference behaviors: tone_bias_explain.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.explain import (
    grad_cam,
    integrated_gradients,
    saliency,
    smoothgrad,
)
from skin_image_analysis_tpu.models import build_model

CFG = ModelConfig(
    conv_features=(4, 8), linear_features=(16,), dropout=(0.2,),
    image_size=16, compute_dtype="float32",
)


@pytest.fixture(scope="module")
def model_and_params():
    model = build_model(CFG)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, train=False)["params"]
    return model, params


def test_integrated_gradients_completeness(model_and_params):
    """IG's completeness axiom: attributions sum ≈ F(x) - F(baseline)."""
    model, params = model_and_params
    x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
    target = jnp.asarray([1, 0], jnp.int32)
    attr = integrated_gradients(
        model.apply, params, x, target, n_steps=256
    )
    assert attr.shape == x.shape

    def f(inp):
        lp = model.apply({"params": params}, inp, train=False)
        return np.asarray(
            jnp.take_along_axis(lp, target[:, None], axis=-1)[:, 0]
        )

    total = np.asarray(attr).sum(axis=(1, 2, 3))
    expected = f(x) - f(jnp.zeros_like(x))
    np.testing.assert_allclose(total, expected, rtol=0.05, atol=5e-3)


def test_saliency_shape_and_nonneg(model_and_params):
    model, params = model_and_params
    x = jax.random.uniform(jax.random.key(2), (3, 16, 16, 3))
    target = jnp.zeros((3,), jnp.int32)
    s = saliency(model.apply, params, x, target)
    assert s.shape == x.shape
    assert (np.asarray(s) >= 0).all()
    assert np.asarray(s).sum() > 0


def test_smoothgrad(model_and_params):
    model, params = model_and_params
    x = jax.random.uniform(jax.random.key(3), (1, 16, 16, 3))
    target = jnp.zeros((1,), jnp.int32)
    sg = smoothgrad(model.apply, params, x, target, jax.random.key(4),
                    n_samples=4, sigma=0.05)
    assert sg.shape == x.shape
    assert (np.asarray(sg) >= 0).all()


def test_grad_cam(model_and_params):
    model, params = model_and_params
    x = jax.random.uniform(jax.random.key(5), (2, 16, 16, 3))
    target = jnp.asarray([1, 1], jnp.int32)
    cam = grad_cam(model, params, x, target)
    # last conv block of (4, 8): two 2x2 pools → 4x4 spatial map
    assert cam.shape == (2, 4, 4)
    cam = np.asarray(cam)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


def test_grad_cam_tail_matches_full_forward(model_and_params):
    """The sequential-tail replay used by Grad-CAM must reproduce the full
    model's output when fed the captured activation."""
    from skin_image_analysis_tpu.explain.attribution import (
        _flatten_intermediates,
        _sequential_tail,
    )

    model, params = model_and_params
    x = jax.random.uniform(jax.random.key(6), (2, 16, 16, 3))
    full = model.apply({"params": params}, x, train=False)
    _, inter = model.apply(
        {"params": params}, x, train=False,
        capture_intermediates=lambda mdl, name: name == "__call__",
        mutable=["intermediates"],
    )
    flat = _flatten_intermediates(inter["intermediates"])
    act_key = [k for k in flat if k.endswith("ConvBlock_1/__call__")][0]
    replay = _sequential_tail(model, params, flat[act_key], 1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(replay), rtol=1e-5)


def test_viz_triptych(tmp_path, model_and_params):
    from skin_image_analysis_tpu.explain.viz import visualize_attribution_triptych

    img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    attr = np.random.default_rng(1).normal(size=(16, 16, 3)).astype(np.float32)
    out = str(tmp_path / "trip.png")
    visualize_attribution_triptych(img, attr, title="t", save_path=out)
    import os

    assert os.path.exists(out)


def test_grad_cam_gap_head_resnet():
    from skin_image_analysis_tpu.explain import grad_cam_gap_head
    from skin_image_analysis_tpu.models.resnet import resnet18

    model = resnet18(compute_dtype="float32")
    x = jax.random.uniform(jax.random.key(7), (2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    target = jnp.asarray([1, 0], jnp.int32)
    cam = grad_cam_gap_head(model, dict(variables), x, target)
    assert cam.ndim == 3 and cam.shape[0] == 2
    cam = np.asarray(cam)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    assert np.isfinite(cam).all()


def test_gradient_shap(model_and_params):
    from skin_image_analysis_tpu.explain import gradient_shap

    model, params = model_and_params
    x = jax.random.uniform(jax.random.key(8), (2, 16, 16, 3))
    target = jnp.zeros((2,), jnp.int32)
    attr = gradient_shap(
        model.apply, params, x, target, jax.random.key(9),
        n_baselines=3, n_steps=8,
    )
    assert attr.shape == x.shape
    assert np.isfinite(np.asarray(attr)).all()
    assert np.abs(np.asarray(attr)).sum() > 0


def test_attribution_accepts_batchnorm_variables():
    """IG/saliency/smoothgrad/occlusion take a full variables dict
    ({"params","batch_stats"}) so BatchNorm transfer models (ResNet/
    Xception fine-tunes) attribute without a wrapper shim."""
    import jax
    import numpy as np

    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.explain.attribution import (
        integrated_gradients,
        saliency,
        smoothgrad,
    )
    from skin_image_analysis_tpu.explain.occlusion import occlusion_map
    from skin_image_analysis_tpu.train.state import create_train_state

    cfg = ModelConfig(name="resnet18", image_size=32,
                      compute_dtype="float32")
    state, model = create_train_state(
        cfg, OptimConfig(learning_rate=1e-3), jax.random.key(0),
        batch_size=2,
    )
    assert state.batch_stats is not None
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    target = jnp.zeros(2, jnp.int32)

    ig = integrated_gradients(model.apply, variables, x, target, n_steps=4)
    assert ig.shape == x.shape and bool(jnp.all(jnp.isfinite(ig)))
    sal = saliency(model.apply, variables, x, target)
    assert sal.shape == x.shape and bool(jnp.all(sal >= 0))
    sg = smoothgrad(model.apply, variables, x, target, jax.random.key(1),
                    n_samples=2)
    assert sg.shape == x.shape
    occ = occlusion_map(model.apply, variables, x, target,
                        patch_size=16, stride=16)
    assert occ.shape[0] == 2 and bool(jnp.all(jnp.isfinite(occ)))


def test_grad_cam_gap_head_resnet50_bottleneck():
    """Bottleneck-named blocks (resnet50) must be found by the
    activation matcher — a 'Block_N' substring search silently missed
    them (found on hardware driving the explain bench)."""
    import jax.numpy as jnp
    import numpy as np

    from skin_image_analysis_tpu.explain import grad_cam_gap_head
    from skin_image_analysis_tpu.models.resnet import resnet50

    model = resnet50(compute_dtype="float32")
    x = jax.random.uniform(jax.random.key(3), (1, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    target = jnp.asarray([1], jnp.int32)
    cam = np.asarray(grad_cam_gap_head(model, dict(variables), x, target))
    assert cam.shape[0] == 1 and np.isfinite(cam).all()
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
