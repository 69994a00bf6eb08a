"""EfficientNet family: forward contract + LIVE Keras oracle parity for
the weight converter (the same harness that pins the Xception converter,
tests/test_ham_xception.py). BASELINE.json's north star names the
ResNet/EfficientNet backbone class explicitly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_efficientnet_b0_forward():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model

    cfg = ModelConfig(name="efficientnet_b0", image_size=64,
                      compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0,
                               rtol=1e-5)
    assert "batch_stats" in variables


def test_efficientnet_variants_register():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model
    from skin_image_analysis_tpu.models.efficientnet import (
        round_filters,
        round_repeats,
    )

    for name in ("efficientnet_b1", "efficientnet_b2", "efficientnet_b3",
                 "efficientnet_b4", "efficientnet_b5", "efficientnet_b6",
                 "efficientnet_b7"):
        model = build_model(ModelConfig(name=name, num_classes=7))
        assert model.num_classes == 7
    # the keras scaling rules (parity-critical for the converter)
    assert round_filters(32, 1.0) == 32
    assert round_filters(32, 1.1) == 32   # B2 stem (divisor snap-down)
    assert round_filters(40, 1.1) == 48   # B2 stage 3 (rounds up)
    assert round_filters(1280, 1.2) == 1536  # B3 top
    assert round_repeats(3, 1.4) == 5     # B3 stage depth
    # the large-variant scaling (keras layer-width oracle below)
    assert round_filters(32, 1.4) == 48   # B4 stem
    assert round_filters(1280, 2.0) == 2560  # B7 top
    assert round_repeats(4, 3.1) == 13    # B7 stage 6 depth


def test_efficientnet_b4_b7_scaling_matches_keras_oracle():
    """The compound-scaling coefficients for the large variants produce
    keras.applications' exact layer geometry: stem/top widths and
    per-stage block counts, probed on LIVE keras models (no weights
    downloaded)."""
    keras = pytest.importorskip("keras")

    from skin_image_analysis_tpu.models.efficientnet import (
        _B0_STAGES,
        _VARIANTS,
        round_filters,
        round_repeats,
    )

    for variant, kcls in (("b4", keras.applications.EfficientNetB4),
                          ("b7", keras.applications.EfficientNetB7)):
        w, d, _ = _VARIANTS[variant]
        kmodel = kcls(weights=None, include_top=False,
                      input_shape=(64, 64, 3))
        stem = kmodel.get_layer("stem_conv")
        assert stem.filters == round_filters(32, w)
        top = kmodel.get_layer("top_conv")
        assert top.filters == round_filters(1280, w)
        # per-stage block counts: keras names blocks "block{stage}{a..}"
        for i, (_, _, repeats, _, _) in enumerate(_B0_STAGES, start=1):
            n = sum(1 for layer in kmodel.layers
                    if layer.name.startswith(f"block{i}")
                    and layer.name.endswith("_project_conv"))
            assert n == round_repeats(repeats, d), (variant, i)


def test_efficientnet_train_mode_updates_bn():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model

    cfg = ModelConfig(name="efficientnet_b0", image_size=32,
                      compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.ones((2, 32, 32, 3), jnp.float32) * 0.7
    variables = model.init(jax.random.key(0), x, train=False)
    _, mutated = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    before = variables["batch_stats"]["stem_bn"]["mean"]
    after = mutated["batch_stats"]["stem_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_keras_efficientnet_weight_conversion_numerical_parity(tmp_path):
    """Full-oracle transfer fidelity: a LIVE keras.applications
    EfficientNetB0 (random weights + randomized BN stats — no downloads)
    writes its weights in the legacy .h5 layout the downloadable
    ``efficientnetb0_notop.h5`` uses; the h5py-only converter maps them
    into the Flax model, whose forward must match the Keras forward
    numerically. Covers every layer-name mapping, the depthwise
    transpose, SE conv biases, correct_pad stride-2 geometry, and the BN
    epsilon."""
    keras = pytest.importorskip("keras")
    import h5py

    from skin_image_analysis_tpu.models.efficientnet import (
        EfficientNet,
        load_keras_efficientnet_weights,
    )

    rng = np.random.default_rng(0)
    kmodel = keras.applications.EfficientNetB0(
        weights=None, include_top=False, input_shape=(96, 96, 3)
    )
    for layer in kmodel.layers:
        if isinstance(layer, keras.layers.BatchNormalization):
            c = layer.get_weights()[0].shape[0]
            layer.set_weights([
                rng.uniform(0.5, 1.5, c).astype(np.float32),
                rng.normal(0, 0.1, c).astype(np.float32),
                rng.normal(0, 0.05, c).astype(np.float32),
                rng.uniform(0.5, 1.5, c).astype(np.float32),
            ])

    def weight_names(layer):
        if isinstance(layer, keras.layers.DepthwiseConv2D):
            return ["depthwise_kernel", "bias"][: 1 + int(layer.use_bias)]
        if isinstance(layer, keras.layers.BatchNormalization):
            return ["gamma", "beta", "moving_mean", "moving_variance"]
        if isinstance(layer, keras.layers.Conv2D):
            return ["kernel", "bias"][: 1 + int(layer.use_bias)]
        if isinstance(layer, keras.layers.Normalization):
            n = len(layer.get_weights())
            return ["mean", "variance", "count"][:n]
        raise TypeError(f"{layer.name}: {type(layer)}")

    path = str(tmp_path / "efficientnetb0_legacy.h5")
    with h5py.File(path, "w") as f:
        layer_names = []
        for layer in kmodel.layers:
            ws = layer.get_weights()
            if not ws:
                continue
            layer_names.append(layer.name)
            g = f.create_group(layer.name)
            names = weight_names(layer)
            assert len(names) == len(ws), layer.name
            g.attrs["weight_names"] = [
                f"{layer.name}/{n}:0".encode() for n in names
            ]
            for n, w in zip(names, ws):
                g.create_dataset(f"{layer.name}/{n}:0", data=w)
        f.attrs["layer_names"] = [n.encode() for n in layer_names]

    model = EfficientNet(num_classes=2, compute_dtype="float32")
    x_raw = rng.uniform(0, 255, (2, 96, 96, 3)).astype(np.float32)

    # reproduce the keras in-model preprocessing from the LIVE layers
    # (Rescaling 1/255, then Normalization with whatever mean/variance
    # the unadapted layer actually holds) so our model sees the exact
    # tensor the first conv sees
    x_pre = x_raw
    for layer in kmodel.layers:
        if isinstance(layer, keras.layers.Rescaling):
            x_pre = x_pre * np.float32(layer.scale) + np.float32(
                layer.offset
            )
        elif isinstance(layer, keras.layers.Normalization):
            w = layer.get_weights()
            mean, var = np.float32(w[0]), np.float32(w[1])
            x_pre = (x_pre - mean) / np.sqrt(var)

    variables = model.init(
        jax.random.key(0), jnp.asarray(x_pre), train=False
    )
    variables = {k: dict(v) for k, v in variables.items()}
    converted = load_keras_efficientnet_weights(path, variables)

    w_head = rng.normal(0, 0.05, (1280, 2)).astype(np.float32)
    b_head = rng.normal(0, 0.05, 2).astype(np.float32)
    converted["params"]["Dense_0"] = {
        "kernel": jnp.asarray(w_head), "bias": jnp.asarray(b_head),
    }
    ours = np.asarray(
        model.apply(converted, jnp.asarray(x_pre), train=False)
    )

    feats = np.asarray(kmodel(x_raw, training=False))  # [2, 3, 3, 1280]
    logits = feats.mean(axis=(1, 2)) @ w_head + b_head
    theirs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)
