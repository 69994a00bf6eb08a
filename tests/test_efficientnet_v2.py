"""EfficientNetV2 family (jgi_ham_2018_tf.ipynb cell 70's
EfficientNetV2B3 alternative): forward contract, keras geometry oracle,
LIVE-oracle numeric parity through both weight paths (legacy .h5
converter + .keras artifact import)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_efficientnet_v2_b0_forward():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model

    cfg = ModelConfig(name="efficientnet_v2_b0", image_size=64,
                      compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0,
                               rtol=1e-5)
    p = variables["params"]
    # fused stage-1 block: a single project_conv, no expand/dwconv
    assert "block1a_project_conv" in p
    assert "block1a_expand_conv" not in p
    # fused stage-2: expand 3x3, project 1x1, no depthwise, no SE
    assert "block2a_expand_conv" in p
    assert p["block2a_expand_conv"]["kernel"].shape == (3, 3, 16, 64)
    assert "block2a_dwconv2" not in p
    assert "block2a_se_reduce" not in p
    # MBConv stage-4: dwconv2 + SE reduce width from rounded input
    assert p["block4a_dwconv2"]["kernel"].shape == (3, 3, 1, 192)
    assert p["block4a_se_reduce"]["kernel"].shape == (1, 1, 192, 12)
    assert "bias" in p["block4a_se_reduce"]
    assert p["top_conv"]["kernel"].shape == (1, 1, 192, 1280)


def test_efficientnet_v2_variants_register():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model
    from skin_image_analysis_tpu.models.efficientnet_v2 import (
        block_counts,
        round_filters_v2,
    )

    for name in ("efficientnet_v2_b1", "efficientnet_v2_b2",
                 "efficientnet_v2_b3", "efficientnet_v2_s",
                 "efficientnet_v2_m", "efficientnet_v2_l"):
        model = build_model(ModelConfig(name=name, num_classes=7))
        assert model.num_classes == 7
    # v2's round_filters has NO 90% bump (differs from v1 at b2's stage 1)
    assert round_filters_v2(16, 1.2) == 16   # b3 stage 1 (snap DOWN)
    assert round_filters_v2(32, 1.2) == 40   # b3 stem
    assert round_filters_v2(1280, 1.2) == 1536  # b3 top
    assert round_filters_v2(112, 1.2) == 136    # b3 stage 5
    # structural fingerprints (the .keras importer's variant detection)
    assert block_counts("efficientnet_v2_b0") == (1, 2, 2, 3, 5, 8)
    assert block_counts("efficientnet_v2_b3") == (2, 3, 3, 5, 7, 12)
    assert block_counts("efficientnet_v2_s") == (2, 4, 4, 6, 9, 15)
    assert block_counts("efficientnet_v2_m") == (3, 5, 5, 7, 14, 18, 5)
    assert len({block_counts(v) for v in (
        "efficientnet_v2_b0", "efficientnet_v2_b1", "efficientnet_v2_b2",
        "efficientnet_v2_b3", "efficientnet_v2_s", "efficientnet_v2_m",
        "efficientnet_v2_l")}) == 7


def test_efficientnet_v2_geometry_matches_keras_oracle():
    """Stem/top widths, per-stage block counts, and every conv kernel
    shape + stride match LIVE keras.applications models (no weights
    downloaded) for the scaled B3 and the fixed-table S."""
    keras = pytest.importorskip("keras")

    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model

    for name, kcls in (
        ("efficientnet_v2_b3", keras.applications.EfficientNetV2B3),
        ("efficientnet_v2_s", keras.applications.EfficientNetV2S),
    ):
        kmodel = kcls(weights=None, include_top=False,
                      input_shape=(96, 96, 3))
        model = build_model(ModelConfig(name=name, image_size=96,
                                        compute_dtype="float32"))
        shapes = jax.eval_shape(
            lambda k, x: model.init(k, x, train=False),
            jax.random.key(0), jnp.zeros((1, 96, 96, 3), jnp.float32),
        )["params"]
        for layer in kmodel.layers:
            lname = type(layer).__name__
            if lname == "DepthwiseConv2D":
                kh, kw, c, m = layer.get_weights()[0].shape
                assert m == 1
                assert tuple(shapes[layer.name]["kernel"].shape) == \
                    (kh, kw, 1, c), (name, layer.name)
            elif lname == "Conv2D":
                k = layer.get_weights()[0].shape
                assert tuple(shapes[layer.name]["kernel"].shape) == \
                    tuple(k), (name, layer.name)


def test_efficientnet_v2_train_mode_updates_bn_and_drops():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model

    cfg = ModelConfig(name="efficientnet_v2_b0", image_size=32,
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
    # keras' stochastic-depth accounting: the first residual block
    # (block1a: b=0) has NO drop module; later residual blocks do
    params = variables["params"]
    assert "block1a_drop" not in params  # rate 0 -> no layer
    # (drop layers are rng-only, not params — assert via a train apply
    # with a fixed dropout key changing the output)
    out1 = model.apply(variables, x, train=True,
                       rngs={"dropout": jax.random.key(1)},
                       mutable=["batch_stats"])[0]
    out2 = model.apply(variables, x, train=True,
                       rngs={"dropout": jax.random.key(2)},
                       mutable=["batch_stats"])[0]
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_keras_efficientnet_v2_weight_conversion_numerical_parity(
    tmp_path,
):
    """Full-oracle transfer fidelity for the legacy-.h5 path: a LIVE
    keras EfficientNetV2B0 (random weights + randomized BN stats)
    converts into the Flax model, whose forward must match Keras
    numerically. Covers fused-vs-MBConv block order, the expand_ratio=1
    fused degenerate (activation after project_bn), dwconv2 transpose,
    SE biases, SAME-pad stride-2 geometry, and the BN epsilon."""
    keras = pytest.importorskip("keras")
    import h5py

    from skin_image_analysis_tpu.models.efficientnet_v2 import (
        EfficientNetV2,
        load_keras_efficientnet_v2_weights,
    )
    from tests.test_vgg_mobilenet import _legacy_h5, _randomize_bn

    rng = np.random.default_rng(3)
    kmodel = keras.applications.EfficientNetV2B0(
        weights=None, include_top=False, input_shape=(96, 96, 3)
    )
    _randomize_bn(keras, kmodel, rng)
    path = str(tmp_path / "efficientnetv2-b0_legacy.h5")
    _legacy_h5(keras, kmodel, path, h5py)

    x_raw = rng.uniform(0, 255, (2, 96, 96, 3)).astype(np.float32)
    # reproduce the in-model preprocessing (Rescaling 1/255 +
    # ImageNet Normalization) so our model sees what stem_conv sees
    x_pre = x_raw
    for layer in kmodel.layers:
        if isinstance(layer, keras.layers.Rescaling):
            x_pre = x_pre * np.float32(layer.scale) + np.float32(
                layer.offset)
        elif isinstance(layer, keras.layers.Normalization):
            mean = np.asarray(layer.mean, np.float32).ravel()
            var = np.asarray(layer.variance, np.float32).ravel()
            x_pre = (x_pre - mean) / np.sqrt(var)

    model = EfficientNetV2(num_classes=2, table="b",
                           compute_dtype="float32")
    variables = model.init(jax.random.key(0), jnp.asarray(x_pre),
                           train=False)
    variables = {k: dict(v) for k, v in variables.items()}
    converted = load_keras_efficientnet_v2_weights(path, variables)

    w_head = rng.normal(0, 0.05, (1280, 2)).astype(np.float32)
    b_head = rng.normal(0, 0.05, 2).astype(np.float32)
    converted["params"]["Dense_0"] = {
        "kernel": jnp.asarray(w_head), "bias": jnp.asarray(b_head),
    }
    ours = np.asarray(
        model.apply(converted, jnp.asarray(x_pre), train=False)
    )
    feats = np.asarray(kmodel(x_raw, training=False))
    logits = feats.mean(axis=(1, 2)) @ w_head + b_head
    theirs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)


def test_efficientnet_v2_b0_keras_artifact_parity(tmp_path):
    """The .keras importer end to end: a cell-70-style EfficientNetV2B0
    transfer artifact (which EMBEDS Rescaling+ImageNet-Normalization)
    imports with normalize_imagenet=True in the emitted config, and our
    pipeline-normalized forward equals the Keras raw-0-255 forward."""
    keras = pytest.importorskip("keras")

    from skin_image_analysis_tpu.migrate import import_keras_experiment
    from skin_image_analysis_tpu.models import build_model
    from skin_image_analysis_tpu.ops.preprocess import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib
    from tests.test_vgg_mobilenet import _randomize_bn, _transfer_model

    rng = np.random.default_rng(4)
    base = keras.applications.EfficientNetV2B0(
        weights=None, include_top=False, input_shape=(96, 96, 3)
    )
    kmodel = _transfer_model(keras, base, num_classes=3)
    _randomize_bn(keras, kmodel, rng)
    path = str(tmp_path / "env2b0.keras")
    kmodel.save(path)

    out = str(tmp_path / "imported")
    summary = import_keras_experiment(path, out)
    assert summary["backbone"] == "efficientnet_v2_b0"
    assert summary["normalize_imagenet"] is True
    assert summary["input_scale_folded"] == 1.0
    import json

    with open(str(tmp_path / "imported" / "train_config.json")) as f:
        tc = json.load(f)
    assert tc["data"]["normalize_imagenet"] is True

    cfg, variables = ckpt_lib.load_model(
        str(tmp_path / "imported" / ckpt_lib.MODEL_FILENAME)
    )
    x_255 = rng.uniform(0, 255, (2, 96, 96, 3)).astype(np.float32)
    theirs = np.asarray(kmodel(x_255, training=False))
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    x_pipeline = (x_255 / 255.0 - mean) / std  # what our loader feeds
    ours_log = np.asarray(
        build_model(cfg).apply(variables, jnp.asarray(x_pipeline),
                               train=False)
    )
    np.testing.assert_allclose(np.exp(ours_log), theirs,
                               rtol=1e-3, atol=1e-5)
