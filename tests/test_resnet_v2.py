"""ResNet50V2 transfer family (jgi_ham_2018_tf.ipynb cell 70's first
commented backbone alternative), pinned against a LIVE Keras oracle
through both weight paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_resnet_v2_registry_and_forward():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model

    cfg = ModelConfig(name="resnet50_v2", image_size=64, num_classes=3,
                      compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 3)
    p = variables["params"]
    assert "conv1_conv" in p and "bias" in p["conv1_conv"]  # biased stem
    assert "post_bn" in p
    # R50V2 stack depths: conv4 has 6 blocks, downsample in the last
    assert "conv4_block6_preact_bn" in p
    assert "conv5_block3_3_conv" in p
    # registered large variants build too
    from skin_image_analysis_tpu.models import get_model

    for name in ("resnet101_v2", "resnet152_v2"):
        get_model(name)


def test_resnet50_v2_keras_artifact_parity(tmp_path):
    keras = pytest.importorskip("keras")

    from skin_image_analysis_tpu.migrate import import_keras_experiment
    from skin_image_analysis_tpu.models import build_model
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib
    from tests.test_vgg_mobilenet import _randomize_bn, _transfer_model

    rng = np.random.default_rng(6)
    base = keras.applications.ResNet50V2(
        weights=None, include_top=False, input_shape=(96, 96, 3)
    )
    kmodel = _transfer_model(keras, base, num_classes=2)
    _randomize_bn(keras, kmodel, rng)
    path = str(tmp_path / "r50v2.keras")
    kmodel.save(path)

    out = str(tmp_path / "imported")
    summary = import_keras_experiment(path, out)
    assert summary["backbone"] == "resnet50_v2"
    assert summary["input_scale_folded"] == 255.0

    cfg, variables = ckpt_lib.load_model(
        str(tmp_path / "imported" / ckpt_lib.MODEL_FILENAME)
    )
    assert "batch_stats" in variables
    x_255 = rng.uniform(0, 255, (2, 96, 96, 3)).astype(np.float32)
    theirs = np.asarray(kmodel(x_255, training=False))
    ours_log = np.asarray(
        build_model(cfg).apply(variables, jnp.asarray(x_255 / 255.0),
                               train=False)
    )
    np.testing.assert_allclose(np.exp(ours_log), theirs,
                               rtol=1e-3, atol=1e-5)


def test_resnet50_v2_legacy_h5_converter(tmp_path):
    keras = pytest.importorskip("keras")
    import h5py

    from skin_image_analysis_tpu.models.resnet_v2 import (
        ResNetV2,
        load_keras_resnet_v2_weights,
    )
    from tests.test_vgg_mobilenet import _legacy_h5, _randomize_bn

    rng = np.random.default_rng(7)
    kmodel = keras.applications.ResNet50V2(
        weights=None, include_top=False, input_shape=(96, 96, 3)
    )
    _randomize_bn(keras, kmodel, rng)
    path = str(tmp_path / "r50v2_notop.h5")
    _legacy_h5(keras, kmodel, path, h5py)

    model = ResNetV2(num_classes=2, compute_dtype="float32")
    x_np = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np),
                           train=False)
    variables = {k: dict(v) for k, v in variables.items()}
    converted = load_keras_resnet_v2_weights(path, variables)

    w_head = rng.normal(0, 0.05, (2048, 2)).astype(np.float32)
    b_head = rng.normal(0, 0.05, 2).astype(np.float32)
    converted["params"]["Dense_0"] = {
        "kernel": jnp.asarray(w_head), "bias": jnp.asarray(b_head),
    }
    ours = np.asarray(
        model.apply(converted, jnp.asarray(x_np), train=False)
    )
    feats = np.asarray(kmodel(x_np, training=False))
    logits = feats.mean(axis=(1, 2)) @ w_head + b_head
    theirs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)
