"""Int8 post-training quantization of the inference path
(serve/quantize.py) — new serving capability beyond the reference's
unpickle-the-module deployment (tone_bias_model.py:305-338)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.serve.quantize import (
    build_infer_fn_quantized,
    quantization_report,
    quantize_model,
    quantized_forward,
)
from skin_image_analysis_tpu.train.state import create_train_state

SIZE = 16


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(
        conv_features=(4, 8), linear_features=(8,), dropout=(0.0,),
        image_size=SIZE, compute_dtype="float32",
    )
    state, _ = create_train_state(
        cfg, OptimConfig(learning_rate=1e-3), jax.random.key(0),
        batch_size=2,
    )
    return cfg, state.params


def test_quantize_roundtrip_fidelity(small_model):
    cfg, params = small_model
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 255, (16, SIZE, SIZE, 3), np.uint8)
    qtree = quantize_model(cfg, params, calib)

    # int8 weights, f32 dequant/bias, one layer per conv/dense/head
    assert len(qtree["layers"]) == 2 + 1 + 1
    for layer in qtree["layers"]:
        assert layer["kernel_q"].dtype == np.int8
        assert layer["dequant"].dtype == np.float32
        assert np.abs(layer["kernel_q"]).max() <= 127

    held_out = rng.integers(0, 255, (32, SIZE, SIZE, 3), np.uint8)
    report = quantization_report(cfg, params, qtree, held_out)
    assert report["n"] == 32
    # 8-bit weights+activations keep the decision function: every
    # confidently-classified row must agree, and log-probs stay close
    assert report["agreement_confident"] == 1.0
    assert report["mean_abs_dlogp"] < 0.1


def test_quantized_infer_fn_contract(small_model):
    cfg, params = small_model
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 255, (8, SIZE, SIZE, 3), np.uint8)
    qtree = quantize_model(cfg, params, calib)
    infer = jax.jit(build_infer_fn_quantized(qtree))
    out = infer(jnp.asarray(rng.integers(0, 255, (4, SIZE, SIZE, 3),
                                         np.uint8)))
    assert out["log_probs"].shape == (4, 2)
    assert out["pred"].shape == (4,)
    assert np.all((np.asarray(out["p_malignant"]) >= 0)
                  & (np.asarray(out["p_malignant"]) <= 1))
    # pred is consistent with the log-probs it rides with
    np.testing.assert_array_equal(
        np.asarray(out["pred"]), np.asarray(out["log_probs"]).argmax(-1)
    )


def test_quantize_rejects_unsupported(small_model):
    cfg, params = small_model
    rng = np.random.default_rng(2)
    calib = rng.integers(0, 255, (4, SIZE, SIZE, 3), np.uint8)
    with pytest.raises(ValueError, match="skin_cancer"):
        quantize_model(
            ModelConfig(name="resnet50", image_size=SIZE), params, calib
        )
    # over-sized calibration pixels resize through the eval preprocess
    # (the serving program's own geometry), not an error
    qtree = quantize_model(
        cfg, params,
        rng.integers(0, 255, (4, SIZE * 2, SIZE * 2, 3), np.uint8),
    )
    assert qtree["image_size"] == SIZE


def test_float_oracle_matches_model(small_model):
    """The calibration/fidelity oracle (_float_forward) must equal the
    REAL model's eval forward — if it drifts from models/cnn.py (pool
    semantics, activation order, head dtype), the manifest's fidelity
    report would describe a program nobody serves."""
    from skin_image_analysis_tpu.models.cnn import build_model
    from skin_image_analysis_tpu.serve.quantize import (
        _float_forward,
        _layers,
    )

    cfg, params = small_model
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (3, SIZE, SIZE, 3)).astype(np.float32))
    want = build_model(cfg).apply({"params": params}, x, train=False)
    got = _float_forward(_layers(cfg, params), x, taps=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


def test_quantized_artifact_serves(small_model, tmp_path):
    """A --quantize int8 export serves through the SAME daemon session
    machinery as a float artifact (InferenceSession.from_artifact reads
    the manifest; the program's input contract is unchanged)."""
    import os

    from skin_image_analysis_tpu.serve import InferenceSession, export_model
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    cfg, params = small_model
    folder = str(tmp_path / "exp")
    os.makedirs(folder)
    ckpt_lib.save_model(
        os.path.join(folder, ckpt_lib.MODEL_FILENAME), cfg, params, None
    )
    rng = np.random.default_rng(5)
    calib = rng.integers(0, 255, (8, SIZE, SIZE, 3), np.uint8)
    out = str(tmp_path / "m_int8.stablehlo")
    export_model(folder, out, quantize="int8", calib_pixels=calib)

    sess = InferenceSession.from_artifact(out, max_batch=4)
    pixels = rng.integers(0, 255, (3, SIZE, SIZE, 3), np.uint8)
    got = sess.predict(pixels)
    qtree = quantize_model(cfg, params, calib)
    want = build_infer_fn_quantized(qtree)(jnp.asarray(pixels))
    np.testing.assert_allclose(
        got["log_probs"], np.asarray(want["log_probs"]), atol=1e-5
    )


def test_quantized_session_from_experiment(small_model, tmp_path):
    """The serving daemon's --quantize path: a quantized session built
    straight from the folder matches the quantized forward, honors the
    bucket padding contract, and refuses hot reload (constant
    weights)."""
    import os

    from skin_image_analysis_tpu.serve import InferenceSession
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    cfg, params = small_model
    folder = str(tmp_path / "exp")
    os.makedirs(folder)
    ckpt_lib.save_model(
        os.path.join(folder, ckpt_lib.MODEL_FILENAME), cfg, params, None
    )
    rng = np.random.default_rng(6)
    calib = rng.integers(0, 255, (8, SIZE, SIZE, 3), np.uint8)
    sess = InferenceSession.from_experiment_quantized(
        folder, calib, max_batch=4)
    pixels = rng.integers(0, 255, (3, SIZE, SIZE, 3), np.uint8)
    got = sess.predict(pixels)
    qtree = quantize_model(cfg, params, calib)
    want = build_infer_fn_quantized(qtree)(jnp.asarray(pixels))
    np.testing.assert_allclose(
        got["log_probs"], np.asarray(want["log_probs"]), atol=1e-5
    )
    with pytest.raises(RuntimeError, match="constants"):
        sess.reload_weights()


def test_serve_cli_quantize_validation(tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from cli import tone_bias_serve

    # --quantize without --calib-root / unknown scheme / artifact source
    with pytest.raises(SystemExit, match="calib-root"):
        tone_bias_serve.main([str(tmp_path), "--quantize", "int8"])
    with pytest.raises(SystemExit, match="unknown"):
        tone_bias_serve.main([str(tmp_path), "--quantize", "int4"])
    art = tmp_path / "m.stablehlo"
    art.write_bytes(b"x")
    with pytest.raises(SystemExit, match="experiment folders"):
        tone_bias_serve.main(
            [str(art), "--quantize", "int8", "--calib-root", "/tmp"])
    with pytest.raises(SystemExit, match="exclusive"):
        tone_bias_serve.main(
            [str(tmp_path), "--quantize", "int8", "--calib-root", "/tmp",
             "--watch", "1"])


def test_quantized_pool_commutes(small_model):
    """Pooling int8 after requantization equals requantizing the pooled
    float activation (max commutes with the monotone quantizer) — the
    scheme's bytes-saving trick, pinned."""
    cfg, params = small_model
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.uniform(0, 3.0, (2, 8, 8, 4)).astype(np.float32))
    s = float(jnp.max(y)) / 127.0

    def quant(v):
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)

    pool_f = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    pool_q = jax.lax.reduce_window(
        quant(y), jnp.int8(-128), jax.lax.max, (1, 2, 2, 1),
        (1, 2, 2, 1), "VALID")
    np.testing.assert_array_equal(np.asarray(quant(pool_f)),
                                  np.asarray(pool_q))
