"""Checkpointing: model artifact roundtrip, full-state resume fidelity
(reference gap closed: optimizer state survives resume,
tone_bias_train.py:438-441)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.train import checkpoint as ckpt_lib
from skin_image_analysis_tpu.train import create_train_state, make_train_step

SMALL = ModelConfig(
    conv_features=(4,), linear_features=(8,), dropout=(0.1,),
    image_size=16, compute_dtype="float32",
)


def _batch(rng, n=4):
    return {
        "pixels": jnp.asarray(rng.random((n, 16, 16, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, n), jnp.int32),
        "row_id": jnp.arange(n, dtype=jnp.int32),
        "valid": jnp.ones(n, bool),
    }


def test_model_artifact_roundtrip(tmp_path):
    state, model = create_train_state(
        SMALL, OptimConfig(), jax.random.key(0), batch_size=2
    )
    path = str(tmp_path / "session_model.msgpack")
    ckpt_lib.save_model(path, SMALL, state.params)
    cfg2, params2 = ckpt_lib.load_model(path)
    assert cfg2 == SMALL
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # architecture travels with weights: rebuild and run
    from skin_image_analysis_tpu.models import build_model

    model2 = build_model(cfg2)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    out = model2.apply({"params": params2}, x, train=False)
    assert out.shape == (1, 2)


def test_model_artifact_bad_magic(tmp_path):
    path = str(tmp_path / "junk.msgpack")
    with open(path, "wb") as f:
        f.write(b"NOPE1234")
    with pytest.raises(ValueError, match="not a session_model"):
        ckpt_lib.load_model(path)


def test_train_state_resume_exact(tmp_path):
    """Save mid-training, restore, continue: must produce bit-identical
    trajectories to an uninterrupted run (params AND optimizer moments
    AND RNG)."""
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    step = make_train_step()

    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=1e-3), jax.random.key(1), batch_size=2
    )
    for _ in range(3):
        state, _ = step(state, batch)
    ckpt_dir = str(tmp_path / "ckpt")
    ckpt_lib.save_train_state(ckpt_dir, state)
    # continue original
    state_cont = state
    for _ in range(2):
        state_cont, m_cont = step(state_cont, batch)

    # restore into a fresh template and continue
    template, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=1e-3), jax.random.key(99), batch_size=2
    )
    restored = ckpt_lib.restore_train_state(ckpt_dir, template)
    assert int(restored.step) == 3
    for _ in range(2):
        restored, m_res = step(restored, batch)

    np.testing.assert_allclose(
        float(m_cont["loss"]), float(m_res["loss"]), rtol=0, atol=0
    )
    for a, b in zip(
        jax.tree.leaves(state_cont.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batchnorm_model_artifact_roundtrip(tmp_path):
    """ResNet artifacts must carry batch_stats (format 2) and the full
    train→save→test-CLI cycle must work for BN models."""
    cfg = ModelConfig(name="resnet18", image_size=16, compute_dtype="float32")
    state, model = create_train_state(
        cfg, OptimConfig(optimizer="adamw", learning_rate=1e-3),
        jax.random.key(0), batch_size=2,
    )
    assert state.batch_stats is not None
    path = str(tmp_path / "session_model.msgpack")
    ckpt_lib.save_model(path, cfg, state.params, state.batch_stats)
    cfg2, loaded = ckpt_lib.load_model(path)
    params2, stats2 = ckpt_lib.split_variables(loaded)
    assert stats2 is not None
    for a, b in zip(jax.tree.leaves(state.batch_stats), jax.tree.leaves(stats2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # forward with restored stats
    out = model.apply(
        {"params": params2, "batch_stats": stats2},
        jnp.zeros((1, 16, 16, 3)), train=False,
    )
    assert out.shape == (1, 2)


def test_batchnorm_orbax_resume(tmp_path):
    cfg = ModelConfig(name="resnet18", image_size=16, compute_dtype="float32")
    state, _ = create_train_state(
        cfg, OptimConfig(optimizer="adamw", learning_rate=1e-3),
        jax.random.key(0), batch_size=2,
    )
    rng = np.random.default_rng(0)
    batch = {
        "pixels": jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, 2), jnp.int32),
        "row_id": jnp.arange(2, dtype=jnp.int32),
        "valid": jnp.ones(2, bool),
    }
    step = make_train_step()
    state, _ = step(state, batch)
    ckpt_dir = str(tmp_path / "ckpt")
    ckpt_lib.save_train_state(ckpt_dir, state)
    template, _ = create_train_state(
        cfg, OptimConfig(optimizer="adamw", learning_rate=1e-3),
        jax.random.key(5), batch_size=2,
    )
    restored = ckpt_lib.restore_train_state(ckpt_dir, template)
    for a, b in zip(
        jax.tree.leaves(state.batch_stats), jax.tree.leaves(restored.batch_stats)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_opt_state_migrates_across_adam_moment_formats(tmp_path):
    """A snapshot written under one adam moment-storage mode must restore
    into a template built under the other (OptimConfig.nu_dtype toggles
    between optax.adam's chain tuple and the bare lowp ScaleByAdamState)
    — exactly the cross-round resume path the elastic supervisor drives."""
    rng = np.random.default_rng(0)

    def trained_state(optim_cfg, steps=3):
        state, _ = create_train_state(
            SMALL, optim_cfg, jax.random.key(0), batch_size=4
        )
        step = make_train_step()
        for i in range(steps):
            state, _ = step(state, _batch(np.random.default_rng(i)))
        return state

    lowp = OptimConfig(moment_dtype="bfloat16", nu_dtype="bfloat16")
    plain = OptimConfig()

    for src_cfg, dst_cfg in ((lowp, plain), (plain, lowp)):
        src = trained_state(src_cfg)
        ckpt = str(tmp_path / f"ck_{src_cfg.nu_dtype or 'f32'}")
        ckpt_lib.save_train_state(ckpt, src)
        template, _ = create_train_state(
            SMALL, dst_cfg, jax.random.key(1), batch_size=4
        )
        restored = ckpt_lib.restore_train_state(ckpt, template)
        # params + step carried over exactly
        assert int(restored.step) == int(src.step)
        for a, b in zip(
            jax.tree.leaves(src.params), jax.tree.leaves(restored.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # moments carried over (up to the storage-dtype cast), into the
        # TEMPLATE's structure: the restored state must keep training
        src_m = ckpt_lib._find_adam_moments(jax.device_get(src.opt_state))
        dst_m = ckpt_lib._find_adam_moments(
            jax.device_get(restored.opt_state)
        )
        assert src_m is not None and dst_m is not None
        assert int(np.asarray(dst_m[0])) == int(np.asarray(src_m[0]))
        for a, b in zip(jax.tree.leaves(src_m[1]), jax.tree.leaves(dst_m[1])):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-2, atol=1e-8,
            )
        restored, _ = make_train_step()(restored, _batch(rng))
        assert np.isfinite(jax.device_get(restored.step))


def test_rmsprop_matches_torch_semantics():
    """OptimConfig(optimizer='rmsprop') must reproduce torch.optim.RMSprop
    defaults (alpha=0.99, eps OUTSIDE the sqrt) — HPO trial rankings
    depend on the optimizer semantics (tone_bias_optuna.py:239-241)."""
    import optax

    from skin_image_analysis_tpu.train.state import make_optimizer

    g = np.asarray([0.5, -0.25, 1.0, 1e-3], np.float32)
    p = np.zeros(4, np.float32)
    tx = make_optimizer(OptimConfig(optimizer="rmsprop", learning_rate=0.01))
    opt_state = tx.init(jnp.asarray(p))

    # hand-rolled torch RMSprop: v = a*v + (1-a)*g^2; p -= lr*g/(sqrt(v)+eps)
    v = np.zeros_like(p)
    p_torch = p.copy()
    p_ours = jnp.asarray(p)
    for _ in range(5):
        v = 0.99 * v + 0.01 * g * g
        p_torch = p_torch - 0.01 * g / (np.sqrt(v) + 1e-8)
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, p_ours)
        p_ours = optax.apply_updates(p_ours, updates)
    np.testing.assert_allclose(np.asarray(p_ours), p_torch, rtol=1e-6)
