"""Mesh-sharded HPO waves: the lane (trial) axis of the padded-supernet
wave programs shards over a device mesh — K/N trials per device, no
cross-lane collectives (the TPU-slice replacement for the reference's
MPI-rank parallelism, README.md:54 / tone_bias_optuna.py:291-343).

Runs on the conftest-pinned 8-virtual-device CPU platform."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skin_image_analysis_tpu.config import HpoConfig
from skin_image_analysis_tpu.hpo.population import (
    WaveSkeleton,
    _rolling_programs,
)
from skin_image_analysis_tpu.hpo.wave import run_wave_study
from skin_image_analysis_tpu.hpo.study import create_study


def _toy_data(n=96, size=16, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n).astype(np.int32)
    pixels = (
        rng.normal(0, 0.05, (n, size, size, 3))
        + labels[:, None, None, None] * 0.5 + 0.25
    )
    return (np.clip(pixels, 0, 1) * 255).astype(np.uint8), labels


def _trial_mesh():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-virtual-device CPU platform")
    return Mesh(np.asarray(devices[:8]), ("trial",))


def test_train_epoch_sharded_equals_unsharded():
    """One rolling-wave train epoch + valid accuracy must be numerically
    equivalent whether the lane axis is sharded over the mesh or lives
    on one device (same program, SPMD partitioning only)."""
    k, bsz, micro = 8, 8, 8
    skel = WaveSkeleton(n_conv=1, n_linear=2, optimizer="adam",
                        image_size=16, compute_dtype="float32")
    init_wave, train_epoch, valid_accuracy, _ = _rolling_programs(
        skel, k, micro, bsz // micro
    )

    pixels, labels = _toy_data()
    pool_px, pool_lb = jnp.asarray(pixels), jnp.asarray(labels)
    rng = np.random.default_rng(1)
    conv_w = rng.integers(16, 64, (k, 2)).astype(np.int32)
    lin_w = rng.integers(16, 64, (k, 2)).astype(np.int32)
    drops = rng.uniform(0.2, 0.5, (k, 2)).astype(np.float32)
    lrs = np.full((k,), 1e-3, np.float32)
    tb_idx = np.stack([
        rng.permutation(len(labels))[: 2 * bsz].reshape(2, bsz)
        for _ in range(k)
    ]).astype(np.int32)
    vb_idx = np.stack([
        rng.permutation(len(labels))[: 2 * micro].reshape(2, micro)
        for _ in range(k)
    ]).astype(np.int32)
    keys = jax.random.split(jax.random.key(3), k)
    ekey = jax.random.key(7)

    def run(shard):
        mesh = _trial_mesh() if shard else None
        lane = (
            (lambda x: jax.device_put(jnp.asarray(x),
                                      NamedSharding(mesh, P("trial"))))
            if shard else jnp.asarray
        )
        params, opt = init_wave(lane(keys), lane(conv_w), lane(lin_w))
        params, opt = train_epoch(
            params, opt, ekey, lane(tb_idx), pool_px, pool_lb,
            lane(conv_w), lane(lin_w), lane(drops), lane(lrs),
        )
        accs = np.asarray(valid_accuracy(params, lane(vb_idx),
                                         pool_px, pool_lb))
        flat = jax.tree.leaves(jax.device_get(params))
        return accs, flat

    accs_1, flat_1 = run(shard=False)
    accs_8, flat_8 = run(shard=True)
    np.testing.assert_allclose(accs_1, accs_8, atol=1e-6)
    for a, b in zip(flat_1, flat_8):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_run_wave_study_over_mesh():
    """The full rolling-wave study runs with the lane axis sharded over
    the 8-device mesh: K is rounded to a mesh multiple, trials finish,
    values are sane, refills work under sharding."""
    mesh = _trial_mesh()
    pixels, labels = _toy_data(n=120)
    cfg = HpoConfig(trials=9, sample_size=90, batch_size=8, epochs=2,
                    seed=0, n_train_examples=16, n_valid_examples=8)
    study, stats = run_wave_study(
        pixels, labels, cfg, image_size=16, compute_dtype="float32",
        study=create_study("maximize"), wave_size=8, mesh=mesh,
        verbose=False,
    )
    assert len(study.trials) >= cfg.trials
    # mesh K-rounding must not inflate the protocol: overflow lanes ride
    # as unregistered fillers, so the study holds at most one extra
    # trial (the remaining+1 ask cap), not a whole rounded wave
    assert len(study.trials) <= cfg.trials + 1
    for t in study.trials:
        assert t.state in ("COMPLETE", "PRUNED")
        if t.value is not None:
            assert 0.0 <= t.value <= 1.0
    assert stats["lane_epochs"] > 0


def test_mesh_rejects_too_small_population(monkeypatch):
    """A skeleton whose padded footprint fits fewer lanes than the mesh
    has devices must fail loudly, not silently under-shard."""
    mesh = _trial_mesh()
    pixels, labels = _toy_data(n=60)
    cfg = HpoConfig(trials=4, sample_size=48, batch_size=8, epochs=1,
                    seed=0, n_train_examples=8, n_valid_examples=8)

    import skin_image_analysis_tpu.hpo.wave as wave_mod

    monkeypatch.setattr(wave_mod, "max_population",
                        lambda *a, **kw: 4)
    with pytest.raises(ValueError, match="mesh has 8 devices"):
        run_wave_study(
            pixels, labels, cfg, image_size=16, compute_dtype="float32",
            study=create_study("maximize"), wave_size=8, mesh=mesh,
            verbose=False,
        )
