"""AUC: host vs device vs hand-computed (ties + padding)."""

import numpy as np
import pytest

import jax.numpy as jnp

from skin_image_analysis_tpu.metrics.auc import roc_auc, roc_auc_device


def test_perfect_and_random():
    labels = np.array([0, 0, 1, 1])
    assert roc_auc(labels, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert roc_auc(labels, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0


def test_ties_midrank():
    labels = np.array([0, 1, 0, 1])
    scores = np.array([0.5, 0.5, 0.2, 0.8])
    # pairs: (1@0.5 vs 0@0.5)=0.5, (1@0.5 vs 0@0.2)=1, (1@0.8 vs both)=2
    assert roc_auc(labels, scores) == pytest.approx(3.5 / 4)


def test_degenerate_nan():
    assert np.isnan(roc_auc(np.array([1, 1]), np.array([0.5, 0.2])))


def test_device_matches_host(rng):
    n = 333
    labels = (rng.random(n) < 0.4).astype(np.int32)
    scores = rng.random(n).astype(np.float32)
    scores[::7] = 0.5  # inject ties
    host = roc_auc(labels, scores)
    dev = float(roc_auc_device(jnp.asarray(labels), jnp.asarray(scores)))
    assert dev == pytest.approx(host, abs=1e-6)


def test_device_padding(rng):
    n, pad = 100, 28
    labels = (rng.random(n) < 0.4).astype(np.int32)
    scores = rng.random(n).astype(np.float32)
    host = roc_auc(labels, scores)
    labels_p = np.concatenate([labels, np.ones(pad, np.int32)])
    scores_p = np.concatenate([scores, np.full(pad, 0.99, np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    dev = float(
        roc_auc_device(jnp.asarray(labels_p), jnp.asarray(scores_p), jnp.asarray(valid))
    )
    assert dev == pytest.approx(host, abs=1e-5)
