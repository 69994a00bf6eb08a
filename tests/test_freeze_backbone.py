"""Frozen-backbone transfer (reference jgi_ham_2018_torch.ipynb cells
30-32: requires_grad=False on the backbone, train the new head only).

TPU-first design under test: stop_gradient on the pooled features (XLA
prunes the entire backbone backward) + optax.multi_transform with
set_to_zero for frozen leaves (no updates, no weight-decay drift, no
backbone moment memory). BatchNorm running stats must still update in
train mode — torch's frozen-params semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.train import create_train_state, make_train_step


def _batch(rng, n=4, size=32):
    return {
        "pixels": jnp.asarray(rng.random((n, size, size, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, n), jnp.int32),
        "row_id": jnp.arange(n, dtype=jnp.int32),
        "valid": jnp.ones(n, bool),
    }


def _leaves_differ(a, b):
    return any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.parametrize("name", ["resnet18", "xception_small"])
def test_freeze_backbone_head_only_updates(name):
    cfg = ModelConfig(name=name, image_size=32, compute_dtype="float32",
                      freeze_backbone=True)
    state, _ = create_train_state(
        cfg, OptimConfig(optimizer="adamw", learning_rate=1e-2),
        jax.random.key(0), batch_size=4,
    )
    before_p = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    before_bn = jax.tree.map(lambda x: np.asarray(x).copy(), state.batch_stats)
    step = make_train_step()
    state, metrics = step(state, _batch(np.random.default_rng(0)))
    assert np.isfinite(float(metrics["loss"]))

    # the head trained
    assert _leaves_differ(before_p["Dense_0"], state.params["Dense_0"])
    # every backbone param is BIT-unchanged (set_to_zero: no update and
    # no adamw weight-decay drift on frozen leaves)
    for k in before_p:
        if k == "Dense_0":
            continue
        for a, b in zip(jax.tree.leaves(before_p[k]),
                        jax.tree.leaves(state.params[k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # BN running stats still update in train mode (torch freezes grads,
    # not BN statistics)
    assert _leaves_differ(before_bn, state.batch_stats)


def test_freeze_backbone_holds_no_backbone_moments():
    """Frozen leaves are MaskedNode in the optimizer state — the adam
    moments cover only the head (backbone-sized moment buffers would be
    ~11M wasted f32 pairs for resnet18)."""
    cfg = ModelConfig(name="resnet18", image_size=32,
                      compute_dtype="float32", freeze_backbone=True)
    state, _ = create_train_state(
        cfg, OptimConfig(optimizer="adamw", learning_rate=1e-2),
        jax.random.key(0), batch_size=4,
    )
    head_size = sum(np.asarray(x).size
                    for x in jax.tree.leaves(state.params["Dense_0"]))
    total_size = sum(np.asarray(x).size for x in jax.tree.leaves(state.params))
    opt_size = sum(np.asarray(x).size for x in jax.tree.leaves(state.opt_state))
    assert total_size > 100 * head_size  # backbone dominates the params…
    # …but the opt state is head-only: mu+nu (+ a few scalar counters)
    assert opt_size <= 2 * head_size + 64


def test_freeze_backbone_unsupported_model_raises():
    cfg = ModelConfig(name="skin_cancer_list", image_size=32,
                      compute_dtype="float32", freeze_backbone=True)
    with pytest.raises(ValueError, match="freeze_backbone"):
        create_train_state(
            cfg, OptimConfig(optimizer="adamw", learning_rate=1e-3),
            jax.random.key(0), batch_size=4,
        )


def test_freeze_backbone_checkpoint_header_roundtrip(tmp_path):
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    cfg = ModelConfig(name="resnet18", image_size=16,
                      compute_dtype="float32", freeze_backbone=True)
    state, _ = create_train_state(
        cfg, OptimConfig(optimizer="adamw", learning_rate=1e-3),
        jax.random.key(0), batch_size=2,
    )
    path = str(tmp_path / "frozen.msgpack")
    ckpt_lib.save_model(path, cfg, state.params, state.batch_stats)
    cfg2, _ = ckpt_lib.load_model(path)
    assert cfg2.freeze_backbone is True
