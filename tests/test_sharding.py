"""Mesh + sharding rules on the 8-virtual-device CPU platform: DP-sharded
batches, TP-sharded MLP kernels, numerical equivalence of sharded vs
single-device training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from skin_image_analysis_tpu.config import MeshConfig, ModelConfig, OptimConfig
from skin_image_analysis_tpu.parallel import (
    batch_sharding,
    create_mesh,
    infer_param_shardings,
)
from skin_image_analysis_tpu.train import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

MODEL = ModelConfig(
    conv_features=(4,), linear_features=(256,), dropout=(0.0,),
    image_size=64, compute_dtype="float32",
)


def _batch(rng, n):
    labels = rng.integers(0, 2, n).astype(np.int32)
    pixels = rng.normal(0, 0.1, (n, 64, 64, 3)).astype(np.float32)
    pixels += labels[:, None, None, None] * 0.5
    return {
        "pixels": jnp.asarray(pixels),
        "label": jnp.asarray(labels),
        "row_id": jnp.arange(n, dtype=jnp.int32),
        "valid": jnp.ones(n, bool),
    }


def test_create_mesh_shapes():
    mesh = create_mesh(MeshConfig(data_parallel=-1, model_parallel=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = create_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(data_parallel=3, model_parallel=2))


def test_infer_param_shardings_tp():
    mesh = create_mesh(MeshConfig(data_parallel=-1, model_parallel=2))
    state, _ = create_train_state(
        MODEL, OptimConfig(), jax.random.key(0), batch_size=2
    )
    shardings = infer_param_shardings(state.params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    # the big flatten Dense (4*32*32 x 256 = 1M+ elems) gets column-parallel
    specs = {
        "/".join(str(p) for p in path): s.spec for path, s in flat
    }
    big_kernel_specs = [
        s for name, s in specs.items() if "MlpBlock_0" in name and "kernel" in name
    ]
    assert big_kernel_specs[0] == P(None, "model")
    # small params replicated
    conv_specs = [
        s for name, s in specs.items() if "ConvBlock_0" in name and "kernel" in name
    ]
    assert conv_specs[0] == P()


def test_dp_matches_single_device():
    """8-way DP training must match single-device training numerically
    (the grad all-reduce is a mean either way)."""
    rng = np.random.default_rng(0)
    batch = _batch(rng, 16)

    def train(mesh):
        state, _ = create_train_state(
            MODEL, OptimConfig(learning_rate=1e-2), jax.random.key(0),
            batch_size=2,
        )
        if mesh is not None:
            state = state.replace(
                params=jax.device_put(
                    state.params, infer_param_shardings(state.params, mesh)
                )
            )
            b = jax.device_put(batch, batch_sharding(mesh))
        else:
            b = batch
        step = make_train_step(mesh=mesh)
        losses = []
        for _ in range(3):
            state, m = step(state, b)
            losses.append(float(m["loss"]))
        return losses, state

    mesh = create_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    losses_dp, state_dp = train(mesh)
    losses_1, state_1 = train(None)
    np.testing.assert_allclose(losses_dp, losses_1, rtol=1e-4)
    for a, b in zip(
        jax.tree.leaves(state_dp.params), jax.tree.leaves(state_1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_tp_matches_single_device():
    """2-way TP over the MLP must match single-device numerics."""
    rng = np.random.default_rng(1)
    batch = _batch(rng, 8)
    mesh = create_mesh(MeshConfig(data_parallel=-1, model_parallel=2))
    state, _ = create_train_state(
        MODEL, OptimConfig(learning_rate=1e-2), jax.random.key(0), batch_size=2
    )
    ref_state, _ = create_train_state(
        MODEL, OptimConfig(learning_rate=1e-2), jax.random.key(0), batch_size=2
    )
    state = state.replace(
        params=jax.device_put(
            state.params, infer_param_shardings(state.params, mesh)
        )
    )
    step_tp = make_train_step(mesh=mesh)
    step_1 = make_train_step()
    b_tp = jax.device_put(batch, batch_sharding(mesh))
    for _ in range(2):
        state, m_tp = step_tp(state, b_tp)
        ref_state, m_1 = step_1(ref_state, batch)
    np.testing.assert_allclose(
        float(m_tp["loss"]), float(m_1["loss"]), rtol=1e-4
    )


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
