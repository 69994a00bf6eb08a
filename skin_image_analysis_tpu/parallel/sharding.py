"""Sharding rules: batch over the data axis, big Dense kernels over model.

Rules, not hand-scheduling: we annotate leaf shardings and let GSPMD insert
the collectives (grad all-reduce for DP; all-gather/psum around the
column/row-parallel MLP for TP).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense kernels smaller than this stay replicated even when TP is on.
_TP_MIN_KERNEL_ELEMS = 1 << 20


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(data_axis))


def infer_param_shardings(
    params: Any, mesh: Mesh, model_axis: str = "model"
) -> Any:
    """Parameter sharding tree.

    Default: fully replicated (pure DP). When the mesh has a model axis of
    size > 1, large Dense kernels are alternately column-/row-parallel —
    the classic Megatron MLP split, here expressed purely as PartitionSpecs:
    kernel i gets ``P(None, model)`` (output features sharded), kernel i+1
    gets ``P(model, None)`` (input features sharded, psum on output). The
    ~100352x512 flatten matmul is the one that matters
    (reference: tone_bias_model.py:106).
    """
    tp = mesh.shape.get(model_axis, 1) > 1
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    col_next = True
    for path, leaf in flat:
        spec = P()
        if tp and leaf.ndim == 2 and leaf.size >= _TP_MIN_KERNEL_ELEMS:
            if col_next and leaf.shape[1] % mesh.shape[model_axis] == 0:
                spec = P(None, model_axis)
                col_next = False
            elif (not col_next) and leaf.shape[0] % mesh.shape[model_axis] == 0:
                spec = P(model_axis, None)
                col_next = True
        specs.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, specs)
