"""Checkpointing: self-describing model files + full train-state resume.

Two formats, mirroring and extending the reference's persistence
(tone_bias_model.py:305-338, tone_bias_train.py:240-249,:443):

1. ``save_model`` / ``load_model`` — the ``session_model`` artifact. The
   reference pickles the whole torch module so architecture travels with
   weights; the equivalent here is a msgpack params blob with an embedded
   JSON ModelConfig header, written atomically. Loading rebuilds the Flax
   model from the header — no pickle, no arbitrary code execution.
2. ``save_train_state`` / ``restore_train_state`` — full-fidelity resume
   (params + optimizer state + step + RNG key) via orbax. This closes the
   reference's documented gap of losing optimizer/scheduler state across
   resumes (tone_bias_train.py:438-441).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any

import jax
import numpy as np
from flax import serialization

from skin_image_analysis_tpu import config as config_lib
from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.train.state import TrainState

MODEL_FILENAME = "session_model.msgpack"
#: the --keep-best checkpoint (best best_metric epoch; train.loop /
#: train.classify write it, --best surfaces read it)
BEST_MODEL_FILENAME = "session_model_best.msgpack"
_MAGIC = b"SIAT"


def save_model(
    path: str, model_cfg: ModelConfig, params: Any, batch_stats: Any = None
) -> None:
    """Atomic write of [magic | header_len | json header | msgpack
    collections]. Format 2 carries {"params", "batch_stats"} so BatchNorm
    models (ResNet/Xception) round-trip their running statistics."""
    header = json.dumps(
        {
            "format": 2,
            "model": config_lib.to_dict(model_cfg),
            "has_batch_stats": batch_stats is not None,
        }
    ).encode()
    payload: Any = {"params": jax.device_get(params)}
    if batch_stats is not None:
        payload["batch_stats"] = jax.device_get(batch_stats)
    blob = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)
    os.replace(tmp, path)


def load_model(path: str) -> tuple[ModelConfig, Any]:
    """Returns (model_cfg, params) for stateless models, or
    (model_cfg, {"params": ..., "batch_stats": ...}) when the artifact
    carries BatchNorm statistics. Architecture travels with the weights
    like the reference's whole-model pickle, minus the pickle."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a session_model file")
        # Everything past the magic parses UNTRUSTED bytes (this is the
        # serving loader) — normalize truncation/corruption to
        # ValueError instead of leaking struct/json/msgpack internals
        # (fuzz-derived: raw TypeError/KeyError/msgpack.ExtraData
        # escaped before; tests/test_checkpoint_fuzz.py).
        try:
            (hlen,) = struct.unpack("<I", f.read(4))
            header = json.loads(f.read(hlen))
            blob = f.read()
        except (struct.error, UnicodeDecodeError, ValueError) as e:
            raise ValueError(f"{path}: corrupt session_model header: {e}") from e
    try:
        model_cfg = config_lib._build(ModelConfig, header["model"])
        # Template-free restore: msgpack carries the tree structure, so
        # no model init (and no compile) is needed just to load weights.
        # Commit the tree to device memory once here — otherwise every
        # jitted call re-uploads the full parameter set from host numpy
        # arrays.
        restored = jax.device_put(serialization.msgpack_restore(blob))
        if header.get("format", 1) == 1:
            return model_cfg, restored
        if header.get("has_batch_stats"):
            return model_cfg, restored
        return model_cfg, restored["params"]
    except Exception as e:
        if isinstance(e, ValueError):
            raise
        raise ValueError(f"{path}: corrupt session_model body: {e}") from e


def split_variables(loaded: Any) -> tuple[Any, Any]:
    """(params, batch_stats_or_None) from a load_model result."""
    if isinstance(loaded, dict) and set(loaded) <= {"params", "batch_stats"} \
            and "params" in loaded and (
                "batch_stats" in loaded or len(loaded) == 1):
        return loaded["params"], loaded.get("batch_stats")
    return loaded, None


def save_train_state(ckpt_dir: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    payload = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "rng": jax.device_get(jax.random.key_data(state.rng)),
    }
    if state.batch_stats is not None:
        payload["batch_stats"] = jax.device_get(state.batch_stats)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def _find_adam_moments(tree: Any):
    """Depth-first search a restored (template-free) pytree for a node
    shaped like optax's adam state: {count, mu, nu}. Orbax restores
    NamedTuples/tuples as dicts, so match by field names."""
    import optax

    if isinstance(tree, optax.ScaleByAdamState):
        return tree.count, tree.mu, tree.nu
    if isinstance(tree, dict):
        if {"count", "mu", "nu"} <= set(tree):
            return tree["count"], tree["mu"], tree["nu"]
        for v in tree.values():
            found = _find_adam_moments(v)
            if found is not None:
                return found
    if isinstance(tree, (list, tuple)):
        for v in tree:
            found = _find_adam_moments(v)
            if found is not None:
                return found
    return None


def _adapt_adam_opt_state(template_opt: Any, count, mu, nu):
    """Rebuild the template's opt_state structure carrying restored adam
    moments — the migration between the two in-tree adam formats (plain
    ``optax.adam`` chain vs the bare lowp ``ScaleByAdamState``, which
    differ per OptimConfig.nu_dtype / code revision). Moment leaves cast
    to the template's storage dtypes; any schedule counters take the
    restored step count so LR-schedule position survives the migration."""
    import optax

    jnp = jax.numpy

    def cast_like(new, tmpl):
        return jax.tree.map(
            lambda n, t: jnp.asarray(n, t.dtype), new, tmpl
        )

    def rebuild(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=jnp.asarray(count, node.count.dtype),
                mu=cast_like(mu, node.mu),
                nu=cast_like(nu, node.nu),
            )
        if isinstance(node, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.asarray(count, node.count.dtype)
            )
        if isinstance(node, tuple) and type(node) is tuple:
            return tuple(rebuild(v) for v in node)
        return node

    return rebuild(template_opt)


def restore_train_state(ckpt_dir: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    target = {
        "step": jax.device_get(template.step),
        "params": jax.device_get(template.params),
        "opt_state": jax.device_get(template.opt_state),
        "rng": jax.device_get(jax.random.key_data(template.rng)),
    }
    if template.batch_stats is not None:
        target["batch_stats"] = jax.device_get(template.batch_stats)
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(path, item=target)
            opt_state = restored["opt_state"]
        except Exception:
            # opt_state structure mismatch — e.g. a snapshot written
            # under a different adam moment-storage mode (OptimConfig.
            # nu_dtype toggles between optax.adam's chain tuple and the
            # bare lowp ScaleByAdamState). Restore template-free and
            # migrate the moments into the template's structure.
            restored = ckptr.restore(path)
            found = _find_adam_moments(restored.get("opt_state"))
            if found is None:
                raise
            opt_state = _adapt_adam_opt_state(template.opt_state, *found)
    state = template.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        opt_state=opt_state,
        rng=jax.random.wrap_key_data(jax.numpy.asarray(restored["rng"])),
    )
    if "batch_stats" in restored:
        state = state.replace(batch_stats=restored["batch_stats"])
    return state
