"""Shared readers for Keras weight sources.

Every keras-compatible backbone here (xception/efficientnet/vgg/
mobilenet) maps weights by LAYER NAME with the short per-variable names
Keras uses (``kernel``/``gamma``/``depthwise_kernel``/...). Two sources
produce that view:

- ``read_legacy_h5`` — the legacy ``layer_names``/``weight_names`` .h5
  layout every downloadable ``*_weights_tf_dim_ordering_tf_kernels*.h5``
  file uses (h5py only, no TF/Keras at load time);
- ``read_live_model`` — a loaded Keras model object (the only robust
  reader for Keras-3 ``.keras`` zips, whose ``model.weights.h5`` groups
  carry structural class-based names, not layer names — see
  migrate/keras_model.py).
"""

from __future__ import annotations

import numpy as np

#: short weight names per Keras layer class, in get_weights() order
WEIGHT_NAMES = {
    "Conv2D": ("kernel", "bias"),
    "SeparableConv2D": ("depthwise_kernel", "pointwise_kernel", "bias"),
    "DepthwiseConv2D": ("depthwise_kernel", "bias"),
    "BatchNormalization": ("gamma", "beta", "moving_mean",
                           "moving_variance"),
    "Dense": ("kernel", "bias"),
    # EfficientNet v1 builds Normalization(axis) WITHOUT constructor
    # stats, so keras stores them as layer variables; every apply_*
    # mapping skips the layer by name (the importer folds its effect
    # via compose_input_transform instead)
    "Normalization": ("mean", "variance", "count"),
}


def read_legacy_h5(path: str) -> tuple[list[str], dict[str, dict]]:
    """(ordered layer names, {layer: {short_name: ndarray}}) from a
    legacy-format weights ``.h5``; weights load eagerly (the biggest
    family file is ~250 MB)."""
    import h5py

    with h5py.File(path, "r") as f:
        grp = f["model_weights"] if "model_weights" in f else f
        layer_names = [
            n.decode() if isinstance(n, bytes) else str(n)
            for n in grp.attrs["layer_names"]
        ]
        table: dict[str, dict] = {}
        for layer in layer_names:
            g = grp[layer]
            names = [
                n.decode() if isinstance(n, bytes) else str(n)
                for n in g.attrs["weight_names"]
            ]
            table[layer] = {
                n.split("/")[-1].split(":")[0]: np.asarray(g[n])
                for n in names
            }
    return layer_names, table


def apply_name_identity_weights(layer_names, weights_of, variables,
                                skip=()):
    """Generic Keras→Flax mapping for families whose Flax submodule
    names equal the Keras layer names 1:1 (mobilenet_v2, resnet_v2):
    BatchNorm → scale/bias + batch_stats, depthwise kernels transpose
    [k,k,C,1]→[k,k,1,C], conv/dense kernels map directly. ``skip``
    lists exact layer names or name prefixes to ignore (ImageNet heads,
    preprocessing layers)."""
    import jax.numpy as jnp
    import numpy as np

    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = dict(flat)

    def put(key, value):
        if key not in flat:
            raise KeyError(f"converter target {key} not in model")
        if tuple(value.shape) != tuple(flat[key].shape):
            raise ValueError(f"{key}: {value.shape} vs {flat[key].shape}")
        out[key] = jnp.asarray(np.asarray(value))

    for layer in layer_names:
        if layer in skip or layer.startswith(tuple(skip)):
            continue
        w = weights_of(layer)
        if not w:
            continue
        if "gamma" in w:  # BatchNorm
            put(("params", layer, "scale"), w["gamma"])
            put(("params", layer, "bias"), w["beta"])
            put(("batch_stats", layer, "mean"), w["moving_mean"])
            put(("batch_stats", layer, "var"), w["moving_variance"])
        elif "depthwise_kernel" in w and "pointwise_kernel" not in w:
            put(("params", layer, "kernel"),
                np.transpose(w["depthwise_kernel"], (0, 1, 3, 2)))
        elif "kernel" in w:
            put(("params", layer, "kernel"), w["kernel"])
            if "bias" in w:
                put(("params", layer, "bias"), w["bias"])
        else:
            raise ValueError(
                f"{layer}: unrecognized weight set {sorted(w)}"
            )

    return flax.traverse_util.unflatten_dict(out)


def read_live_model(model) -> tuple[list[str], dict[str, dict]]:
    """(ordered weighted-layer names, {layer: {short: ndarray}}) from a
    live Keras model. Raises ValueError on weighted layer classes no
    family mapping consumes (e.g. the Normalization layer inside the
    EfficientNet applications — its mean offset cannot fold through a
    zero-padded stem conv)."""
    names: list[str] = []
    table: dict[str, dict] = {}
    for layer in model.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        cls = layer.__class__.__name__
        if cls not in WEIGHT_NAMES:
            raise ValueError(
                f"layer {layer.name!r}: unsupported weighted layer "
                f"class {cls}"
            )
        shorts = WEIGHT_NAMES[cls][: len(ws)]
        if len(shorts) != len(ws):
            raise ValueError(
                f"layer {layer.name!r} ({cls}): {len(ws)} weights, "
                f"expected at most {len(WEIGHT_NAMES[cls])}"
            )
        if layer.name in table:
            raise ValueError(f"duplicate layer name {layer.name!r}")
        names.append(layer.name)
        table[layer.name] = {
            s: np.asarray(w) for s, w in zip(shorts, ws)
        }
    return names, table
