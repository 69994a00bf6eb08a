"""VGG-16/19 (Flax), weight-compatible with ``keras.applications.VGG16/
VGG19``.

The reference's TF transfer recipe lists VGG19 as a candidate backbone
(jgi_ham_2018_tf.ipynb cell 70, the commented
``keras.applications.vgg19.VGG19(weights="imagenet", include_top=False)``
alternative). Built like the other transfer families here: keras layer
names so the weight converter is the identity on names, NHWC,
MXU-friendly compute dtype, GAP → dropout → Dense → log-softmax head
(cell 70's GlobalAveragePooling2D + Dense recipe), ``freeze_backbone``
via stop_gradient.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

import flax.linen as nn

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.models.registry import register_model

# convs per block; features double per block to 512
_BLOCKS = {"vgg16": (2, 2, 3, 3, 3), "vgg19": (2, 2, 4, 4, 4)}
_FEATURES = (64, 128, 256, 512, 512)


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class VGG(nn.Module):
    """keras.applications.VGG16/19 backbone + the transfer head."""

    num_classes: int = 2
    block_convs: tuple[int, ...] = _BLOCKS["vgg19"]
    head_dropout: float = 0.5
    compute_dtype: str = "bfloat16"
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        x = x.astype(dtype)
        for bi, (n, feats) in enumerate(
            zip(self.block_convs, _FEATURES), start=1
        ):
            for ci in range(1, n + 1):
                x = nn.Conv(feats, (3, 3), padding="SAME", dtype=dtype,
                            name=f"block{bi}_conv{ci}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = jnp.mean(x, axis=(1, 2))  # GAP
        if self.freeze_backbone:
            x = jax.lax.stop_gradient(x)
        x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=dtype)(x)
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


@register_model("vgg16")
def _build_vgg16(cfg: ModelConfig):
    return VGG(num_classes=cfg.num_classes, block_convs=_BLOCKS["vgg16"],
               compute_dtype=cfg.compute_dtype,
               freeze_backbone=cfg.freeze_backbone)


@register_model("vgg19")
def _build_vgg19(cfg: ModelConfig):
    return VGG(num_classes=cfg.num_classes, block_convs=_BLOCKS["vgg19"],
               compute_dtype=cfg.compute_dtype,
               freeze_backbone=cfg.freeze_backbone)


def apply_keras_vgg_weights(layer_names, weights_of, variables) -> Any:
    """Keras→Flax VGG mapping (source-agnostic, models/keras_io.py).
    Every backbone layer is a biased 3x3 conv whose keras name equals
    the Flax submodule name; the ImageNet head (fc1/fc2/predictions) is
    skipped — the transfer recipe replaces it."""
    import numpy as np

    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = dict(flat)

    def put(key, value):
        if key not in flat:
            raise KeyError(f"converter target {key} not in model")
        if tuple(value.shape) != tuple(flat[key].shape):
            raise ValueError(
                f"{key}: {value.shape} vs {flat[key].shape}"
            )
        out[key] = jnp.asarray(np.asarray(value))

    for layer in layer_names:
        if not (layer.startswith("block") and "_conv" in layer):
            continue
        w = weights_of(layer)
        put(("params", layer, "kernel"), w["kernel"])
        put(("params", layer, "bias"), w["bias"])

    return flax.traverse_util.unflatten_dict(out)


def load_keras_vgg_weights(path: str, variables: Any) -> Any:
    """Map a legacy-format VGG weights ``.h5`` (the downloadable
    ``vgg1?_weights_tf_dim_ordering_tf_kernels_notop.h5`` layout) onto
    this model's variables; h5py only."""
    from skin_image_analysis_tpu.models.keras_io import read_legacy_h5

    layer_names, table = read_legacy_h5(path)
    return apply_keras_vgg_weights(layer_names, table.__getitem__,
                                   variables)
