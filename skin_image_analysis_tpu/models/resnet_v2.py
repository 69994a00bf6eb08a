"""ResNet-V2 (pre-activation, Flax), weight-compatible with
``keras.applications.ResNet50V2/101V2/152V2``.

The reference's TF transfer recipe lists ResNet50V2 as the FIRST
commented backbone alternative (jgi_ham_2018_tf.ipynb cell 70,
``keras.applications.resnet_v2.ResNet50V2(weights="imagenet",
include_top=False)``). Pre-activation bottlenecks (He et al. 2016 v2):
every block opens with BN+ReLU; the stride-2 downsample sits in the
LAST block of each stack (keras ``stack2`` order) with a 1-pixel
max-pool shortcut; stem is zero-pad(3)+7x7/s2 VALID with bias and NO
BN; final ``post_bn``+ReLU before pooling. Keras layer naming
(``conv1_conv``/``conv{s}_block{b}_{0|1|2|3}_conv``/``..._preact_bn``/
``post_bn``) so the weight converter is the identity on names; BN eps
1.001e-5 (the resnet_v2 value, NOT the 1e-3 the other applications
use). Head = GAP → dropout → Dense → log-softmax (cell 70's recipe),
``freeze_backbone`` via stop_gradient.

Bit-faithfulness notes: keras pads with ZEROS before the VALID stem
conv and the 3x3 pool (a zero can win the max over all-negative
activations, so the pool pads 0, not -inf); the v2 identity-downsample
shortcut is ``MaxPooling2D(1, strides=2)`` == a ::2 strided slice.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

import flax.linen as nn

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.models.registry import register_model

_BN_EPS = 1.001e-5  # keras resnet_v2 BatchNormalization epsilon

_DEPTHS = {
    "resnet50_v2": (3, 4, 6, 3),
    "resnet101_v2": (3, 4, 23, 3),
    "resnet152_v2": (3, 8, 36, 3),
}


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def _zero_pad(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


class ResNetV2(nn.Module):
    """keras.applications.ResNet*V2 backbone + the transfer head."""

    num_classes: int = 2
    depths: tuple[int, ...] = _DEPTHS["resnet50_v2"]
    head_dropout: float = 0.5
    compute_dtype: str = "bfloat16"
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        conv = partial(nn.Conv, padding="VALID", dtype=dtype)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     dtype=dtype, epsilon=_BN_EPS)
        x = x.astype(dtype)

        # stem: pad(3) + 7x7/s2 VALID biased conv (no BN in v2), then
        # pad(1) + 3x3/s2 VALID max-pool — keras pads zeros, kept
        x = conv(64, (7, 7), (2, 2), name="conv1_conv")(_zero_pad(x, 3))
        x = nn.max_pool(_zero_pad(x, 1), (3, 3), strides=(2, 2),
                        padding="VALID")

        for si, (filters, blocks) in enumerate(
            zip((64, 128, 256, 512), self.depths), start=2
        ):
            for b in range(1, blocks + 1):
                name = f"conv{si}_block{b}"
                # keras stack2: downsample in the LAST block of every
                # stack except conv5
                stride = 2 if (b == blocks and si != 5) else 1
                preact = nn.relu(bn(name=f"{name}_preact_bn")(x))
                if b == 1:
                    shortcut = conv(4 * filters, (1, 1), (stride, stride),
                                    name=f"{name}_0_conv")(preact)
                elif stride > 1:
                    shortcut = x[:, ::stride, ::stride, :]
                else:
                    shortcut = x
                y = conv(filters, (1, 1), use_bias=False,
                         name=f"{name}_1_conv")(preact)
                y = nn.relu(bn(name=f"{name}_1_bn")(y))
                y = conv(filters, (3, 3), (stride, stride),
                         use_bias=False,
                         name=f"{name}_2_conv")(_zero_pad(y, 1))
                y = nn.relu(bn(name=f"{name}_2_bn")(y))
                y = conv(4 * filters, (1, 1), name=f"{name}_3_conv")(y)
                x = shortcut + y

        x = nn.relu(bn(name="post_bn")(x))
        x = jnp.mean(x, axis=(1, 2))  # GAP
        if self.freeze_backbone:
            x = jax.lax.stop_gradient(x)
        x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=dtype)(x)
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


def _register(variant: str):
    @register_model(variant)
    def _build(cfg: ModelConfig):
        return ResNetV2(num_classes=cfg.num_classes,
                        depths=_DEPTHS[variant],
                        compute_dtype=cfg.compute_dtype,
                        freeze_backbone=cfg.freeze_backbone)
    return _build


for _v in _DEPTHS:
    _register(_v)


def apply_keras_resnet_v2_weights(layer_names, weights_of,
                                  variables) -> Any:
    """Keras→Flax ResNet-V2 mapping (source-agnostic,
    models/keras_io.py). Names are the identity; the ImageNet head
    ('predictions'/'probs') is skipped — the transfer recipe replaces
    it."""
    from skin_image_analysis_tpu.models.keras_io import (
        apply_name_identity_weights,
    )

    return apply_name_identity_weights(
        layer_names, weights_of, variables,
        skip=("predictions", "probs", "rescaling", "normalization"),
    )


def load_keras_resnet_v2_weights(path: str, variables: Any) -> Any:
    """Map a legacy-format ResNet-V2 weights ``.h5`` (the downloadable
    ``resnet50v2_weights_tf_dim_ordering_tf_kernels_notop.h5`` layout)
    onto this model's variables; h5py only."""
    from skin_image_analysis_tpu.models.keras_io import read_legacy_h5

    layer_names, table = read_legacy_h5(path)
    return apply_keras_resnet_v2_weights(
        layer_names, table.__getitem__, variables
    )
