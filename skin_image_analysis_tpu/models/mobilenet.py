"""MobileNetV2 (Flax), weight-compatible with
``keras.applications.MobileNetV2`` (alpha=1.0).

The reference's TF transfer recipe lists MobileNetV2 as a candidate
backbone (jgi_ham_2018_tf.ipynb cell 70, the commented
``keras.applications.mobilenet_v2.MobileNetV2(weights="imagenet",
include_top=False)`` alternative). Inverted residual bottlenecks with
ReLU6 and linear projections; keras layer naming (``Conv1``/
``expanded_conv_*``/``block_N_*``/``Conv_1``) so the weight converter
is the identity on names; BN eps 1e-3; stride-2 depthwise convs use
keras' correct_pad + VALID geometry. Head = GAP → dropout → Dense →
log-softmax (cell 70's recipe), ``freeze_backbone`` via stop_gradient.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

import flax.linen as nn

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.models.efficientnet import _correct_pad
from skin_image_analysis_tpu.models.registry import register_model

_BN_EPS = 1e-3  # keras mobilenet_v2 BatchNormalization(epsilon=1e-3)

# (expansion t, filters c, repeats n, first stride s) — the paper/keras
# inverted-residual table
_STAGES = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def make_divisible(v: float, divisor: int = 8) -> int:
    """keras ``_make_divisible``: round channel counts to the divisor,
    never dropping more than 10%."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class MobileNetV2(nn.Module):
    """keras.applications.MobileNetV2 backbone + the transfer head."""

    num_classes: int = 2
    alpha: float = 1.0
    head_dropout: float = 0.5
    compute_dtype: str = "bfloat16"
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     dtype=dtype, epsilon=_BN_EPS)
        relu6 = jax.nn.relu6
        x = x.astype(dtype)

        first = make_divisible(32 * self.alpha)
        x = nn.Conv(first, (3, 3), (2, 2), padding="SAME",
                    use_bias=False, dtype=dtype, name="Conv1")(x)
        x = bn(name="bn_Conv1")(x)
        x = relu6(x)

        filters_in = first
        block_id = 0
        for t, c, n, s in _STAGES:
            c_out = make_divisible(c * self.alpha)
            for i in range(n):
                stride = s if i == 0 else 1
                prefix = ("expanded_conv" if block_id == 0
                          else f"block_{block_id}")
                y = x
                filters = filters_in * t
                if t != 1:
                    y = nn.Conv(filters, (1, 1), use_bias=False,
                                dtype=dtype,
                                name=f"{prefix}_expand")(y)
                    y = bn(name=f"{prefix}_expand_BN")(y)
                    y = relu6(y)
                pad = (_correct_pad(y, 3) if stride == 2 else "SAME")
                y = nn.Conv(filters, (3, 3), (stride, stride),
                            padding=pad, feature_group_count=filters,
                            use_bias=False, dtype=dtype,
                            name=f"{prefix}_depthwise")(y)
                y = bn(name=f"{prefix}_depthwise_BN")(y)
                y = relu6(y)
                y = nn.Conv(c_out, (1, 1), use_bias=False, dtype=dtype,
                            name=f"{prefix}_project")(y)
                y = bn(name=f"{prefix}_project_BN")(y)
                if stride == 1 and filters_in == c_out:
                    y = y + x
                x = y
                filters_in = c_out
                block_id += 1

        # keras: 1280 stays fixed unless alpha > 1.0
        last = (make_divisible(1280 * self.alpha)
                if self.alpha > 1.0 else 1280)
        x = nn.Conv(last, (1, 1), use_bias=False, dtype=dtype,
                    name="Conv_1")(x)
        x = bn(name="Conv_1_bn")(x)
        x = relu6(x)

        x = jnp.mean(x, axis=(1, 2))  # GAP
        if self.freeze_backbone:
            x = jax.lax.stop_gradient(x)
        x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=dtype)(x)
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


@register_model("mobilenet_v2")
def _build_mbv2(cfg: ModelConfig):
    return MobileNetV2(num_classes=cfg.num_classes,
                       compute_dtype=cfg.compute_dtype,
                       freeze_backbone=cfg.freeze_backbone)


def apply_keras_mobilenet_v2_weights(layer_names, weights_of,
                                     variables) -> Any:
    """Keras→Flax MobileNetV2 mapping (source-agnostic,
    models/keras_io.py). Names are the identity; depthwise kernels
    [k, k, C, 1] transpose to Flax's grouped-conv [k, k, 1, C]. The
    ImageNet head ('predictions'/'Logits') is skipped — the transfer
    recipe replaces it."""
    from skin_image_analysis_tpu.models.keras_io import (
        apply_name_identity_weights,
    )

    return apply_name_identity_weights(
        layer_names, weights_of, variables,
        skip=("predictions", "Logits", "rescaling", "normalization"),
    )


def load_keras_mobilenet_v2_weights(path: str, variables: Any) -> Any:
    """Map a legacy-format MobileNetV2 weights ``.h5`` (the downloadable
    ``mobilenet_v2_weights_tf_dim_ordering_tf_kernels_1.0_224_no_top.h5``
    layout) onto this model's variables; h5py only."""
    from skin_image_analysis_tpu.models.keras_io import read_legacy_h5

    layer_names, table = read_legacy_h5(path)
    return apply_keras_mobilenet_v2_weights(
        layer_names, table.__getitem__, variables
    )
