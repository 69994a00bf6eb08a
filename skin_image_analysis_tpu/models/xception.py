"""Xception-style separable-conv network (Flax).

The reference's TF notebook trains an ImageNet Xception transfer model on
HAM-10000 (jgi_ham_2018_tf.ipynb cells 70-75, saved as
``skin_cancer_xception_model.keras``). This is a from-scratch Flax
Xception: entry/middle/exit flows of depthwise-separable convolutions with
residual skips, BatchNorm, GAP head — NHWC, bf16 compute. Depthwise convs
use ``feature_group_count``, which XLA maps efficiently on TPU.

Pretrained ImageNet weights are not downloadable here (zero egress);
the model trains from init or warm-starts via the generic checkpoint
mechanism.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.models.registry import register_model


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class SeparableConv(nn.Module):
    features: int
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x):
        dtype = _dtype(self.compute_dtype)
        in_feats = x.shape[-1]
        x = nn.Conv(
            in_feats, (3, 3), padding="SAME", feature_group_count=in_feats,
            use_bias=False, dtype=dtype, name="depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=dtype,
            name="pointwise",
        )(x)
        return x


class XceptionBlock(nn.Module):
    features: int
    strides: int = 2
    relu_first: bool = True
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, *, train: bool):
        dtype = _dtype(self.compute_dtype)
        residual = x
        y = x
        for i in range(2):
            if self.relu_first or i > 0:
                y = nn.relu(y)
            y = SeparableConv(self.features, self.compute_dtype)(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=dtype)(y)
        if self.strides > 1:
            y = nn.max_pool(
                y, (3, 3), strides=(self.strides, self.strides),
                padding=((1, 1), (1, 1)),
            )
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=dtype, name="skip_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, dtype=dtype, name="skip_bn"
            )(residual)
        return y + residual


class Xception(nn.Module):
    """Entry flow (32/64 stem + 128/256/728 blocks), ``middle_blocks``
    residual middle-flow blocks at 728, exit flow (1024 → separable
    1536/2048), GAP → Dropout → Dense(num_classes) → log-softmax."""

    num_classes: int = 2
    middle_blocks: int = 8
    head_dropout: float = 0.5
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        x = x.astype(dtype)
        x = nn.Conv(32, (3, 3), (2, 2), padding="SAME", use_bias=False,
                    dtype=dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False, dtype=dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dtype)(x)
        x = nn.relu(x)

        for feats in (128, 256, 728):
            x = XceptionBlock(
                feats, strides=2, relu_first=feats != 128,
                compute_dtype=self.compute_dtype,
            )(x, train=train)

        for _ in range(self.middle_blocks):
            x = XceptionBlock(
                728, strides=1, compute_dtype=self.compute_dtype
            )(x, train=train)

        x = XceptionBlock(1024, strides=2, compute_dtype=self.compute_dtype)(
            x, train=train
        )
        x = SeparableConv(1536, self.compute_dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dtype)(x)
        x = nn.relu(x)
        x = SeparableConv(2048, self.compute_dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dtype)(x)
        x = nn.relu(x)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=dtype)(x)
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


@register_model("xception")
def _build_xception(cfg: ModelConfig):
    return Xception(num_classes=cfg.num_classes,
                    compute_dtype=cfg.compute_dtype)


@register_model("xception_small")
def _build_xception_small(cfg: ModelConfig):
    return Xception(num_classes=cfg.num_classes, middle_blocks=2,
                    compute_dtype=cfg.compute_dtype)
