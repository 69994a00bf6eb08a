"""Skin-cancer CNN family (Flax).

TPU-native re-design of the reference model layer (src/tone_bias_model.py):

- :class:`SkinCancerListModel` — the production model
  (tone_bias_model.py:56-152): conv stack ``[32, 64, 128]`` (first kernel
  7, rest 3, stride 1, SAME padding, each + ReLU + 2x2 max-pool), flatten,
  MLP ``[512, 256]`` with ReLU + Dropout(0.5), ``Linear(->2)`` +
  log-softmax head, Xavier-normal init on every trainable layer (:136-137).
- :class:`SkinCancerModel` — the older fixed 4-conv-block variant
  (tone_bias_model.py:155-299), kept for checkpoint/behavior parity.

TPU-first choices (deliberately NOT a translation):

- **NHWC layout** (XLA's preferred conv layout on TPU) instead of the
  reference's NCHW tensors;
- **bfloat16 compute / float32 params** so convs and the big flatten
  matmul (100352x512, ~51M params) run on the MXU at full rate; the
  log-softmax head is always computed in float32 for numerical parity;
- dropout driven by explicit JAX PRNG keys (functional, reproducible)
  rather than global RNG state.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from skin_image_analysis_tpu.config import ModelConfig

_XAVIER = nn.initializers.xavier_normal()


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


class _PackedConvPool(nn.Module):
    """Pool-phase-packed conv+relu+pool (ops.pooling.phase_packed_conv_
    block): declares the SAME parameters as nn.Conv (kernel [k,k,Cin,Cout]
    Xavier, bias zeros) so checkpoints are interchangeable with the
    unpacked block."""

    features: int
    kernel: int
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        from skin_image_analysis_tpu.ops.pooling import (
            phase_packed_conv_block,
        )

        k = self.kernel
        kernel = self.param(
            "kernel", _XAVIER,
            (k, k, x.shape[-1], self.features), _dtype(self.param_dtype),
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(),
            (self.features,), _dtype(self.param_dtype),
        )
        dt = _dtype(self.compute_dtype)
        return phase_packed_conv_block(
            x.astype(dt), kernel.astype(dt), bias.astype(dt)
        )


class _S2DConvPool(nn.Module):
    """Space-to-depth stem block (ops.pooling.s2d_conv_block): the
    phase-packed conv+relu+pool evaluated over the 2x2 space-to-depth
    input layout — turns the 3-input-channel stem conv (13-27% MFU from
    XLA's emitter, docs/PERF.md) into a 12-channel 5x5 conv with a 4x
    denser contraction tile. Declares the SAME reference-shaped
    parameters ([k, k, Cin, Cout] Xavier kernel + zeros bias) as the
    other lowerings, so checkpoints are interchangeable.

    Expects input ALREADY in space_to_depth_nhwc layout
    ([B, H/2, W/2, 4*Cin]); the model applies the (cheap, XLA-fused)
    transform when handed raw [B, H, W, Cin] images — the Pallas
    preprocess kernel can emit the layout directly at zero extra cost.
    """

    features: int
    kernel: int
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    @nn.compact
    def __call__(self, z):
        from skin_image_analysis_tpu.ops.pooling import s2d_conv_block

        k = self.kernel
        cin = z.shape[-1] // 4
        kernel = self.param(
            "kernel", _XAVIER,
            (k, k, cin, self.features), _dtype(self.param_dtype),
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(),
            (self.features,), _dtype(self.param_dtype),
        )
        dt = _dtype(self.compute_dtype)
        return s2d_conv_block(
            z.astype(dt), kernel.astype(dt), bias.astype(dt)
        )


class ConvBlock(nn.Module):
    """Conv + ReLU + 2x2 max-pool (one reference 'conv block',
    tone_bias_model.py:77-97).

    ``pool_mode`` selects the TPU lowering (all bit-equal forward):

    - "phase": pool-phase-packed stride-2 conv + channel-group max
      (ops.pooling.phase_packed_conv_block) — full MXU lanes on the
      3->32 first block, channel-local pool backward;
    - "selector": stride-1 conv + fused ReLU+pool with the u8-selector
      VJP (ops.pooling.relu_max_pool_2x2);
    - "stock": nn.relu + nn.max_pool (SelectAndScatter backward).
    - "auto": the measured-best per docs/PERF.md.
    """

    features: int
    kernel: int
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    pool_mode: str = "auto"

    @nn.compact
    def __call__(self, x):
        mode = self.pool_mode
        if mode == "s2d":
            # space-to-depth stem: input is already in the s2d layout
            # (the model or the Pallas preprocess kernel transformed it)
            return _S2DConvPool(
                self.features, self.kernel, self.compute_dtype,
                self.param_dtype, name="Conv_0",
            )(x)
        if mode == "auto":
            # measured (docs/PERF.md): phase-packing wins when the packed
            # channel count still fits one 128-lane tile (the stride-1
            # conv ran under-utilized); above that the 4x channel stack
            # only inflates FLOPs — use the selector VJP there.
            mode = "phase" if self.features * 4 <= 128 else "selector"
        if mode == "phase" and (x.shape[1] % 2 or x.shape[2] % 2):
            # the packed stride-2 conv assumes even H, W (VALID pool crops
            # odd tails, which changes boundary conv outputs) — fall back
            mode = "selector"
        if mode == "phase":
            return _PackedConvPool(
                self.features, self.kernel, self.compute_dtype,
                self.param_dtype, name="Conv_0",
            )(x)
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(1, 1),
            padding="SAME",
            kernel_init=_XAVIER,
            dtype=_dtype(self.compute_dtype),
            param_dtype=_dtype(self.param_dtype),
        )(x)
        if mode == "selector":
            from skin_image_analysis_tpu.ops.pooling import relu_max_pool_2x2

            return relu_max_pool_2x2(x)
        if mode != "stock":
            raise ValueError(f"unknown pool_mode {self.pool_mode!r}")
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return x


class MlpBlock(nn.Module):
    """Dense + ReLU + Dropout (one reference 'linear block',
    tone_bias_model.py:107-118).

    ``rate_override``: a *traced* dropout rate replacing the static one —
    lets vmap-stacked HPO trial populations vary dropout per trial inside
    one XLA program (hpo.population)."""

    features: int
    dropout: float
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, *, train: bool, rate_override=None):
        x = nn.Dense(
            self.features,
            kernel_init=_XAVIER,
            dtype=_dtype(self.compute_dtype),
            param_dtype=_dtype(self.param_dtype),
        )(x)
        x = nn.relu(x)
        if rate_override is not None:
            if train:
                keep = 1.0 - rate_override
                key = self.make_rng("dropout")
                mask = jax.random.bernoulli(key, keep, x.shape)
                x = jnp.where(mask, x / keep.astype(x.dtype), 0.0).astype(
                    x.dtype
                )
        else:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class SkinCancerListModel(nn.Module):
    """List-configured CNN: the production diagnosis classifier.

    Input: ``[B, H, W, 3]`` float images in [0, 1] (NHWC).
    Output: ``[B, num_classes]`` float32 log-probabilities (log-softmax
    head, paired with the NLL loss as in tone_bias_model.py:126-129,:301).
    """

    conv_features: Sequence[int] = (32, 64, 128)
    first_kernel: int = 7
    kernel: int = 3
    linear_features: Sequence[int] = (512, 256)
    dropout: Sequence[float] = (0.5, 0.5)
    num_classes: int = 2
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    remat: bool = False
    fused_pool: bool = True
    pool_mode: str = "auto"
    stem: str = "auto"
    # Raw input channels. Disambiguates an already-space-to-depth input
    # (exactly 4*in_channels, e.g. the Pallas kernel's [B,112,112,12])
    # from a raw one — a shape-only `% 4 == 0` heuristic would silently
    # misread a genuine 4-channel raw input as 2x2 pixel phases.
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, *, train: bool = False, dropout_rates=None):
        # optional rematerialization: recompute conv activations (the
        # dominant HBM term, e.g. 224^2 x 32) in the backward pass instead
        # of holding them; MLP activations are negligible and keep their
        # static `train` kwarg out of jax.checkpoint
        conv_cls = nn.remat(ConvBlock) if self.remat else ConvBlock
        mlp_cls = MlpBlock
        mode = "stock" if not self.fused_pool else self.pool_mode
        x = x.astype(_dtype(self.compute_dtype))
        # Space-to-depth stem (measured fastest on TPU, docs/PERF.md
        # round-3 ladder): block 0 runs over the 2x2 s2d layout. Raw
        # [B, H, W, 1|3] images transform here (one cheap XLA relayout);
        # the Pallas preprocess kernel feeds the s2d layout directly,
        # detected by a channel count that is a multiple of 4.
        use_s2d = (
            self.stem == "s2d"
            and self.fused_pool
            and len(self.conv_features) > 0
            and self.first_kernel % 2 == 1  # SAME-padding derivation
            and (
                x.shape[-1] == 4 * self.in_channels
                or (
                    x.shape[-1] == self.in_channels
                    and x.shape[1] % 2 == 0
                    and x.shape[2] % 2 == 0
                )
            )
        )
        if use_s2d and x.shape[-1] == self.in_channels:
            from skin_image_analysis_tpu.ops.pooling import (
                space_to_depth_nhwc,
            )

            x = space_to_depth_nhwc(x)
        for i, feats in enumerate(self.conv_features):
            k = self.first_kernel if i == 0 else self.kernel
            block_mode = "s2d" if (i == 0 and use_s2d) else mode
            # explicit name keeps the param tree identical with/without
            # remat (checkpoints are interchangeable)
            x = conv_cls(
                feats, k, self.compute_dtype, self.param_dtype,
                block_mode, name=f"ConvBlock_{i}",
            )(x)
        x = x.reshape((x.shape[0], -1))
        drops = list(self.dropout)
        if len(drops) == 1:
            drops = drops * len(self.linear_features)
        for j, (feats, rate) in enumerate(zip(self.linear_features, drops)):
            x = mlp_cls(feats, rate, self.compute_dtype, self.param_dtype)(
                x, train=train,
                rate_override=(
                    None if dropout_rates is None else dropout_rates[j]
                ),
            )
        x = nn.Dense(
            self.num_classes,
            kernel_init=_XAVIER,
            dtype=_dtype(self.compute_dtype),
            param_dtype=_dtype(self.param_dtype),
        )(x)
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


class SkinCancerModel(nn.Module):
    """Legacy fixed 4-conv-block variant (tone_bias_model.py:155-299):
    conv 32→64→128→256 then MLP [512, 256]; kept for parity with the
    reference's ``create_model`` path."""

    num_classes: int = 2
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    fused_pool: bool = True
    pool_mode: str = "auto"
    stem: str = "auto"
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return SkinCancerListModel(
            conv_features=(32, 64, 128, 256),
            first_kernel=7,
            kernel=3,
            linear_features=(512, 256),
            dropout=(0.5, 0.5),
            num_classes=self.num_classes,
            compute_dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            fused_pool=self.fused_pool,
            pool_mode=self.pool_mode,
            stem=self.stem,
            in_channels=self.in_channels,
        )(x, train=train)


def resolve_stem(cfg: ModelConfig) -> str:
    """Resolve ``stem="auto"`` to the measured-best block-0 lowering
    (docs/PERF.md round-3 ladder). Callers that feed the model (the
    train loop, bench) use this to decide whether the Pallas preprocess
    kernel should emit the space-to-depth layout."""
    if cfg.stem != "auto":
        return cfg.stem
    # measured (docs/PERF.md round-3 ladder): the s2d 5x5x12 stem LOSES
    # to the phase-packed 8x8/s2 form (conv0 fwd 5.31 vs 4.58 ms, bench
    # 11,512 vs 11,792 img/s) — the 1.56x MAC inflation of the s2d hull
    # outweighs any channel-density gain because XLA's conv emitter
    # already contracts over the full k²·Cin patch. Kept as "s2d" for
    # the record; auto = the measured winner.
    return "phase"


def stem_wants_s2d(cfg: ModelConfig) -> bool:
    """Whether the model will actually CONSUME a space-to-depth input —
    the full predicate SkinCancerListModel.use_s2d applies (resolved
    stem, fused_pool on, a conv stack, odd first kernel). Input-geometry
    guards (even dims, RGB) live in the preprocess kernel itself.
    Feeding an s2d layout to a model that fails this predicate would
    shape-error at the first conv."""
    return (
        cfg.name in ("skin_cancer_list", "skin_cancer")
        and resolve_stem(cfg) == "s2d"
        and cfg.fused_pool
        and len(cfg.conv_features) > 0
        and cfg.first_kernel % 2 == 1
    )


def build_model(cfg: ModelConfig) -> nn.Module:
    """Instantiate the model described by a :class:`ModelConfig`."""
    if cfg.name == "skin_cancer_list":
        return SkinCancerListModel(
            conv_features=cfg.conv_features,
            first_kernel=cfg.first_kernel,
            kernel=cfg.kernel,
            linear_features=cfg.linear_features,
            dropout=cfg.dropout,
            num_classes=cfg.num_classes,
            compute_dtype=cfg.compute_dtype,
            param_dtype=cfg.param_dtype,
            remat=cfg.remat,
            fused_pool=cfg.fused_pool,
            pool_mode=cfg.pool_mode,
            stem=resolve_stem(cfg),
            in_channels=cfg.in_channels,
        )
    if cfg.name == "skin_cancer":
        return SkinCancerModel(
            num_classes=cfg.num_classes,
            compute_dtype=cfg.compute_dtype,
            param_dtype=cfg.param_dtype,
            fused_pool=cfg.fused_pool,
            pool_mode=cfg.pool_mode,
            stem=resolve_stem(cfg),
            in_channels=cfg.in_channels,
        )
    from skin_image_analysis_tpu.models.registry import get_model

    return get_model(cfg.name)(cfg)
