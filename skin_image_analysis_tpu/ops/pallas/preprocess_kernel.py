"""Pallas TPU kernel: fused uint8 → float32 crop + flip + normalize.

The hot input-pipeline op: canonical uint8 images become normalized
model-input tiles in ONE VMEM pass — no materialized intermediate between
cast, crop, flip and normalize (XLA fuses most elementwise chains, but the
u8 load + dynamic crop + lane reversal + FMA here stay a single kernel
with zero HBM round-trips for intermediates).

Layout: images are **planar** [B, C, S, S] (channel-major). Interleaved
HWC puts C=3 in the lane dimension, which tiles catastrophically on TPU
(lane dim must be 128-aligned); planar blocks are [S, S] = e.g. 256x256 —
2x128 lanes, perfectly tiled. The native decoder can emit planar directly,
and the model-side transpose to NHWC fuses into the first conv's im2col.

Per-image randomness (crop offsets, flip bits) is precomputed on host/XLA
from a jax.random key and fed through scalar prefetch, so the kernel stays
deterministic given the key — same discipline as ops.preprocess.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offs_ref, flips_ref, scale_ref, bias_ref, img_ref, out_ref):
    """Grid (B, C): one [S, S] uint8 plane → [T, T] float32 tile.

    offs_ref: [B, 2] int32 (y0, x0) crop offsets  (scalar-prefetch, SMEM)
    flips_ref: [B] int32 flip flags               (scalar-prefetch, SMEM)
    scale_ref/bias_ref: [B, C] f32 per-image, per-channel affine
      (scalar-prefetch, SMEM — per-image so brightness jitter folds in)
    img_ref: [S, S] uint8 plane in VMEM; out_ref: [T, T] f32.

    Crop and (optional) horizontal flip are expressed as one-hot
    **selection matmuls** built from iota compares:
    ``out = A_y(y0) @ img @ A_x(x0, flip)``. Mosaic forbids dynamic
    sublane slices at unaligned offsets and has no ``rev`` primitive; the
    MXU does arbitrary-offset row/column selection (and lane reversal)
    for free — this is the TPU-idiomatic gather.
    """
    b = pl.program_id(0)
    c = pl.program_id(1)
    t = out_ref.shape[0]
    t_lanes = out_ref.shape[1]  # t rounded up to the 128-lane tiling
    s = img_ref.shape[0]

    y0 = offs_ref[b, 0]
    x0 = offs_ref[b, 1]
    flip = flips_ref[b]

    # Mosaic has no direct u8→f32 cast; widen through int32.
    img = img_ref[:, :].astype(jnp.int32).astype(jnp.float32)

    # A_y[i, j] = 1 iff j == i + y0          ([T, S] row selector)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
    a_y = (j_idx == i_idx + y0).astype(jnp.float32)

    # A_x[j, k] = 1 iff j == x0 + (flip ? t-1-k : k)  ([S, T_lanes] col
    # selector; lane-padding columns k >= t select nothing → zeros)
    jj = jax.lax.broadcasted_iota(jnp.int32, (s, t_lanes), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (s, t_lanes), 1)
    k_eff = jnp.where(flip != 0, t - 1 - kk, kk)
    valid_col = kk < t
    a_x = ((jj == x0 + k_eff) & valid_col).astype(jnp.float32)

    tile = jnp.dot(
        jnp.dot(a_y, img, preferred_element_type=jnp.float32),
        a_x,
        preferred_element_type=jnp.float32,
    )
    # normalize: one FMA — folds /255, per-image brightness, and
    # (x - mean)/std per channel
    out_ref[:, :] = tile * scale_ref[b, c] + bias_ref[b, c]


@partial(jax.jit, static_argnames=("image_size", "interpret"))
def fused_preprocess_planar(
    pixels: jnp.ndarray,
    offsets: jnp.ndarray,
    flips: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    image_size: int = 224,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, C, S, S] uint8 → [B, C, T, T] float32, fused on-device.

    offsets: [B, 2] int32 top-left crops; flips: [B] int32; scale/bias:
    [B, C] float32 per-image/channel affine (e.g. scale=1/255/std,
    bias=-mean/std, with brightness jitter folded into scale).
    """
    b, ch, s, _ = pixels.shape
    t = image_size
    t_lanes = -(-t // 128) * 128  # output lane dim must be 128-tiled
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, ch),
        in_specs=[
            pl.BlockSpec((1, 1, s, s), lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t, t_lanes), lambda i, j, *_: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def kernel(offs, fl, sc, bi, img, out):
        _kernel(offs, fl, sc, bi, img.at[0, 0], out.at[0, 0])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, ch, t, t_lanes), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, flips, scale, bias, pixels)
    return out[:, :, :, :t]


def preprocess_planar_batch(
    pixels: jnp.ndarray,
    key: jax.Array | None,
    *,
    image_size: int = 224,
    train: bool = False,
    augment=None,
    normalize_imagenet: bool = False,
) -> jnp.ndarray:
    """High-level wrapper: derives crop offsets + flips (+ jitter factors)
    from ``key`` (center crop / no flip / no jitter at eval), builds the
    per-image affine, runs the kernel, and returns NHWC float32 for the
    conv stack.

    Augmentation semantics match ops.preprocess.preprocess_batch (same
    distributions; the PRNG streams differ bitwise between the two
    backends): brightness folds into the kernel's per-image scale;
    contrast/saturation need cross-channel stats so they run as one
    fused elementwise pass over the small cropped tile, followed by the
    [0,1] clip and the optional ImageNet normalize.
    """
    b, ch, s, _ = pixels.shape
    t = image_size
    augmenting = bool(
        train and key is not None and augment is not None
    )
    if augmenting:
        ky, kx, kf, kb, kc, ks = jax.random.split(key, 6)
        if augment.random_crop and s > t:
            ys = jax.random.randint(ky, (b,), 0, s - t + 1, dtype=jnp.int32)
            xs = jax.random.randint(kx, (b,), 0, s - t + 1, dtype=jnp.int32)
        else:
            c0 = (s - t) // 2
            ys = jnp.full((b,), c0, jnp.int32)
            xs = jnp.full((b,), c0, jnp.int32)
        if augment.horizontal_flip:
            flips = jax.random.bernoulli(kf, 0.5, (b,)).astype(jnp.int32)
        else:
            flips = jnp.zeros((b,), jnp.int32)
    else:
        c0 = (s - t) // 2
        ys = jnp.full((b,), c0, jnp.int32)
        xs = jnp.full((b,), c0, jnp.int32)
        flips = jnp.zeros((b,), jnp.int32)
    offsets = jnp.stack([ys, xs], axis=1)

    # per-image affine: /255 always; brightness jitter multiplies in
    scale = jnp.full((b, ch), 1.0 / 255.0, jnp.float32)
    bias = jnp.zeros((b, ch), jnp.float32)
    jitter_tail = False
    if augmenting:
        if augment.brightness > 0:
            f = jax.random.uniform(
                kb, (b, 1), minval=1 - augment.brightness,
                maxval=1 + augment.brightness,
            )
            scale = scale * f
            jitter_tail = True
        if augment.contrast > 0 or augment.saturation > 0:
            jitter_tail = True

    interpret = jax.default_backend() == "cpu"  # CPU tests: interpreter

    fold_normalize = normalize_imagenet and not jitter_tail
    if fold_normalize:
        from skin_image_analysis_tpu.ops.preprocess import (
            IMAGENET_MEAN, IMAGENET_STD,
        )

        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        scale = scale / std
        bias = bias - mean / std

    out = fused_preprocess_planar(
        pixels, offsets, flips, scale, bias, image_size=t,
        interpret=interpret,
    )
    x = jnp.transpose(out, (0, 2, 3, 1))  # NCHW → NHWC for the convs

    if jitter_tail:
        # contrast/saturation on the small cropped tile + the [0,1] clip
        # (same op order as ops.preprocess._color_jitter)
        if augment.contrast > 0:
            f = jax.random.uniform(
                kc, (b, 1, 1, 1), minval=1 - augment.contrast,
                maxval=1 + augment.contrast,
            )
            m = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            x = (x - m) * f + m
        if augment.saturation > 0:
            f = jax.random.uniform(
                ks, (b, 1, 1, 1), minval=1 - augment.saturation,
                maxval=1 + augment.saturation,
            )
            gray = (0.299 * x[..., 0:1] + 0.587 * x[..., 1:2]
                    + 0.114 * x[..., 2:3])
            x = (x - gray) * f + gray
        x = jnp.clip(x, 0.0, 1.0)
        if normalize_imagenet:
            from skin_image_analysis_tpu.ops.preprocess import (
                IMAGENET_MEAN, IMAGENET_STD,
            )

            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
            std = jnp.asarray(IMAGENET_STD, jnp.float32)
            x = (x - mean) / std
    return x
