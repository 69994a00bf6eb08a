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

# Largest per-call batch proven to compile on hardware; bigger batches
# trip a Mosaic register-spill compile error (docs/PERF.md) and are
# split into chunks of this size.
_MAX_KERNEL_BATCH = 256


def _kernel_body(
    offs_ref, flips_ref, scale_ref, bias_ref, img_ref, out_ref,
    fc_ref=None, fs_ref=None, ps_ref=None, pb_ref=None, s2d=False,
):
    """Grid (B,): one [C, S, S] uint8 image → [C, T, T] output tiles
    (or, with ``s2d``, [4C, T/2, T/2] space-to-depth tiles).

    offs_ref: [B, 2] int32 (y0, x0) crop offsets  (scalar-prefetch, SMEM)
    flips_ref: [B] int32 flip flags               (scalar-prefetch, SMEM)
    scale_ref/bias_ref: [B, C] f32 per-image, per-channel affine
      (scalar-prefetch, SMEM — per-image so brightness jitter folds in)
    fc_ref/fs_ref: [B] f32 contrast/saturation jitter factors and
    ps_ref/pb_ref: [B, C] f32 post-clip normalize affine — the full
      color-jitter tail runs in-kernel (one VMEM pass, no XLA tail
      fusions over the cropped batch).
    img_ref: [C, S, S] uint8 image in VMEM; out_ref: [C, T, T_lanes]
      (s2d: [4C, T/2, TH_lanes], channel index c*4 + 2*dy + dx — the
      ops.pooling.space_to_depth_nhwc layout for the s2d conv stem).

    Crop and (optional) horizontal flip are expressed as one-hot
    **selection matmuls** built from iota compares:
    ``out = A_y(y0) @ img @ A_x(x0, flip)``. Mosaic forbids dynamic
    sublane slices at unaligned offsets and has no ``rev`` primitive; the
    MXU does arbitrary-offset row/column selection (and lane reversal)
    for free — this is the TPU-idiomatic gather. The selectors are built
    once per image (shared across channels) in bfloat16: one-hot times
    uint8 values (≤ 255, exact in bf16) with float32 accumulation is
    bit-exact and runs the MXU at 2x the f32 rate.

    ``s2d`` emits the 2x2 space-to-depth layout at the same MXU cost:
    per dy a half-height row selector picks rows y0+2u+dy, per dx a
    half-width column selector picks columns x0+2v+dx (flip folds in as
    source column t-1-(2v+dx), which lands on the mirrored phase
    automatically) — 2 row matmuls + 4 quarter-size tile matmuls per
    channel equal the non-s2d FLOPs exactly.
    """
    b = pl.program_id(0)
    ch = img_ref.shape[0]
    s = img_ref.shape[1]
    if s2d:
        th = out_ref.shape[1]
        t = 2 * th                  # source crop size
        t_lanes = out_ref.shape[2]  # th rounded up to the 128-lane tiling
    else:
        t = out_ref.shape[1]
        t_lanes = out_ref.shape[2]  # t rounded up to the 128-lane tiling

    y0 = offs_ref[b, 0]
    x0 = offs_ref[b, 1]
    flip = flips_ref[b]

    if s2d:
        # A_y^dy[u, j] = 1 iff j == y0 + 2u + dy   ([T/2, S] per dy)
        u_idx = jax.lax.broadcasted_iota(jnp.int32, (th, s), 0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (th, s), 1)
        a_ys = [
            (j_idx == y0 + 2 * u_idx + dy).astype(jnp.bfloat16)
            for dy in (0, 1)
        ]
        # A_x^dx[j, v] = 1 iff j == x0 + keff(2v+dx)  ([S, TH_lanes])
        jj = jax.lax.broadcasted_iota(jnp.int32, (s, t_lanes), 0)
        vv = jax.lax.broadcasted_iota(jnp.int32, (s, t_lanes), 1)
        valid_col = vv < th
        a_xs = []
        for dx in (0, 1):
            kk = 2 * vv + dx
            k_eff = jnp.where(flip != 0, t - 1 - kk, kk)
            a_xs.append(
                ((jj == x0 + k_eff) & valid_col).astype(jnp.bfloat16)
            )
    else:
        # A_y[i, j] = 1 iff j == i + y0          ([T, S] row selector)
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
        a_ys = [(j_idx == i_idx + y0).astype(jnp.bfloat16)]

        # A_x[j, k] = 1 iff j == x0 + (flip ? t-1-k : k)  ([S, T_lanes]
        # col selector; lane-padding columns k >= t select nothing → 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (s, t_lanes), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (s, t_lanes), 1)
        k_eff = jnp.where(flip != 0, t - 1 - kk, kk)
        valid_col = kk < t
        a_xs = [((jj == x0 + k_eff) & valid_col).astype(jnp.bfloat16)]

    # tiles ordered c-major, phase-minor (c*len(phases) + 2*dy + dx);
    # tile_ch[i] = source channel of tiles[i]
    tiles = []
    tile_ch = []
    for c in range(ch):
        # Mosaic has no direct u8→f32 cast; widen through int32. The
        # intermediate crop rows hold raw uint8 values — exact in bf16.
        img = (img_ref[c].astype(jnp.int32).astype(jnp.float32)
               .astype(jnp.bfloat16))
        rows = [
            jnp.dot(a_y, img, preferred_element_type=jnp.float32)
            .astype(jnp.bfloat16)
            for a_y in a_ys
        ]
        for r in rows:
            for a_x in a_xs:
                tile = jnp.dot(r, a_x, preferred_element_type=jnp.float32)
                # one FMA folds /255, per-image brightness, and (when
                # there is no jitter tail) the (x - mean)/std per channel
                tiles.append(tile * scale_ref[b, c] + bias_ref[b, c])
                tile_ch.append(c)

    n_phase = len(a_ys) * len(a_xs)  # 4 for s2d, 1 otherwise

    if fc_ref is not None:
        # The jitter tail is elementwise VPU work over the cropped tile.
        # When the kernel emits bf16 anyway (production), run the tail in
        # bf16 — 2x the VPU rate — with the mean still accumulated in
        # f32; the extra rounding is within the bf16 output's own
        # resolution. The f32 output path keeps a full-precision tail as
        # the reference.
        tdt = out_ref.dtype if out_ref.dtype == jnp.bfloat16 else jnp.float32

        # contrast: (x - mean)·f + mean over the whole cropped image.
        # Padding lanes hold exact zeros here (bias is 0 when the tail is
        # on), so the full-tile sum equals the T×T crop sum — and in s2d
        # the 4 phases of all channels together cover the same crop.
        acc = tiles[0]
        for tt in tiles[1:]:
            acc = acc + tt
        m = (jnp.sum(acc, dtype=jnp.float32)
             * (1.0 / (ch * t * t))).astype(tdt)
        tiles = [tt.astype(tdt) for tt in tiles]
        fcv = fc_ref[b].astype(tdt)
        tiles = [(tt - m) * fcv + m for tt in tiles]
        # saturation: Rec.601 luma mix — per pixel, i.e. per s2d phase
        lw = [jnp.asarray(w, tdt) for w in (0.299, 0.587, 0.114)]
        fsv = fs_ref[b].astype(tdt)
        for q in range(n_phase):
            gray = (lw[0] * tiles[q]
                    + lw[1] * tiles[n_phase + q]
                    + lw[2] * tiles[2 * n_phase + q])
            for c in range(3):
                i = c * n_phase + q
                tiles[i] = (tiles[i] - gray) * fsv + gray
        one = jnp.asarray(1.0, tdt)
        tiles = [jnp.clip(tt, jnp.zeros_like(one), one) for tt in tiles]
        tiles = [
            tt * ps_ref[b, c].astype(tdt) + pb_ref[b, c].astype(tdt)
            for c, tt in zip(tile_ch, tiles)
        ]

    for i, tt in enumerate(tiles):
        # cast at the store (bf16 output halves the kernel's HBM write
        # and every downstream read)
        out_ref[i] = tt.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=(
    "image_size", "interpret", "out_dtype", "space_to_depth"))
def fused_preprocess_planar(
    pixels: jnp.ndarray,
    offsets: jnp.ndarray,
    flips: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    rows: jnp.ndarray | None = None,
    contrast: jnp.ndarray | None = None,
    saturation: jnp.ndarray | None = None,
    post_scale: jnp.ndarray | None = None,
    post_bias: jnp.ndarray | None = None,
    *,
    image_size: int = 224,
    interpret: bool = False,
    out_dtype=jnp.float32,
    space_to_depth: bool = False,
) -> jnp.ndarray:
    """[B, C, S, S] uint8 → [B, C, T, T] ``out_dtype``, fused on-device
    (``space_to_depth``: → [B, 4C, T/2, T/2] in the s2d stem layout,
    channel index c*4 + 2*dy + dx — same MXU cost, emitted at the store).

    offsets: [B, 2] int32 top-left crops; flips: [B] int32; scale/bias:
    [B, C] float32 per-image/channel affine (e.g. scale=1/255/std,
    bias=-mean/std, with brightness jitter folded into scale).
    ``out_dtype=bfloat16`` matches the model compute dtype so the cast
    that the conv stack would do anyway happens at the kernel's store.

    ``rows`` ([B] int32) fuses the batch gather into the kernel: pixels
    may be the WHOLE device arena [N, C, S, S] and the grid-step DMA
    fetches plane ``rows[i]`` directly (scalar-prefetch block index) —
    the materialized ``jnp.take`` batch copy disappears.

    ``contrast``/``saturation`` ([B] f32 jitter factors) with
    ``post_scale``/``post_bias`` ([B, C] f32, the post-clip normalize)
    run the whole color-jitter tail in-kernel (all four together).
    """
    ch, s = pixels.shape[1], pixels.shape[2]
    b = offsets.shape[0]
    if rows is None:
        rows = jnp.arange(b, dtype=jnp.int32)
    if b > _MAX_KERNEL_BATCH:
        # Mosaic's register allocator spills (compile error) somewhere
        # past 256 images per call (docs/PERF.md, B=512). Batch shape is
        # only the grid size, so split into proven-size calls; pixels may
        # be the shared arena (rows-gather) and passes through whole.
        outs = []
        for lo in range(0, b, _MAX_KERNEL_BATCH):
            hi = min(lo + _MAX_KERNEL_BATCH, b)
            outs.append(fused_preprocess_planar(
                pixels,
                offsets[lo:hi], flips[lo:hi], scale[lo:hi], bias[lo:hi],
                rows[lo:hi],
                None if contrast is None else contrast[lo:hi],
                None if saturation is None else saturation[lo:hi],
                None if post_scale is None else post_scale[lo:hi],
                None if post_bias is None else post_bias[lo:hi],
                image_size=image_size, interpret=interpret,
                out_dtype=out_dtype, space_to_depth=space_to_depth,
            ))
        return jnp.concatenate(outs, axis=0)
    tail = contrast is not None
    t = image_size
    if space_to_depth:
        if t % 2:
            raise ValueError(f"space_to_depth needs even crop, got {t}")
        out_ch, out_h = 4 * ch, t // 2
    else:
        out_ch, out_h = ch, t
    t_lanes = -(-out_h // 128) * 128  # output lane dim must be 128-tiled
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9 if tail else 5,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, ch, s, s),
                lambda i, *sref: (sref[-1][i], 0, 0, 0),  # rows is last
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, out_ch, out_h, t_lanes), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    if tail:
        def kernel(offs, fl, sc, bi, fc, fs, ps, pb, rws, img, out):
            _kernel_body(offs, fl, sc, bi, img.at[0], out.at[0],
                         fc, fs, ps, pb, s2d=space_to_depth)

        operands = (offsets, flips, scale, bias, contrast, saturation,
                    post_scale, post_bias, rows, pixels)
    else:
        def kernel(offs, fl, sc, bi, rws, img, out):
            _kernel_body(offs, fl, sc, bi, img.at[0], out.at[0],
                         s2d=space_to_depth)

        operands = (offsets, flips, scale, bias, rows, pixels)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_ch, out_h, t_lanes),
                                       out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*operands)
    return out[:, :, :, :out_h]


def preprocess_planar_batch(
    pixels: jnp.ndarray,
    key: jax.Array | None,
    *,
    image_size: int = 224,
    train: bool = False,
    augment=None,
    normalize_imagenet: bool = False,
    out_dtype=None,
    rows: jnp.ndarray | None = None,
    space_to_depth: bool = False,
    input_affine: tuple | None = None,
) -> jnp.ndarray:
    """High-level wrapper: derives crop offsets + flips (+ jitter factors)
    from ``key``, builds the per-image affine, runs the kernel, and
    returns NHWC float32 for the conv stack. With ``space_to_depth`` the
    kernel path emits the s2d stem layout ([B, T/2, T/2, 4C] NHWC, for
    models with ``stem="s2d"``); the jnp fallback paths keep emitting
    [B, T, T, C] and the model applies the transform itself. Cases whose reference
    semantics are a RESIZE rather than a crop (eval, random_crop=False,
    or source < target, each with source != target) run the jnp
    reference path instead — geometry parity over kernel coverage.

    Augmentation semantics match ops.preprocess.preprocess_batch (same
    distributions; the PRNG streams differ bitwise between the two
    backends): brightness folds into the kernel's per-image scale;
    contrast/saturation need cross-channel stats so they run as one
    fused elementwise pass over the small cropped tile, followed by the
    [0,1] clip and the optional ImageNet normalize.
    """
    ch, s = pixels.shape[1], pixels.shape[2]
    b = rows.shape[0] if rows is not None else pixels.shape[0]
    t = image_size
    augmenting = bool(
        train and key is not None and augment is not None
    )
    # The kernel implements CROP geometry. The jnp reference path
    # (ops.preprocess.preprocess_batch) RESIZES whenever it is not
    # random-cropping — eval, random_crop=False, or source smaller than
    # target. Those cases must not silently train/eval on different
    # geometry, so they defer to the reference implementation (same-size
    # sources are exempt: crop == resize there).
    kernel_crop_ok = s == t or (
        augmenting and augment.random_crop and s > t
    )
    if not kernel_crop_ok:
        from skin_image_analysis_tpu.ops.preprocess import preprocess_batch

        if rows is not None:
            pixels = jnp.take(pixels, rows, axis=0)
        out = preprocess_batch(
            jnp.transpose(pixels, (0, 2, 3, 1)), key,
            image_size=t, train=train, augment=augment,
            normalize_imagenet=normalize_imagenet,
            input_affine=input_affine,
        )
        return out if out_dtype is None else out.astype(out_dtype)
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

    if space_to_depth and (t % 2 or ch != 3):
        # odd crop cannot s2d; non-RGB would confuse the XLA jitter
        # fallback's channel indexing — the model transforms instead
        space_to_depth = False
    out_h = t // 2 if space_to_depth else t
    odt = jnp.dtype(out_dtype) if out_dtype is not None else jnp.float32
    if odt == jnp.bfloat16 and out_h % 16:
        odt = jnp.float32  # bf16 sublane tiling needs out_h % 16 == 0

    from skin_image_analysis_tpu.ops.preprocess import (
        IMAGENET_MEAN, IMAGENET_STD, normalize_affine,
    )

    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    # unify the post-clip transform: normalize_imagenet and input_affine
    # are both a per-channel (post_scale, post_bias) pair (exclusive;
    # ops.preprocess.preprocess_batch owns the error)
    input_affine = normalize_affine(input_affine)
    if normalize_imagenet:
        post = (1.0 / std, -mean / std)
    elif input_affine is not None:
        post = (jnp.asarray(input_affine[0], jnp.float32),
                jnp.asarray(input_affine[1], jnp.float32))
    else:
        post = None

    if jitter_tail and ch == 3:
        # full color-jitter tail in-kernel (same op order as
        # ops.preprocess._color_jitter: brightness→contrast→saturation→
        # clip→normalize). Disabled factors pass 1.0 (identity up to one
        # float rounding).
        if augment.contrast > 0:
            fc = jax.random.uniform(
                kc, (b,), minval=1 - augment.contrast,
                maxval=1 + augment.contrast,
            )
        else:
            fc = jnp.ones((b,), jnp.float32)
        if augment.saturation > 0:
            fs = jax.random.uniform(
                ks, (b,), minval=1 - augment.saturation,
                maxval=1 + augment.saturation,
            )
        else:
            fs = jnp.ones((b,), jnp.float32)
        if post is not None:
            ps = jnp.broadcast_to(post[0], (b, ch))
            pb = jnp.broadcast_to(post[1], (b, ch))
        else:
            ps = jnp.ones((b, ch), jnp.float32)
            pb = jnp.zeros((b, ch), jnp.float32)
        out = fused_preprocess_planar(
            pixels, offsets, flips, scale, bias, rows, fc, fs, ps, pb,
            image_size=t, interpret=interpret, out_dtype=odt,
            space_to_depth=space_to_depth,
        )
        return jnp.transpose(out, (0, 2, 3, 1))  # NCHW → NHWC

    if post is not None and not jitter_tail:
        scale = scale * post[0]
        bias = bias * post[0] + post[1]

    out = fused_preprocess_planar(
        pixels, offsets, flips, scale, bias, rows, image_size=t,
        interpret=interpret, out_dtype=odt,
        space_to_depth=space_to_depth,
    )
    x = jnp.transpose(out, (0, 2, 3, 1))  # NCHW → NHWC for the convs

    if jitter_tail:  # non-RGB fallback: jitter in XLA over the crop
        if augment.contrast > 0:
            f = jax.random.uniform(
                kc, (b, 1, 1, 1), minval=1 - augment.contrast,
                maxval=1 + augment.contrast,
            ).astype(x.dtype)
            m = jnp.mean(
                x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32
            ).astype(x.dtype)
            x = (x - m) * f + m
        if augment.saturation > 0:
            f = jax.random.uniform(
                ks, (b, 1, 1, 1), minval=1 - augment.saturation,
                maxval=1 + augment.saturation,
            ).astype(x.dtype)
            gray = (0.299 * x[..., 0:1] + 0.587 * x[..., 1:2]
                    + 0.114 * x[..., 2:3])
            x = (x - gray) * f + gray
        x = jnp.clip(x, 0.0, 1.0)
        if post is not None:
            x = x * post[0].astype(x.dtype) + post[1].astype(x.dtype)
    return x
