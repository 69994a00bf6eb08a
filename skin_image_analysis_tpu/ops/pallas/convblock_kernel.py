"""Pallas TPU kernel: fully-fused first ConvBlock (phase-packed).

The production model's first block — conv 7x7 / 3->32 / SAME + ReLU +
2x2 max-pool (tone_bias_model.py:77-97) — re-expressed as the
pool-phase-packed stride-2 conv (ops.pooling.phase_packed_conv_block)
and fused into ONE kernel that never materializes the packed conv output
``y4`` (822 MB per 256-batch) in HBM:

- forward emits only the pooled activations (bf16, NHWC-merged lanes)
  and the u8 phase selector;
- the weight-grad kernel contracts the selector-masked cotangent with
  the same on-the-fly patch rows and emits per-image [128, 192] partials
  (a few MB) — the full-resolution ``dy4`` never exists in HBM either;
- dx (needed only when differentiating wrt pixels, e.g. Integrated
  Gradients) is computed with a plain XLA transposed conv in the VJP —
  XLA dead-code-eliminates it for parameter-only training grads.

MXU shape: with the 4 pool phases stacked on output channels the matmul
is [128, 192] @ [192, 3136] per position chunk — full 128 lanes and a
192-deep contraction, vs the 25%-utilized 32-channel stride-1 conv
(docs/PERF.md). Patch rows are built from space-to-depth phase planes:
``x[2i+m, 2j+n] == xs[m%2, n%2][i + (m - m%2)//2, j + (n - n%2)//2]`` so
every one of the 192 rows is a plain shifted slab — no strided gathers
in the hot loop.

Layout: input is PLANAR [B, 3, H, W] (the Pallas preprocess kernel's
native output — chaining them skips the NCHW->NHWC transpose); H = W =
224 in production, any H = W divisible by 8 works.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K = 7          # reference kernel size (first conv)
_KP = _K + 1    # packed stride-2 kernel size
_CIN = 3
_COUT = 32
_PC = 4 * _COUT          # phase-packed channels
_KDIM = _KP * _KP * _CIN  # contraction depth = 192
_PAD = 2        # phase-plane halo: u offsets span [-2, 2]


def _uv(m: int) -> tuple[int, int]:
    """2i+m = 2(i+u)+v: phase v in {0,1} and plane shift u."""
    v = m % 2
    return (m - v) // 2, v


def _row_plan():
    """Static (c, v_a, v_b, u_a, u_b) per contraction row k=(a*8+b)*3+c."""
    plan = []
    for a in range(_KP):
        for b in range(_KP):
            for c in range(_CIN):
                ua, va = _uv(a - 3)
                ub, vb = _uv(b - 3)
                plan.append((c, va, vb, ua, ub))
    return plan


_PLAN = _row_plan()


def _build_phase_planes(x_ref, h2: int, w2: int, dtype):
    """[3, H, W] -> list of 12 padded phase planes [h2+2PAD, w2+2PAD]."""
    planes = []
    for c in range(_CIN):
        for va in range(2):
            for vb in range(2):
                plane = x_ref[c, va::2, vb::2].astype(dtype)
                planes.append(
                    jnp.pad(plane, ((_PAD, _PAD), (_PAD, _PAD)))
                )
    return planes


def _plane(planes, c, va, vb):
    return planes[(c * 2 + va) * 2 + vb]


def _patch_rows(planes, r0: int, rows: int, w2: int, dtype):
    """P [192, rows*w2]: contraction row k = shifted slab of its phase
    plane, flattened to lanes."""
    cols = []
    for (c, va, vb, ua, ub) in _PLAN:
        slab = jax.lax.dynamic_slice(
            _plane(planes, c, va, vb),
            (r0 + _PAD + ua, _PAD + ub),
            (rows, w2),
        )
        cols.append(slab.reshape(1, rows * w2))
    return jnp.concatenate(cols, axis=0).astype(dtype)


def _fwd_kernel(wp2_ref, bias_ref, x_ref, out_ref, sel_ref, *, h2, w2,
                chunk):
    """Grid (B,): one image -> pooled [h2, w2*COUT] bf16 + sel u8."""
    planes = _build_phase_planes(x_ref.at[0], h2, w2, jnp.bfloat16)
    wp2 = wp2_ref[:, :]
    bias = bias_ref[:, :]  # [PC, 1]
    for q in range(h2 // chunk):
        p = _patch_rows(planes, q * chunk, chunk, w2, jnp.bfloat16)
        acc = (
            jnp.dot(wp2, p, preferred_element_type=jnp.float32)
            + bias
        )  # [PC, chunk*w2]
        a0 = acc[0 * _COUT : 1 * _COUT]
        a1 = acc[1 * _COUT : 2 * _COUT]
        a2 = acc[2 * _COUT : 3 * _COUT]
        a3 = acc[3 * _COUT : 4 * _COUT]
        m = jnp.maximum(jnp.maximum(a0, a1), jnp.maximum(a2, a3))
        sel = jnp.where(
            m == a0, jnp.uint8(0),
            jnp.where(m == a1, jnp.uint8(1),
                      jnp.where(m == a2, jnp.uint8(2), jnp.uint8(3))),
        )
        sel = jnp.where(m > 0, sel, jnp.uint8(4))
        pooled = jnp.maximum(m, 0.0)
        # [COUT, chunk*w2] -> [chunk, w2*COUT] (NHWC-merged lanes)
        pooled = (
            pooled.reshape(_COUT, chunk, w2)
            .transpose(1, 2, 0)
            .reshape(chunk, w2 * _COUT)
        )
        sel = (
            sel.reshape(_COUT, chunk, w2)
            .transpose(1, 2, 0)
            .reshape(chunk, w2 * _COUT)
        )
        out_ref[0, q * chunk : (q + 1) * chunk, :] = pooled.astype(
            out_ref.dtype
        )
        sel_ref[0, q * chunk : (q + 1) * chunk, :] = sel


def _dw_kernel(x_ref, g_ref, sel_ref, dwp_ref, *, h2, w2, chunk):
    """Grid (B,): per-image dWp partial [PC, KDIM] f32 from (x, g, sel).

    dy4[pc, pos] = g[co, pos] * (sel[co, pos] == phase(pc)), built in
    VMEM per chunk; dWp += dy4 @ P^T.
    """
    planes = _build_phase_planes(x_ref.at[0], h2, w2, jnp.bfloat16)
    acc = jnp.zeros((_PC, _KDIM), jnp.float32)
    for q in range(h2 // chunk):
        p = _patch_rows(planes, q * chunk, chunk, w2, jnp.bfloat16)
        g = (
            g_ref[0, q * chunk : (q + 1) * chunk, :]
            .reshape(chunk, w2, _COUT)
            .transpose(2, 0, 1)
            .reshape(_COUT, chunk * w2)
            .astype(jnp.float32)
        )
        sel = (
            sel_ref[0, q * chunk : (q + 1) * chunk, :]
            .reshape(chunk, w2, _COUT)
            .transpose(2, 0, 1)
            .reshape(_COUT, chunk * w2)
        )
        parts = []
        for phase in range(4):
            parts.append(jnp.where(sel == phase, g, 0.0))
        dy4 = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            dy4, p,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dwp_ref[0, :, :] = acc


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@partial(jax.jit, static_argnames=("chunk",))
def _fwd_call(x, wp2, bias4, chunk=28):
    b, cin, h, w = x.shape
    h2, w2 = h // 2, w // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((_PC, _KDIM), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PC, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h2, w2 * _COUT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2, w2 * _COUT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        partial(_fwd_kernel, h2=h2, w2=w2, chunk=chunk),
        out_shape=[
            jax.ShapeDtypeStruct((b, h2, w2 * _COUT), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, h2, w2 * _COUT), jnp.uint8),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(wp2, bias4, x)


@partial(jax.jit, static_argnames=("chunk",))
def _dw_call(x, g, sel, chunk=28):
    b, cin, h, w = x.shape
    h2, w2 = h // 2, w // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, cin, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2, w2 * _COUT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2, w2 * _COUT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _PC, _KDIM), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    [dwp] = pl.pallas_call(
        partial(_dw_kernel, h2=h2, w2=w2, chunk=chunk),
        out_shape=[
            jax.ShapeDtypeStruct((b, _PC, _KDIM), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(x, g, sel)
    return dwp


def _pack_w(w: jnp.ndarray) -> jnp.ndarray:
    """[7,7,3,32] -> [PC, KDIM] with k=(a*8+b)*3+c and pc=p*32+co."""
    from skin_image_analysis_tpu.ops.pooling import phase_pack_kernel

    wp = phase_pack_kernel(w)  # [8, 8, 3, 128]
    return (
        wp.astype(jnp.bfloat16)
        .transpose(3, 0, 1, 2)
        .reshape(_PC, _KDIM)
    )


def _unpack_dw(dwp2: jnp.ndarray) -> jnp.ndarray:
    """[PC, KDIM] cotangent -> [7,7,3,32] (transpose of _pack_w +
    phase_pack_kernel's scatter-add)."""
    dwp = dwp2.reshape(_PC, _KP, _KP, _CIN).transpose(1, 2, 3, 0)
    dwp = dwp.reshape(_KP, _KP, _CIN, 4, _COUT)
    out = jnp.zeros((_K, _K, _CIN, _COUT), dwp.dtype)
    phases = ((0, 0), (0, 1), (1, 0), (1, 1))
    for p, (di, dj) in enumerate(phases):
        out = out + dwp[di : di + _K, dj : dj + _K, :, p, :]
    return out


@jax.custom_vjp
def fused_phase_conv0(x: jnp.ndarray, w: jnp.ndarray,
                      bias: jnp.ndarray) -> jnp.ndarray:
    """x planar [B, 3, H, W] float, w [7,7,3,32], bias [32] ->
    pooled [B, H/2, W/2, 32] bf16 — bit-equal to conv(SAME, s1) + ReLU +
    2x2 max-pool (up to bf16 accumulation of the MXU matmul)."""
    y, _ = _fused_fwd_impl(x, w, bias)
    return y


def _fused_fwd_impl(x, w, bias):
    b, _, h, w_dim = x.shape
    h2, w2 = h // 2, w_dim // 2
    wp2 = _pack_w(w)
    bias4 = jnp.tile(bias.astype(jnp.float32), 4).reshape(_PC, 1)
    chunk = _pick_chunk(h2)
    pooled, sel = _fwd_call(x, wp2, bias4, chunk=chunk)
    return pooled.reshape(b, h2, w2, _COUT), sel


def _pick_chunk(h2: int) -> int:
    for c in (28, 14, 8, 7, 4, 2, 1):
        if h2 % c == 0:
            return c
    return 1


def _fused_fwd(x, w, bias):
    y, sel = _fused_fwd_impl(x, w, bias)
    return y, (x, w, sel)


def _fused_bwd(residuals, g):
    x, w, sel = residuals
    b, _, h, w_dim = x.shape
    h2, w2 = h // 2, w_dim // 2
    gm = g.astype(jnp.bfloat16).reshape(b, h2, w2 * _COUT)
    chunk = _pick_chunk(h2)
    dwp = _dw_call(x, gm, sel, chunk=chunk)  # [B, PC, KDIM]
    dw = _unpack_dw(jnp.sum(dwp, axis=0)).astype(w.dtype)

    # bias: dy4 sums over phases to g where the window is live (sel < 4)
    sel4 = sel.reshape(b, h2, w2, _COUT)
    live = (sel4 != 4).astype(jnp.float32)
    db = jnp.sum(g.astype(jnp.float32) * live, axis=(0, 1, 2)).astype(
        jnp.float32
    )

    # dx: only demanded when differentiating wrt pixels (explain/IG);
    # XLA dead-code-eliminates this whole chain for parameter-only grads.
    phase = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 1, 4, 1), 3)
    dy4 = jnp.where(
        sel4[:, :, :, None, :] == phase,
        g[:, :, :, None, :].astype(jnp.float32),
        0.0,
    ).reshape(b, h2, w2, _PC)
    from skin_image_analysis_tpu.ops.pooling import phase_pack_kernel

    wp = phase_pack_kernel(w.astype(jnp.float32))
    # (4,4): conv_transpose pads the stride-dilated cotangent directly;
    # numerically verified exact against the packed conv's own autodiff
    dx_nhwc = jax.lax.conv_transpose(
        dy4, wp, strides=(2, 2),
        padding=((4, 4), (4, 4)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    dx = jnp.transpose(dx_nhwc, (0, 3, 1, 2)).astype(x.dtype)
    return dx, dw, db


fused_phase_conv0.defvjp(_fused_fwd, _fused_bwd)
