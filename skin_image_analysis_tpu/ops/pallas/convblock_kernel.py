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


_LANES = 128  # padded lane width of the pre-shifted phase planes


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """XLA-side phase split: [B, 3, H, W] -> [B, 12, H/2, 128] bf16 with
    plane index (c*2 + v_row)*2 + v_col — one fused transpose, done
    outside the kernel because Mosaic cannot lower stride-2 lane slices.
    Lanes are zero-padded to 128 (Mosaic tiled loads assume full tiles).
    """
    b, c, h, w = x.shape
    xs = x.astype(jnp.bfloat16).reshape(b, c, h // 2, 2, w // 2, 2)
    xs = jnp.transpose(xs, (0, 1, 3, 5, 2, 4)).reshape(
        b, c * 4, h // 2, w // 2
    )
    return jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (0, _LANES - w // 2)))


def _used_ubs(vb: int) -> list[int]:
    """The 4 horizontal plane-shifts that phase vb actually uses."""
    return sorted({_uv(bb - 3)[0] for bb in range(_KP) if _uv(bb - 3)[1] == vb})


_SLOTS: dict[tuple[int, int, int, int], int] = {}
for _c in range(_CIN):
    for _va in range(2):
        for _vb in range(2):
            for _ub in _used_ubs(_vb):
                _SLOTS[(_c, _va, _vb, _ub)] = len(_SLOTS)
_N_SLOTS = len(_SLOTS)  # 48


def _rows_padded(h2: int) -> int:
    # last chunk's aligned superset read spans [h2 - chunk, h2 + 8)
    return -(-(h2 + 8) // 8) * 8


def _fill_shifted_planes(xs_ref, planes_ref, h2: int):
    """Fill the VMEM scratch with the 48 pre-shifted phase planes
    ([rows_padded, 128] each): row-padded by the vertical halo,
    lane-shifted so output column j reads lane j directly. Once per
    image; the chunk loop then only does aligned dynamic reads."""
    rs = _rows_padded(h2)
    for (c, va, vb, ub), slot in _SLOTS.items():
        base = xs_ref[(c * 2 + va) * 2 + vb, :, :].astype(jnp.bfloat16)
        base = jnp.pad(base, ((_PAD, rs - h2 - _PAD), (0, 0)))
        if ub >= 0:
            shifted = jnp.pad(base[:, ub:], ((0, 0), (0, ub)))
        else:
            shifted = jnp.pad(base[:, :ub], ((0, 0), (-ub, 0)))
        planes_ref[slot, :, :] = shifted


def _patch_rows_from_scratch(planes_ref, r8, chunk: int, dtype):
    """P [192, chunk*128] for output rows [r8, r8+chunk) (r8 8-aligned,
    dynamic): one aligned superset read per (c,va,vb,ub) slot, then 4
    static row-slices per superset — tile-aligned flattens only."""
    supersets = {}
    for key, slot in _SLOTS.items():
        supersets[key] = planes_ref[slot, pl.ds(r8, chunk + 8), :]
    cols = []
    for (c, va, vb, ua, ub) in _PLAN:
        sup = supersets[(c, va, vb, ub)]
        r = _PAD + ua
        slab = sup[r : r + chunk, :]
        cols.append(slab.reshape(1, chunk * _LANES))
    return jnp.concatenate(cols, axis=0).astype(dtype)


def _patch_rows(planes, r0: int, rows: int, dtype):
    """P [192, rows*128]: contraction row k = full-lane row slab of its
    pre-shifted phase plane (tile-aligned flatten)."""
    cols = []
    for (c, va, vb, ua, ub) in _PLAN:
        r = r0 + _PAD + ua
        slab = planes[(c, va, vb, ub)][r : r + rows, :]
        cols.append(slab.reshape(1, rows * _LANES))
    return jnp.concatenate(cols, axis=0).astype(dtype)


def _fwd_kernel(wp2_ref, bias_ref, xs_ref, out_ref, sel_ref, planes_ref,
                *, h2, w2, chunk):
    """Grid (B,): one image -> pooled [COUT, h2, 128] bf16 + sel u8
    (planar, lane-padded; lanes >= w2 are junk and sliced off in XLA).
    fori_loop over row chunks so VMEM buffers are reused (an unrolled
    loop blows the 16 MB scoped-vmem stack)."""
    _fill_shifted_planes(xs_ref.at[0], planes_ref, h2)
    wp2 = wp2_ref[:, :]
    bias = bias_ref[:, :]  # [PC, 1]

    def body(q, _):
        r8 = pl.multiple_of(q * chunk, 8)
        p = _patch_rows_from_scratch(planes_ref, r8, chunk, jnp.bfloat16)
        acc = (
            jnp.dot(wp2, p, preferred_element_type=jnp.float32)
            + bias
        )  # [PC, chunk*128]
        a0 = acc[0 * _COUT : 1 * _COUT]
        a1 = acc[1 * _COUT : 2 * _COUT]
        a2 = acc[2 * _COUT : 3 * _COUT]
        a3 = acc[3 * _COUT : 4 * _COUT]
        m = jnp.maximum(jnp.maximum(a0, a1), jnp.maximum(a2, a3))
        # selector math stays in i32 (Mosaic cannot relayout f32-compare
        # masks into the (32,128) u8 tiling); one cast at the store
        sel = jnp.where(
            m == a0, jnp.int32(0),
            jnp.where(m == a1, jnp.int32(1),
                      jnp.where(m == a2, jnp.int32(2), jnp.int32(3))),
        )
        sel = jnp.where(m > 0, sel, jnp.int32(4))
        pooled = jnp.maximum(m, 0.0)
        # [COUT, chunk*128] -> [COUT, chunk, 128]: tile-aligned lane split
        out_ref[0, :, pl.ds(r8, chunk), :] = (
            pooled.reshape(_COUT, chunk, _LANES).astype(out_ref.dtype)
        )
        sel_ref[0, :, pl.ds(r8, chunk), :] = (
            sel.reshape(_COUT, chunk, _LANES).astype(jnp.uint8)
        )
        return 0

    jax.lax.fori_loop(0, h2 // chunk, body, 0)


def _dw_kernel(xs_ref, g_ref, sel_ref, dwp_ref, planes_ref, *, h2,
               w2, chunk):
    """Grid (B,): per-image dWp partial [PC, KDIM] f32 from (x, g, sel).

    g/sel arrive planar lane-padded [COUT, h2, 128] (junk lanes >= w2
    carry g == 0). dy4[pc, pos] = g[co, pos] * (sel[co, pos] == phase);
    dWp += dy4 @ P^T — the full-resolution dy4 never leaves VMEM.
    """
    _fill_shifted_planes(xs_ref.at[0], planes_ref, h2)

    def body(q, acc):
        r8 = pl.multiple_of(q * chunk, 8)
        p = _patch_rows_from_scratch(planes_ref, r8, chunk, jnp.bfloat16)
        g = g_ref[0, :, pl.ds(r8, chunk), :].reshape(
            _COUT, chunk * _LANES
        )
        sel = sel_ref[0, :, pl.ds(r8, chunk), :].astype(
            jnp.int32
        ).reshape(_COUT, chunk * _LANES)
        parts = []
        for phase in range(4):
            mask = (sel == phase).astype(g.dtype)
            parts.append(g * mask)
        dy4 = jnp.concatenate(parts, axis=0)
        return acc + jax.lax.dot_general(
            dy4, p,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, h2 // chunk, body, jnp.zeros((_PC, _KDIM), jnp.float32)
    )
    dwp_ref[0, :, :] = acc


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@partial(jax.jit, static_argnames=("chunk",))
def _fwd_call(xs, wp2, bias4, chunk=8):
    b, planes_n, h2, lanes = xs.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((_PC, _KDIM), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PC, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes_n, h2, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _COUT, h2, _LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _COUT, h2, _LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_N_SLOTS, _rows_padded(h2), _LANES), jnp.bfloat16),
        ],
    )
    return pl.pallas_call(
        partial(_fwd_kernel, h2=h2, w2=lanes, chunk=chunk),
        out_shape=[
            jax.ShapeDtypeStruct((b, _COUT, h2, _LANES), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, _COUT, h2, _LANES), jnp.uint8),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(wp2, bias4, xs)


@partial(jax.jit, static_argnames=("chunk",))
def _dw_call(xs, g, sel, chunk=8):
    b, planes_n, h2, lanes = xs.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, planes_n, h2, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _COUT, h2, _LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _COUT, h2, _LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _PC, _KDIM), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_N_SLOTS, _rows_padded(h2), _LANES), jnp.bfloat16),
        ],
    )
    [dwp] = pl.pallas_call(
        partial(_dw_kernel, h2=h2, w2=lanes, chunk=chunk),
        out_shape=[
            jax.ShapeDtypeStruct((b, _PC, _KDIM), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(xs, g, sel)
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
    xs = space_to_depth(x)
    wp2 = _pack_w(w)
    bias4 = jnp.tile(bias.astype(jnp.float32), 4).reshape(_PC, 1)
    chunk = _pick_chunk(h2)
    pooled, sel = _fwd_call(xs, wp2, bias4, chunk=chunk)  # noqa: E501
    # planar lane-padded -> NHWC (one fused slice+transpose in XLA)
    y = jnp.transpose(pooled[:, :, :, :w2], (0, 2, 3, 1))
    return y, sel


def _pick_chunk(h2: int) -> int:
    for c in (8, 7, 4, 2, 1):
        if h2 % c == 0:
            return c
    return 1


def _fused_fwd(x, w, bias):
    y, sel = _fused_fwd_impl(x, w, bias)
    return y, (space_to_depth(x), w, sel)


def _fused_bwd(residuals, g):
    xs, w, sel = residuals
    b = xs.shape[0]
    h2 = xs.shape[2]
    w2 = g.shape[2]  # NHWC cotangent carries the true pooled width
    # NHWC cotangent -> planar lane-padded (junk lanes get g == 0)
    gp = jnp.transpose(g.astype(jnp.bfloat16), (0, 3, 1, 2))
    gp = jnp.pad(gp, ((0, 0), (0, 0), (0, 0), (0, _LANES - w2)))
    chunk = _pick_chunk(h2)
    dwp = _dw_call(xs, gp, sel, chunk=chunk)  # [B, PC, KDIM]
    dw = _unpack_dw(jnp.sum(dwp, axis=0)).astype(w.dtype)

    # bias: dy4 sums over phases to g where the window is live (sel < 4)
    sel4 = jnp.transpose(sel[:, :, :, :w2], (0, 2, 3, 1))
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
    # dx dtype: the preprocess path feeds f32 planar frames
    dx = jnp.transpose(dx_nhwc, (0, 3, 1, 2)).astype(jnp.float32)
    return dx, dw, db


fused_phase_conv0.defvjp(_fused_fwd, _fused_bwd)
