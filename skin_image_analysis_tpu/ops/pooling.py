"""TPU-fast 2x2 max pooling with a custom VJP.

XLA lowers max-pool gradients to SelectAndScatter, which is notoriously
slow on TPU (serialized window scans). For the non-overlapping 2x2/stride-2
pools this model family uses (tone_bias_model.py:77-97), both directions
are pure reshapes + elementwise ops:

- forward: reshape [B, H/2, 2, W/2, 2, C] → max over the two window axes
  (VPU reduction, no windows);
- backward: broadcast the pooled max and the cotangent back to [B, H, W, C]
  and mask where the input equals the max — one fused elementwise kernel.

Tie semantics: equal maxima within a window each receive the full
cotangent (the standard equality-mask subgradient). ReLU zeros make ties
possible; that subgradient choice is valid and matches what fused
implementations in other frameworks do. Exact tied positions are the only
divergence from SelectAndScatter (which picks one winner).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pool_reshape(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c)


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/2, W/2, C]; H and W must be even (odd trailing
    rows/cols are cropped first, matching nn.max_pool VALID padding)."""
    x = _crop_even(x)
    return _pool_reshape(x).max(axis=(2, 4))


def _crop_even(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x[:, : h - (h % 2), : w - (w % 2), :]


def _fwd(x):
    xc = _crop_even(x)
    out = _pool_reshape(xc).max(axis=(2, 4))
    return out, (x.shape, xc, out)


def _bwd(residuals, g):
    in_shape, xc, out = residuals
    b, h, w, c = xc.shape
    up_out = jnp.broadcast_to(
        out[:, :, None, :, None, :], (b, h // 2, 2, w // 2, 2, c)
    ).reshape(xc.shape)
    up_g = jnp.broadcast_to(
        g[:, :, None, :, None, :], (b, h // 2, 2, w // 2, 2, c)
    ).reshape(xc.shape)
    dx = jnp.where(xc == up_out, up_g, jnp.zeros_like(up_g))
    if xc.shape != in_shape:  # padded odd edge got cropped: zero-grad there
        full = jnp.zeros(in_shape, dx.dtype)
        dx = full.at[:, : xc.shape[1], : xc.shape[2], :].set(dx)
    return (dx,)


max_pool_2x2.defvjp(_fwd, _bwd)


@jax.custom_vjp
def max_pool_2x2_hybrid(x: jnp.ndarray) -> jnp.ndarray:
    """reduce_window forward (XLA's fast path) + elementwise equality-mask
    backward (replacing SelectAndScatter). Same tie semantics as
    :func:`max_pool_2x2`."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _hfwd(x):
    out = max_pool_2x2_hybrid(x)
    return out, (x, out)


def _hbwd(residuals, g):
    x, out = residuals
    xc = _crop_even(x)
    b, h, w, c = xc.shape
    up_out = jnp.broadcast_to(
        out[:, :, None, :, None, :], (b, h // 2, 2, w // 2, 2, c)
    ).reshape(xc.shape)
    up_g = jnp.broadcast_to(
        g[:, :, None, :, None, :], (b, h // 2, 2, w // 2, 2, c)
    ).reshape(xc.shape)
    dx = jnp.where(xc == up_out, up_g, jnp.zeros_like(up_g))
    if xc.shape != x.shape:
        full = jnp.zeros(x.shape, dx.dtype)
        dx = full.at[:, : xc.shape[1], : xc.shape[2], :].set(dx)
    return (dx,)


max_pool_2x2_hybrid.defvjp(_hfwd, _hbwd)


@jax.custom_vjp
def relu_max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Fused ReLU + 2x2/stride-2 max-pool with a selector-saving VJP.

    ``max(relu(window)) == relu(max(window))`` (ReLU is monotone), so the
    fused forward pools the raw pre-activation and clamps once. The VJP
    saves only a **uint8 selector** per pooled element (argmax position
    0-3, or 4 = "window max ≤ 0, no gradient"): the backward reads the
    selector (u8) + cotangent and writes dx — it never re-reads the
    full-resolution activation. Per perf attribution (docs/PERF.md) the
    stock path (SelectAndScatter, or an equality-mask VJP that re-reads
    the activation) costs ~3x more HBM traffic and dominated the train
    step's backward.

    Tie semantics: first maximal position in (0,0),(0,1),(1,0),(1,1)
    order wins — the torch MaxPool2d convention. Ties among *positive*
    equal values are the only divergence from the equality-mask
    subgradient, and they are measure-zero for conv outputs.

    Odd trailing rows/cols are cropped (nn.max_pool VALID semantics —
    the HPO search space pools 224 down to 7, tone_bias_optuna.py:138).
    """
    y, _ = _relu_pool_fwd_impl(x)
    return y


def _relu_pool_fwd_impl(x):
    x = _crop_even(x)
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
    a = xr[:, :, 0, :, 0, :]
    bb = xr[:, :, 0, :, 1, :]
    cc = xr[:, :, 1, :, 0, :]
    d = xr[:, :, 1, :, 1, :]
    m = jnp.maximum(jnp.maximum(a, bb), jnp.maximum(cc, d))
    sel = jnp.where(
        m == a, jnp.uint8(0),
        jnp.where(m == bb, jnp.uint8(1),
                  jnp.where(m == cc, jnp.uint8(2), jnp.uint8(3))),
    )
    sel = jnp.where(m > 0, sel, jnp.uint8(4))
    y = jnp.maximum(m, jnp.zeros_like(m))
    return y, sel


def _relu_pool_fwd(x):
    y, sel = _relu_pool_fwd_impl(x)
    return y, (sel, x.shape)


def _relu_pool_bwd(residuals, g):
    sel, in_shape = residuals
    b = in_shape[0]
    c = in_shape[3]
    he, we = in_shape[1] - in_shape[1] % 2, in_shape[2] - in_shape[2] % 2
    # position grid 2*dy + dx over the window axes; route g to the saved
    # argmax (selector 4 = ReLU-dead window -> zero gradient)
    gb = g[:, :, None, :, None, :]
    selb = sel[:, :, None, :, None, :]
    dy = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 2, 1, 1, 1), 2)
    dxp = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 1, 1, 2, 1), 4)
    pos = 2 * dy + dxp
    dxr = jnp.where(selb == pos, gb, jnp.zeros_like(gb))
    dx = (jnp.broadcast_to(dxr, (b, he // 2, 2, we // 2, 2, c))
          .reshape(b, he, we, c))
    # NOTE (measured, do not "fix"): XLA materializes the g and sel
    # broadcasts to window shape separately and fuses the select into the
    # consumer convs' operand fusions. That looks like 1.5x the minimal
    # HBM bytes (tools/hlo_dump.py), but forcing a single fused expansion
    # with lax.optimization_barrier measured +5.3 ms on the production
    # backward (docs/PERF.md) — the broadcasts are cheap replications and
    # the barrier serializes what the scheduler was overlapping.
    if (he, we) != (in_shape[1], in_shape[2]):
        # cropped odd edge: zero gradient there (VALID pool never saw it)
        full = jnp.zeros(in_shape, dx.dtype)
        dx = full.at[:, :he, :we, :].set(dx)
    return (dx,)


relu_max_pool_2x2.defvjp(_relu_pool_fwd, _relu_pool_bwd)


# ---------------------------------------------------------------------------
# Pool-phase packing: conv(k, stride 1) + relu + 2x2 pool as ONE stride-2
# conv with (k+1)^2 taps and 4x the output channels, + a channel-group max.
#
# For pooled output (i, j), the four pre-pool conv values live at
# (2i+di, 2j+dj), di,dj in {0,1}. A stride-2 conv whose kernel W' stacks
# the four phase-shifted copies of W along the output-channel axis
# (W'[a, b, c, p*Cout+co] = W[a-di_p, b-dj_p, c, co]) computes all four in
# one pass. Why this is the TPU-native shape (docs/PERF.md):
#
# - the first conv block (3->32 channels) runs at ~25% MXU lane
#   utilization; packed it is an 8x8/s2 conv with 128 output channels —
#   exactly the ResNet-stem shape XLA is tuned for, full lanes;
# - the max becomes a max over 4 *channel groups* at pooled resolution,
#   and its backward a channel-local mask — no spatial scatter, no
#   SelectAndScatter, no full-resolution gradient interleave;
# - the parameter stays the reference-shaped [k, k, Cin, Cout]; packing
#   is a weight-sized differentiable op inside the step.
# ---------------------------------------------------------------------------

_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def phase_pack_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[k, k, Cin, Cout] -> [k+1, k+1, Cin, 4*Cout] phase-stacked kernel."""
    k = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.zeros((k + 1, k + 1, cin, 4, cout), w.dtype)
    for p, (di, dj) in enumerate(_PHASES):
        wp = wp.at[di : di + k, dj : dj + k, :, p, :].add(w)
    return wp.reshape(k + 1, k + 1, cin, 4 * cout)


@jax.custom_vjp
def relu_max_phase(y4: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 4*C] phase-packed conv output -> [B, H, W, C]
    relu(max over the 4 phase groups); selector-saving VJP (u8 per
    output: winning phase 0-3, or 4 = max <= 0)."""
    y, _ = _phase_fwd_impl(y4)
    return y


def _phase_fwd_impl(y4):
    b, h, w, c4 = y4.shape
    c = c4 // 4
    yr = y4.reshape(b, h, w, 4, c)
    a0, a1, a2, a3 = yr[..., 0, :], yr[..., 1, :], yr[..., 2, :], yr[..., 3, :]
    m = jnp.maximum(jnp.maximum(a0, a1), jnp.maximum(a2, a3))
    sel = jnp.where(
        m == a0, jnp.uint8(0),
        jnp.where(m == a1, jnp.uint8(1),
                  jnp.where(m == a2, jnp.uint8(2), jnp.uint8(3))),
    )
    sel = jnp.where(m > 0, sel, jnp.uint8(4))
    return jnp.maximum(m, jnp.zeros_like(m)), sel


def _phase_fwd(y4):
    y, sel = _phase_fwd_impl(y4)
    return y, (sel, y4.shape)


def _phase_bwd(residuals, g):
    sel, shape = residuals
    b, h, w, c4 = shape
    c = c4 // 4
    phase = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 1, 4, 1), 3)
    dyr = jnp.where(sel[:, :, :, None, :] == phase, g[:, :, :, None, :],
                    jnp.zeros_like(g[:, :, :, None, :]))
    # (an optimization_barrier here to force one fused expand measured
    # SLOWER — see the note in _relu_pool_bwd)
    return (jnp.broadcast_to(dyr, (b, h, w, 4, c)).reshape(shape),)


relu_max_phase.defvjp(_phase_fwd, _phase_bwd)


# ---------------------------------------------------------------------------
# Space-to-depth stem: the SAME phase-packed conv block re-expressed over a
# 2x2 space-to-depth input layout — the canonical TPU counter-move to XLA's
# inefficient few-input-channel conv emitters (13-27% MFU at 3 input
# channels, docs/PERF.md §hlo_dump: the emitter pads the 3-channel
# contraction to a full sublane tile, wasting ~4/5 of the MXU).
#
# z[u, v, c*4 + 2dy+dx] = x[2u+dy, 2v+dx, c] turns the packed 8x8/s2 conv
# over [224², 3] into a 5x5/s1 conv over [112², 12]: 1.56x the nominal
# MACs (5·5·12 = 300 vs 8·8·3 = 192 per output) but a 4x denser
# contraction tile — a win whenever the emitter's 3-channel efficiency is
# below ~64%. Algebraically EXACT same outputs (same taps, re-indexed).
# ---------------------------------------------------------------------------


def space_to_depth_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with channel index
    c*4 + 2*dy + dx (c-major, then the 2x2 pixel phase)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, u, v, c, dy, dx
    return x.reshape(b, h // 2, w // 2, 4 * c)


def s2d_pack_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[k, k, Cin, Cout] -> [ks, ks, 4*Cin, 4*Cout] kernel computing the
    phase-packed conv (phase_pack_kernel) over the space-to-depth layout:
    tap (m, n) of z-channel c*4+2dy+dx equals packed tap
    (2m+dy+p0, 2n+dx+p0) of channel c, zero where out of the packed
    kernel's support. ks = (k + 3) // 2 for odd k (5 for the 7x7 stem)."""
    k = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    p0 = (k - 1) // 2
    mmin = -((p0 + 1) // 2)
    mmax = (k - p0) // 2
    ks = mmax - mmin + 1
    wp = phase_pack_kernel(w)  # [k+1, k+1, cin, 4*cout]
    out = jnp.zeros((ks, ks, 4 * cin, 4 * cout), w.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            q = 2 * dy + dx
            for mi, m in enumerate(range(mmin, mmax + 1)):
                a = 2 * m + dy + p0
                if not 0 <= a < k + 1:
                    continue
                for ni, n in enumerate(range(mmin, mmax + 1)):
                    b = 2 * n + dx + p0
                    if not 0 <= b < k + 1:
                        continue
                    # z-channels c*4+q for all c: stride-4 slice
                    out = out.at[mi, ni, q::4, :].set(wp[a, b])
    return out


def s2d_conv_block(
    z: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None
) -> jnp.ndarray:
    """The phase-packed conv block evaluated on a space-to-depth input:
    z [B, H/2, W/2, 4*Cin] (space_to_depth_nhwc layout), w the
    reference-shaped [k, k, Cin, Cout] parameter -> [B, H/2, W/2, Cout]
    pooled activations — same outputs as
    ``phase_packed_conv_block(x, w, bias)`` on the pre-s2d ``x``."""
    k = w.shape[0]
    p0 = (k - 1) // 2
    mmin = -((p0 + 1) // 2)
    mmax = (k - p0) // 2
    ws = s2d_pack_kernel(w)
    y4 = jax.lax.conv_general_dilated(
        z, ws,
        window_strides=(1, 1),
        padding=((-mmin, mmax), (-mmin, mmax)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=z.dtype,
    )
    if bias is not None:
        y4 = y4 + jnp.tile(bias, 4).astype(y4.dtype)
    return relu_max_phase(y4)


def phase_packed_conv_block(
    x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None
) -> jnp.ndarray:
    """The full fused block: x [B,H,W,Cin], w [k,k,Cin,Cout] (reference
    parameter shape) -> [B, H/2, W/2, Cout] pooled activations.

    Bit-equal forward to conv(SAME, stride 1) + ReLU + 2x2 max-pool for
    even H, W; backward routes through the phase selector (channel-local)
    and the strided conv's own dW/dx — no full-resolution pool scatter.
    """
    k = w.shape[0]
    p0 = (k - 1) // 2  # SAME padding of the stride-1 conv
    wp = phase_pack_kernel(w)
    y4 = jax.lax.conv_general_dilated(
        x, wp,
        window_strides=(2, 2),
        padding=((p0, p0 + 1), (p0, p0 + 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y4 = y4 + jnp.tile(bias, 4).astype(y4.dtype)
    return relu_max_phase(y4)
