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

    H and W must be even (the model family halves 224 -> 28 exactly,
    tone_bias_model.py:77-97).
    """
    y, _ = _relu_pool_fwd_impl(x)
    return y


def _relu_pool_fwd_impl(x):
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
    b, h, w, c = in_shape
    # position grid 2*dy + dx over the window axes; route g to the saved
    # argmax (selector 4 = ReLU-dead window -> zero gradient)
    gb = g[:, :, None, :, None, :]
    selb = sel[:, :, None, :, None, :]
    dy = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 2, 1, 1, 1), 2)
    dxp = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, 1, 1, 2, 1), 4)
    pos = 2 * dy + dxp
    dxr = jnp.where(selb == pos, gb, jnp.zeros_like(gb))
    return (jnp.broadcast_to(dxr, (b, h // 2, 2, w // 2, 2, c))
            .reshape(in_shape),)


relu_max_pool_2x2.defvjp(_relu_pool_fwd, _relu_pool_bwd)
