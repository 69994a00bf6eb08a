"""Occlusion sensitivity maps.

Captum's ``Occlusion`` is imported (unused) by the reference explain
module (tone_bias_explain.py:28-31); here it is a first-class method:
slide a gray patch over the image and measure the drop in the target
log-probability. TPU-native shape: all patch positions for the whole
batch evaluate as ONE vmapped forward over the occluded variants —
no Python sliding-window loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.jit, static_argnames=("apply_fn", "patch_size", "stride")
)
def occlusion_map(
    apply_fn,
    params,
    x: jnp.ndarray,
    target: jnp.ndarray,
    patch_size: int = 16,
    stride: int = 8,
    fill: float = 0.5,
) -> jnp.ndarray:
    """[B,H,W,C] images → [B, ny, nx] sensitivity (score drop per patch
    position; larger = more important region)."""
    b, h, w, c = x.shape
    ys = jnp.arange(0, h - patch_size + 1, stride)
    xs = jnp.arange(0, w - patch_size + 1, stride)

    def score(imgs):
        from skin_image_analysis_tpu.explain.attribution import _as_variables

        log_probs = apply_fn(_as_variables(params), imgs, train=False)
        return jnp.take_along_axis(log_probs, target[:, None], axis=-1)[:, 0]

    base = score(x)

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def occlude_and_score(y0, x0):
        mask = (
            (row_idx >= y0) & (row_idx < y0 + patch_size)
            & (col_idx >= x0) & (col_idx < x0 + patch_size)
        )[None, :, :, None]
        occluded = jnp.where(mask, jnp.asarray(fill, x.dtype), x)
        return base - score(occluded)  # [B]

    # vmap over the patch grid: [ny, nx, B]
    grid = jax.vmap(
        lambda y0: jax.vmap(lambda x0: occlude_and_score(y0, x0))(xs)
    )(ys)
    return jnp.transpose(grid, (2, 0, 1))
