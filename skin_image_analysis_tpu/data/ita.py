"""ITA (Individual Typology Angle) skin-tone estimation — on-device.

Capability parity with the reference's ITA preprocessor
(notebooks/ToneClassifier/ImagesToITAMatrices.py), which loops per image
in a 6-worker process pool doing scikit-image RGB→CIELab and np.vectorize'd
per-pixel masking. Here the whole batch is one fused jnp program — sRGB →
linear RGB → XYZ(D65) → Lab → mask → ITA runs on the VPU for every pixel
of every image at once, plus banding / modal-ITA reductions.

Formulas:
- Lab conversion: standard sRGB D65 (matches skimage.color.rgb2lab).
- Skin-gamut mask: 30 < L < 80, 0 < a < 20, 5 < b < 25 → else NaN
  (the ranges documented at ImagesToITAMatrices.py:62-77; note the
  reference's chained-comparison `30<L<80 == False` guards are Python
  precedence no-ops, so its mask only filtered NaNs — we apply the ranges
  as documented/intended).
- ITA = arctan((L - 50) / b) * 180 / π — the standard (Chardon/Del Bino)
  sign convention under which lighter skin → larger ITA, consistent with
  the Fitzpatrick banding below. (The reference negates the arctan at
  ImagesToITAMatrices.py:86, which inverts its own banding; we keep the
  literature orientation so band 1 = lightest.)
- Fitzpatrick banding at −30/10/28/41/55 (ImagesToITAMatrices.py:90-108):
  ITA ≥ 55 → I, 41–55 → II, 28–41 → III, 10–28 → IV, −30–10 → V,
  < −30 → VI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# sRGB (D65) → XYZ matrix
_RGB2XYZ = jnp.asarray(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ]
)
# D65 reference white
_WHITE = jnp.asarray([0.95047, 1.0, 1.08883])

FITZ_THRESHOLDS = (-30.0, 10.0, 28.0, 41.0, 55.0)


def srgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] sRGB in [0,1] → CIELab (matches skimage.color.rgb2lab)."""
    rgb = jnp.clip(rgb, 0.0, 1.0)
    linear = jnp.where(
        rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92
    )
    xyz = linear @ _RGB2XYZ.T
    t = xyz / _WHITE
    eps, kappa = 0.008856, 903.3
    f = jnp.where(t > eps, jnp.cbrt(t), (kappa * t + 16.0) / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


@jax.jit
def ita_matrix(rgb: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel ITA angles with non-skin pixels as NaN.

    rgb: [..., H, W, 3] float in [0,1] or uint8. Returns [..., H, W].
    """
    if rgb.dtype == jnp.uint8:
        rgb = rgb.astype(jnp.float32) / 255.0
    lab = srgb_to_lab(rgb)
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    skin = (
        (L > 30.0) & (L < 80.0)
        & (a > 0.0) & (a < 20.0)
        & (b > 5.0) & (b < 25.0)
    )
    ita = jnp.arctan2(L - 50.0, b) * (180.0 / jnp.pi)
    return jnp.where(skin, ita, jnp.nan)


@jax.jit
def ita_to_fitzpatrick(ita: jnp.ndarray) -> jnp.ndarray:
    """ITA angles → Fitzpatrick band 1..6 (int32); NaN → 0."""
    t = FITZ_THRESHOLDS
    band = jnp.where(
        ita >= t[4], 1,
        jnp.where(ita >= t[3], 2,
                  jnp.where(ita >= t[2], 3,
                            jnp.where(ita >= t[1], 4,
                                      jnp.where(ita >= t[0], 5, 6)))),
    ).astype(jnp.int32)
    return jnp.where(jnp.isnan(ita), 0, band)


@partial(jax.jit, static_argnames=("n_bins",))
def modal_ita(ita: jnp.ndarray, n_bins: int = 90,
              lo: float = -90.0, hi: float = 90.0) -> jnp.ndarray:
    """Per-image modal ITA: histogram-argmax over skin pixels.

    The single feature driving the reference's classical tone classifiers
    (colourmapclassifier.ipynb cells 19-24). ita: [B, H, W] → [B] float
    (bin centers; NaN when an image has no skin pixels).
    """
    batch = ita.reshape(ita.shape[0], -1)
    valid = ~jnp.isnan(batch)
    idx = jnp.clip(
        ((batch - lo) / (hi - lo) * n_bins).astype(jnp.int32), 0, n_bins - 1
    )
    one_hot = jax.nn.one_hot(
        jnp.where(valid, idx, n_bins), n_bins + 1, dtype=jnp.float32
    )
    hist = one_hot.sum(axis=1)[:, :n_bins]
    mode_bin = jnp.argmax(hist, axis=-1)
    centers = lo + (mode_bin + 0.5) * (hi - lo) / n_bins
    return jnp.where(valid.any(axis=1), centers, jnp.nan)


@jax.jit
def image_tone_binary(ita: jnp.ndarray) -> jnp.ndarray:
    """Modal ITA → binary tone: Fitz I/II (ITA >= 41) → 0 (light),
    else 1 (dark) — the ToneBinary mapping the reference derives from its
    fitzpatrick_converter (CNNTrialDataset.py:11-25)."""
    modal = modal_ita(ita)
    return jnp.where(modal >= FITZ_THRESHOLDS[3], 0, 1).astype(jnp.int32)


@jax.jit
def ita_input(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB batch → 2-channel ITA model input: stage 3 of the
    ToneClassifier plan (readme.md's "ITA-matrix CNN"; the reference only
    got as far as saving per-image ITA ``.npy`` matrices for it,
    ImagesToITAMatrices.py:129).

    rgb: [B, H, W, 3] float in [0,1] (or uint8) → [B, H, W, 2] float32:
    channel 0 = ITA/90 with non-skin pixels as 0 (the saved matrices'
    NaNs made finite for the MXU), channel 1 = the skin-gamut mask, so
    the CNN can tell "no skin" from "ITA≈0" instead of relying on a NaN
    sentinel. Fused on device inside the jitted step — no ``.npy``
    intermediates."""
    ita = ita_matrix(rgb)
    mask = ~jnp.isnan(ita)
    return jnp.stack(
        [jnp.where(mask, ita, 0.0) * (1.0 / 90.0),
         mask.astype(jnp.float32)],
        axis=-1,
    )


@jax.jit
def ita_pipeline(pixels_u8: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """uint8 [B,H,W,3] batch → {ita [B,H,W], fitzpatrick [B,H,W],
    modal_ita [B], tone [B]} — the full preprocessor as ONE fused device
    program (vs the reference's per-image ProcessPoolExecutor(6) loop,
    ImagesToITAMatrices.py:143-146)."""
    ita = ita_matrix(pixels_u8)
    modal = modal_ita(ita)
    return {
        "ita": ita,
        "fitzpatrick": ita_to_fitzpatrick(ita),
        "modal_ita": modal,
        "tone": jnp.where(modal >= FITZ_THRESHOLDS[3], 0, 1).astype(jnp.int32),
    }
