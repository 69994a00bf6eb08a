"""ITA pipeline: Lab conversion vs known values, masking, banding, modal
reduction (reference: ImagesToITAMatrices.py, colourmapclassifier.ipynb)."""

import numpy as np
import pytest

import jax.numpy as jnp

from skin_image_analysis_tpu.data.ita import (
    image_tone_binary,
    ita_matrix,
    ita_pipeline,
    ita_to_fitzpatrick,
    modal_ita,
    srgb_to_lab,
)


def test_srgb_to_lab_known_values():
    # white → L=100, a=b=0; black → 0,0,0
    lab = np.asarray(srgb_to_lab(jnp.asarray([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])))
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.05)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.05)
    # mid gray 0.5 → L ≈ 53.39
    lab = np.asarray(srgb_to_lab(jnp.asarray([0.5, 0.5, 0.5])))
    assert lab[0] == pytest.approx(53.39, abs=0.1)
    assert abs(lab[1]) < 0.05 and abs(lab[2]) < 0.05


def test_srgb_to_lab_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    rgb = rng.random((8, 8, 3)).astype(np.float32)
    ours = np.asarray(srgb_to_lab(jnp.asarray(rgb)))
    ref = cv2.cvtColor(rgb, cv2.COLOR_RGB2Lab)
    np.testing.assert_allclose(ours, ref, atol=0.35)


def test_ita_matrix_mask_and_values():
    # A skin-like pixel: L≈60, a≈10, b≈15 region. sRGB ~ (0.75, 0.52, 0.42)
    skin = np.full((1, 4, 4, 3), [0.75, 0.52, 0.42], np.float32)
    ita = np.asarray(ita_matrix(jnp.asarray(skin)))
    assert np.isfinite(ita).all()
    # lighter pixel → higher ITA than darker pixel
    light = np.full((1, 2, 2, 3), [0.85, 0.62, 0.52], np.float32)
    dark = np.full((1, 2, 2, 3), [0.55, 0.35, 0.28], np.float32)
    ita_l = np.asarray(ita_matrix(jnp.asarray(light)))
    ita_d = np.asarray(ita_matrix(jnp.asarray(dark)))
    if np.isfinite(ita_l).any() and np.isfinite(ita_d).any():
        assert np.nanmean(ita_l) > np.nanmean(ita_d)
    # out-of-gamut (green) pixel → NaN
    green = np.full((1, 2, 2, 3), [0.0, 1.0, 0.0], np.float32)
    assert np.isnan(np.asarray(ita_matrix(jnp.asarray(green)))).all()


def test_ita_to_fitzpatrick_banding():
    ita = jnp.asarray([60.0, 50.0, 35.0, 20.0, 0.0, -40.0, jnp.nan])
    bands = np.asarray(ita_to_fitzpatrick(ita))
    np.testing.assert_array_equal(bands, [1, 2, 3, 4, 5, 6, 0])


def test_modal_ita():
    ita = np.full((1, 10, 10), np.nan, np.float32)
    ita[0, :5, :] = 50.0   # 50 pixels at 50°
    ita[0, 5:8, :] = 10.0  # 30 pixels at 10°
    modal = float(modal_ita(jnp.asarray(ita))[0])
    assert modal == pytest.approx(50.0, abs=1.1)
    # all-NaN image → NaN
    empty = np.full((1, 4, 4), np.nan, np.float32)
    assert np.isnan(float(modal_ita(jnp.asarray(empty))[0]))


def test_image_tone_binary():
    light = np.full((1, 4, 4), 50.0, np.float32)   # ITA 50 → Fitz II → light
    dark = np.full((1, 4, 4), 5.0, np.float32)     # ITA 5 → Fitz V → dark
    assert int(image_tone_binary(jnp.asarray(light))[0]) == 0
    assert int(image_tone_binary(jnp.asarray(dark))[0]) == 1


def test_ita_pipeline_uint8_batch():
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 255, (3, 8, 8, 3)).astype(np.uint8)
    out = ita_pipeline(jnp.asarray(batch))
    assert out["ita"].shape == (3, 8, 8)
    assert out["fitzpatrick"].shape == (3, 8, 8)
    assert out["modal_ita"].shape == (3,)
    assert out["tone"].shape == (3,)
