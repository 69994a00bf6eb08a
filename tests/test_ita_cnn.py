"""Stage-3 ITA-matrix CNN input mode + five-crop TTA eval.

The ToneClassifier plan's third stage (notebooks/ToneClassifier/readme.md)
is a CNN trained on the saved per-image ITA matrices; the reference only
got as far as producing the ``.npy`` files (ImagesToITAMatrices.py:129).
Here the transform is a fused on-device channel map (data.ita.ita_input)
inside the jitted step — no intermediates. Five-crop is the documented
test-time-augmentation experiment (CNNTrialDataset.py:61-65) as ONE
5x-batched forward.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from skin_image_analysis_tpu.data.ita import ita_input, ita_matrix
from skin_image_analysis_tpu.ops.preprocess import five_crop_batch


def _skin_patch(n=1, size=8):
    """Uniform patch inside the skin gamut (L~60, a~10, b~15)."""
    rgb = np.zeros((n, size, size, 3), np.float32)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 0.70, 0.52, 0.45
    return rgb


def test_ita_input_channels():
    skin = _skin_patch()
    out = np.asarray(ita_input(jnp.asarray(skin)))
    assert out.shape == (1, 8, 8, 2)
    # channel 1 = skin mask; the uniform skin patch is all-skin
    assert (out[..., 1] == 1.0).all()
    # channel 0 = ITA/90, matching ita_matrix exactly
    ita = np.asarray(ita_matrix(jnp.asarray(skin)))
    np.testing.assert_allclose(out[..., 0], ita / 90.0, atol=1e-6)

    # non-skin (pure green): mask 0, ITA channel 0 (finite, not NaN)
    green = np.zeros((1, 8, 8, 3), np.float32)
    green[..., 1] = 1.0
    out_g = np.asarray(ita_input(jnp.asarray(green)))
    assert (out_g[..., 1] == 0.0).all()
    assert (out_g[..., 0] == 0.0).all()
    assert np.isfinite(out_g).all()


def test_five_crop_batch_positions():
    b, h, w, size = 2, 6, 6, 4
    x = np.arange(b * h * w * 3, dtype=np.float32).reshape(b, h, w, 3)
    out = np.asarray(five_crop_batch(jnp.asarray(x), size))
    assert out.shape == (5 * b, size, size, 3)
    # torchvision FiveCrop order: TL, TR, BL, BR, center
    expect = [
        x[:, :4, :4], x[:, :4, 2:], x[:, 2:, :4], x[:, 2:, 2:],
        x[:, 1:5, 1:5],
    ]
    for i, e in enumerate(expect):
        np.testing.assert_array_equal(out[i * b:(i + 1) * b], e)


def test_five_crop_too_small_raises():
    with pytest.raises(ValueError, match="five_crop"):
        five_crop_batch(jnp.zeros((1, 3, 3, 3)), 4)


@pytest.fixture(scope="module")
def tone_root(tmp_path_factory):
    """Tiny tone-labelled cohort: light (high-L skin) vs dark (low-L)."""
    import csv

    from PIL import Image

    root = tmp_path_factory.mktemp("tone_ita")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(24):
        light = i % 2 == 0
        base = (215, 170, 145) if light else (120, 85, 70)
        img = np.clip(
            rng.integers(-10, 10, (32, 32, 3)) + np.asarray(base), 0, 255
        ).astype(np.uint8)
        isic_id = f"ISIC_{i:07d}"
        Image.fromarray(img).save(str(root / f"{isic_id}.jpg"))
        rows.append({"isic_id": isic_id,
                     "fitzpatrick_skin_type": "II" if light else "V"})
    with open(root / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["isic_id", "fitzpatrick_skin_type"])
        w.writeheader()
        w.writerows(rows)
    return str(root)


def test_train_tone_classifier_ita_mode(tone_root, tmp_path):
    import pandas as pd

    from skin_image_analysis_tpu.data.ingest import shuffle_split
    from skin_image_analysis_tpu.toneclassifier.trainer import (
        ToneTrainConfig,
        train_tone_classifier,
    )

    df = pd.read_csv(f"{tone_root}/metadata.csv")
    train_df, test_df = shuffle_split(df, ratio=0.7, seed=0)
    out = train_tone_classifier(
        train_df, test_df, tone_root,
        ToneTrainConfig(
            model_name="skin_cancer_list", image_size=16, canonical_size=32,
            batch_size=8, epochs=2, compute_dtype="float32",
            input_mode="ita", out_dir=str(tmp_path / "ita_runs"),
        ),
        verbose=False,
    )
    m = out["test_metrics"]
    assert np.isfinite(m["train_loss_mean"])
    assert 0.0 <= m["accuracy"] <= 1.0
    # the model really is a 2-channel net (init dummy honored in_channels)
    conv0 = out["state"].params["ConvBlock_0"]
    kernels = [v for k, v in conv0.items() if k.startswith("Conv")]
    kernel = (kernels[0]["kernel"] if kernels
              else conv0["kernel"])
    assert kernel.shape[2] in (2, 8)  # 2 raw or 8 after 2x2 s2d packing


def test_train_classifier_five_crop_eval(tone_root, tmp_path):
    import pandas as pd

    from skin_image_analysis_tpu.data.ingest import shuffle_split
    from skin_image_analysis_tpu.toneclassifier.trainer import (
        ToneTrainConfig,
        train_tone_classifier,
    )

    df = pd.read_csv(f"{tone_root}/metadata.csv")
    train_df, test_df = shuffle_split(df, ratio=0.7, seed=0)
    out = train_tone_classifier(
        train_df, test_df, tone_root,
        ToneTrainConfig(
            model_name="skin_cancer_list", image_size=16, canonical_size=32,
            batch_size=8, epochs=1, compute_dtype="float32",
            five_crop_eval=True, out_dir=str(tmp_path / "fc_runs"),
        ),
        verbose=False,
    )
    assert 0.0 <= out["test_metrics"]["accuracy"] <= 1.0


def test_five_crop_eval_requires_larger_canonical(tone_root, tmp_path):
    from skin_image_analysis_tpu.data.dataset import LesionTable
    from skin_image_analysis_tpu.train.classify import (
        ClassifyConfig,
        train_classifier,
    )
    import pandas as pd

    df = pd.read_csv(f"{tone_root}/metadata.csv")
    df["label"] = ["benign", "malignant"] * (len(df) // 2)
    table = LesionTable(df, tone_root, class_names=("benign", "malignant"),
                        label_column="label")
    with pytest.raises(ValueError, match="five_crop_eval"):
        train_classifier(
            table, table,
            ClassifyConfig(model_name="skin_cancer_list", image_size=32,
                           canonical_size=32, five_crop_eval=True,
                           compute_dtype="float32",
                           out_dir=str(tmp_path / "bad")),
        )
