"""Attribution visualization — the Captum-style triptych.

Renders original / heat-map / blended-heat-map panels per image with the
reference's custom white→black colormap (tone_bias_explain.py:150-153,
:168-175), via matplotlib only.
"""

from __future__ import annotations

import numpy as np


def _attr_to_heat(attribution: np.ndarray) -> np.ndarray:
    """[H,W,C] signed attribution → [H,W] magnitude normalized to [0,1]
    with outlier-robust scaling (Captum normalizes at the 98th pct)."""
    heat = np.abs(attribution).sum(axis=-1)
    scale = np.percentile(heat, 98)
    return np.clip(heat / max(scale, 1e-12), 0.0, 1.0)


def visualize_attribution_triptych(
    image: np.ndarray,
    attribution: np.ndarray,
    title: str = "",
    save_path: str | None = None,
):
    """original | heat_map | blended_heat_map (reference layout,
    tone_bias_explain.py:168-175). Returns the matplotlib figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import LinearSegmentedColormap

    # white → black, as in the reference's custom cmap (:150-153)
    cmap = LinearSegmentedColormap.from_list(
        "white_black", [(1, 1, 1), (0, 0, 0)], N=256
    )

    heat = _attr_to_heat(np.asarray(attribution))
    image = np.clip(np.asarray(image), 0.0, 1.0)

    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].imshow(image)
    axes[0].set_title("Original")
    im = axes[1].imshow(heat, cmap=cmap)
    axes[1].set_title("Attribution")
    fig.colorbar(im, ax=axes[1], fraction=0.046)
    axes[2].imshow(image)
    axes[2].imshow(heat, cmap="jet", alpha=0.5)
    axes[2].set_title("Blended")
    for ax in axes:
        ax.axis("off")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def visualize_predictions_grid(
    images: np.ndarray,
    pred_names: list[str],
    true_names: list[str],
    n_images: int = 6,
    save_path: str | None = None,
):
    """Grid of images titled ``predicted: X``, colored by correctness —
    the reference's visualize_model helper (tone_bias_test.py:69-96)."""
    import math

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(n_images, len(images))
    cols = min(n, 3)
    rows = math.ceil(n / cols)
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i >= n:
            continue
        ax.imshow(np.clip(images[i], 0, 1))
        ok = pred_names[i] == true_names[i]
        ax.set_title(
            f"predicted: {pred_names[i]}\nactual: {true_names[i]}",
            color="green" if ok else "red", fontsize=10,
        )
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig
