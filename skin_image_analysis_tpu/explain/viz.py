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
