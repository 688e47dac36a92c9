"""Figure/report utilities (host, matplotlib).

≙ common_utils/save.py:148-325 (segmentation panel grids saved per epoch /
per test run) and common_utils/vis.py. Matplotlib only, Agg backend.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def save_segmentation_panels(images: np.ndarray, gts: np.ndarray,
                             preds: np.ndarray, save_dir: str,
                             tag: str = "best", max_slices: int = 10,
                             file_name: str = "Seg_plots.png") -> Optional[str]:
    """Rows of (image, GT overlay, prediction overlay) panels
    (save.save_testing_images_results:286-325)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(len(images), max_slices)
    if n == 0:
        return None
    fig, axes = plt.subplots(n, 3, figsize=(9, 3 * n), squeeze=False)
    for i in range(n):
        axes[i][0].imshow(images[i], cmap="gray")
        axes[i][0].set_title("image")
        axes[i][1].imshow(images[i], cmap="gray")
        axes[i][1].imshow(np.ma.masked_equal(gts[i], 0), alpha=0.5,
                          interpolation="nearest")
        axes[i][1].set_title("ground truth")
        axes[i][2].imshow(images[i], cmap="gray")
        axes[i][2].imshow(np.ma.masked_equal(preds[i], 0), alpha=0.5,
                          interpolation="nearest")
        axes[i][2].set_title("prediction")
        for ax in axes[i]:
            ax.axis("off")
    out_dir = os.path.join(save_dir, str(tag))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, file_name)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def save_image_grid(images: Sequence[np.ndarray], path: str,
                    titles: Optional[Sequence[str]] = None,
                    cols: int = 4) -> str:
    """Generic image grid (save.py figure helpers :148-273)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < n:
            ax.imshow(images[i], cmap="gray")
            if titles is not None and i < len(titles):
                ax.set_title(titles[i], fontsize=8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path
