"""Matplotlib figure helpers — DynamicFocus utility/plot_tools.py work-alikes.

Covers ``plt_imgshow`` (:29), ``plt_multi_imgshow`` (:55) and ``plt_show``
(:100) from /root/reference/DynamicFocus/utility/plot_tools.py.  Arrays are
numpy/jax (any array-like); [C, H, W] inputs are transposed to [H, W, C]
like the reference's ``permute(1, 2, 0)``, and single-channel/2-D images
get a colorbar.  The module forces the Agg backend so it is safe headless.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

__all__ = ["plt_imgshow", "plt_multi_imgshow", "plt_show"]


def plt_imgshow(img, title: str = "", ax=None):
    """Show one image on ax (created if None); returns the AxesImage."""
    fig = None
    if ax is None:
        fig, ax = plt.subplots(figsize=(8, 6))

    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3, 4) and img.shape[0] < img.shape[-1]:
        img = np.transpose(img, (1, 2, 0))
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]

    cax = ax.imshow(img)
    if title:
        ax.set_title(title)
    if img.ndim == 2 and fig is not None:
        fig.colorbar(cax, ax=ax)
    ax.grid(False)
    return cax


def plt_multi_imgshow(imgs: list, titles: list | None = None,
                      row_col: tuple[int, int] = (1, 1)):
    """Grid of images via plt_imgshow (plot_tools.plt_multi_imgshow:55-97).

    None entries leave their cell hidden, matching the reference. Returns
    the figure.
    """
    rows, cols = row_col
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 8, rows * 6))
    axes = axes.flatten() if isinstance(axes, np.ndarray) else [axes]
    for ax in axes:
        ax.grid(False)
        ax.set_visible(False)
    if titles is None:
        titles = [str(i) for i in range(len(imgs))]
    for i, (img, title) in enumerate(zip(imgs, titles)):
        if img is not None:
            axes[i].set_visible(True)
            cax = plt_imgshow(img, title, axes[i])
            arr = np.asarray(img)
            # per-cell colorbar for single-channel images, like the
            # reference's grid loop (plot_tools.py:81-84)
            if arr.ndim == 2 or (arr.ndim == 3 and 1 in (arr.shape[0], arr.shape[2])):
                fig.colorbar(cax, ax=axes[i])
    fig.tight_layout()
    return fig


def plt_show(block: bool = True) -> None:
    plt.show(block=block)
