"""Colormap helpers for qualitative outputs (magma disparity maps, as the
reference's test_simple.py:148-156 uses matplotlib magma)."""

from __future__ import annotations

import numpy as np


def magma(x: np.ndarray) -> np.ndarray:
    """Normalize to [0, 1] range already expected; returns uint8 RGB."""
    import matplotlib

    cm = matplotlib.colormaps["magma"]
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    rgba = cm(x)
    return (rgba[..., :3] * 255).astype(np.uint8)
