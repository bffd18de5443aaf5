"""Depth evaluation metrics (reference layers.py:293-311).

Provided both as a jnp function (for in-graph eval) and a numpy twin for the
host-side metric loops over variable-size ground truths (the reference's eval
protocol interpolates predictions to each GT's native resolution —
evaluate_depth.py:160-162 — which must stay outside jit).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def compute_depth_errors(gt, pred):
    """abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 over flattened valid pixels."""
    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = jnp.mean((thresh < 1.25).astype(jnp.float32))
    a2 = jnp.mean((thresh < 1.25**2).astype(jnp.float32))
    a3 = jnp.mean((thresh < 1.25**3).astype(jnp.float32))

    rmse = jnp.sqrt(jnp.mean((gt - pred) ** 2))
    rmse_log = jnp.sqrt(jnp.mean((jnp.log(gt) - jnp.log(pred)) ** 2))
    abs_rel = jnp.mean(jnp.abs(gt - pred) / gt)
    sq_rel = jnp.mean((gt - pred) ** 2 / gt)
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def compute_depth_errors_np(gt: np.ndarray, pred: np.ndarray):
    """Numpy twin of compute_depth_errors for host-side eval loops."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = float((thresh < 1.25).mean())
    a2 = float((thresh < 1.25**2).mean())
    a3 = float((thresh < 1.25**3).mean())

    rmse = float(np.sqrt(((gt - pred) ** 2).mean()))
    rmse_log = float(np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean()))
    abs_rel = float(np.mean(np.abs(gt - pred) / gt))
    sq_rel = float(np.mean((gt - pred) ** 2 / gt))
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def compute_make3d_errors_np(gt: np.ndarray, pred: np.ndarray):
    """Make3D protocol errors (reference evaluate_depth.py:73-88)."""
    abs_rel = float(np.mean(np.abs(gt - pred) / gt))
    sq_rel = float(np.mean(((gt - pred) ** 2) / gt))
    rmse = float(np.sqrt(((gt - pred) ** 2).mean()))
    rmse_log10 = float(np.sqrt((np.abs(np.log10(gt) - np.log10(pred)) ** 2).mean()))
    return abs_rel, sq_rel, rmse, rmse_log10
