"""Iterative heatmap non-maximum suppression for the waypoint predictor.

Port of ``nms``/``neighborhoods`` (vlnce_baselines/waypoint_pred/utils.py:8-64):
``max_predictions`` rounds of global-argmax + neighborhood suppression over a
(angles x distances) heatmap, with the angle axis circular.  The reference's
Python loop maps directly onto ``lax.fori_loop`` — shapes are static, so the
whole candidate extraction jits into the policy step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def heatmap_nms(
    pred: jnp.ndarray,
    max_predictions: int = 5,
    sigma: Tuple[float, float] = (7.0, 5.0),
    gaussian: bool = False,
) -> jnp.ndarray:
    """NMS over ``[B, H, W]`` heatmaps (H = angle rows, circular; W = distance bins).

    Matches the reference's x/y convention: its input is ``(B,1,H,W)`` with
    ``x = flat % W`` (distance) and ``y = flat / W`` (angle), and the
    *x*-axis circular with range ``W``... note the reference calls
    ``neighborhoods(mu, x_range=shape[-1], y_range=shape[-2])`` so the
    suppression window is ±sigma[0] along the last axis and ±sigma[1] along
    the second-to-last, with the LAST axis circular (utils.py:55-59).

    Returns a same-shape map that is zero except at the selected peaks, which
    retain their original values (negatives clamped to 0, utils.py:63).
    """
    B, H, W = pred.shape
    flat = pred.reshape(B, H * W)

    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]  # [1,1,W]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]  # [1,H,1]

    def body(_, carry):
        supp, out = carry
        ix = jnp.argmax(supp.reshape(B, H * W), axis=1)  # [B]
        out = out.at[jnp.arange(B), ix].set(flat[jnp.arange(B), ix])
        x_mu = (ix % W).astype(jnp.float32)[:, None, None]
        # the reference computes y = ix / W with TRUE division on a long
        # tensor (utils.py:55), i.e. a fractional window center — preserved.
        y_mu = (ix.astype(jnp.float32) / W)[:, None, None]
        x_diff = xs - x_mu
        # circular along x with period W (utils.py:26)
        x_diff = jnp.minimum(jnp.abs(x_diff), jnp.abs(x_diff + W))
        y_diff = ys - y_mu
        if gaussian:
            g = jnp.exp(-0.5 * ((x_diff / sigma[0]) ** 2 + (y_diff / sigma[1]) ** 2))
        else:
            g = ((jnp.abs(x_diff) <= sigma[0]) & (jnp.abs(y_diff) <= sigma[1])).astype(
                jnp.float32
            )
        supp = supp * (1.0 - g)
        return supp, out

    out0 = jnp.zeros_like(flat)
    _, out = jax.lax.fori_loop(0, max_predictions, body, (pred, out0))
    return jnp.maximum(out.reshape(B, H, W), 0.0)
