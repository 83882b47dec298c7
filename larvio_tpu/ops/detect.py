"""Grid-based corner detection (Shi-Tomasi min-eigenvalue response).

Counterpart of ref:ImageProcessor::initializeFirstFrame / addNewFeatures
(grid-partitioned corner detection with per-cell caps, SURVEY.md §3.2). The
reference uses a FAST detector; FAST's 16-point branchy test maps poorly to
the VPU, while the Shi-Tomasi response is three convolutions and an
elementwise formula — the TPU-idiomatic choice with the same role (the grid
logic, per-cell caps and response ranking are preserved).

All outputs are fixed-shape: (n_cells, k) candidate coordinates + scores.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from larvio_tpu.ops.image import scharr_gradients, sep_filter


def shi_tomasi_response(img: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Min-eigenvalue of the structure tensor, box-filtered over `window`."""
    gx, gy = scharr_gradients(img)
    k = [1.0 / window] * window
    gxx = sep_filter(gx * gx, k)
    gyy = sep_filter(gy * gy, k)
    gxy = sep_filter(gx * gy, k)
    tr = 0.5 * (gxx + gyy)
    det = jnp.sqrt(jnp.maximum((0.5 * (gxx - gyy)) ** 2 + gxy * gxy, 0.0))
    return tr - det


def nms(resp: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Zero out non-maxima in a (2r+1)^2 neighborhood (separable max pool)."""
    w = 2 * radius + 1
    m = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (w, 1), (1, 1), "SAME")
    m = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max, (1, w), (1, 1), "SAME")
    return jnp.where(resp >= m, resp, 0.0)


def grid_topk(
    resp: jnp.ndarray,
    grid_rows: int,
    grid_cols: int,
    k: int,
    border: int = 8,
):
    """Per-cell top-k corners. Returns (scores (R*C, k), xy (R*C, k, 2))."""
    H, W = resp.shape
    # kill the border (patch extraction needs margins)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    resp = jnp.where(ok, resp, 0.0)

    ch = -(-H // grid_rows)  # cell height (ceil)
    cw = -(-W // grid_cols)
    Hp, Wp = ch * grid_rows, cw * grid_cols
    resp_p = jnp.pad(resp, ((0, Hp - H), (0, Wp - W)))
    cells = resp_p.reshape(grid_rows, ch, grid_cols, cw).transpose(0, 2, 1, 3)
    flat = cells.reshape(grid_rows * grid_cols, ch * cw)
    scores, idx = jax.lax.top_k(flat, k)

    cy = idx // cw
    cx = idx % cw
    cell_r = jax.lax.broadcasted_iota(jnp.int32, (grid_rows * grid_cols, k), 0) // grid_cols
    cell_c = jax.lax.broadcasted_iota(jnp.int32, (grid_rows * grid_cols, k), 0) % grid_cols
    y = cell_r * ch + cy
    x = cell_c * cw + cx
    xy = jnp.stack([x, y], axis=-1).astype(resp.dtype)
    return scores, xy
