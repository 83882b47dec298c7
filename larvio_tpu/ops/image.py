"""Image primitives: bilinear sampling, separable blur, gradients, pyramids.

Counterpart of the reference's cv::buildOpticalFlowPyramid use
(ref:ImageProcessor::createImagePyramids, SURVEY.md §3.2) plus the sampling
helpers every other front-end stage builds on. All ops are fixed-shape, NHWC-
free (single-channel), and written so XLA maps the filters onto fused
elementwise/conv HLOs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# 5-tap binomial (Gaussian approx) used by OpenCV's pyrDown
_K5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def sep_filter(img: jnp.ndarray, k) -> jnp.ndarray:
    """Separable 2D filter with edge-replicate padding. img: (H, W).

    ``k`` must be a static (host) sequence of tap weights. Implemented as
    unrolled shift-and-add (static slices of a padded copy): for 3-5 tap
    kernels this is pure fused VPU elementwise work, an order of magnitude
    faster on TPU than lowering through conv HLOs at these sizes.
    """
    H, W = img.shape
    taps = [float(v) for v in np.asarray(k)]
    r = len(taps) // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    acc = None
    for i, t in enumerate(taps):
        term = x[i : i + H, :] * t
        acc = term if acc is None else acc + term
    x = jnp.pad(acc, ((0, 0), (r, r)), mode="edge")
    acc = None
    for i, t in enumerate(taps):
        term = x[:, i : i + W] * t
        acc = term if acc is None else acc + term
    return acc


@functools.lru_cache(maxsize=None)
def _dec_matrix(n: int) -> np.ndarray:
    """(ceil(n/2), n) banded blur+decimate operator, edge-replicated.

    Row i holds the 5 binomial taps centered at column 2i, with out-of-range
    taps accumulated onto the edge sample (= sep_filter's edge-replicate
    padding). Dense on purpose: the 96x nominal FLOP overhead rides the MXU,
    which beats the shift-add chain's layout copies on TPU.
    """
    no = -(-n // 2)
    D = np.zeros((no, n), np.float32)
    for i in range(no):
        for j, t in enumerate(_K5):
            c = min(max(2 * i + j - 2, 0), n - 1)
            D[i, c] += np.float32(t)
    return D


def _pyr_down_mxu(img: jnp.ndarray) -> jnp.ndarray:
    """Blur + decimate as two banded matmuls (one MXU pass per side).

    out = D_r @ img @ D_c^T. HIGHEST precision keeps f32-grade accuracy
    (images are 0-255; DEFAULT's bf16 passes cost ~0.5 intensity error,
    which the 0.1 px LK parity gate does not tolerate at coarse levels).
    """
    H, W = img.shape
    Dr = jnp.asarray(_dec_matrix(H))
    Dc = jnp.asarray(_dec_matrix(W))
    p = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(Dr, img, precision=p), Dc.T, precision=p)


def _on_tpu() -> bool:
    from larvio_tpu.ops.lk_pallas import pallas_available

    return pallas_available()


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Blur + 2x decimation (cv::pyrDown semantics, ceil sizes).

    TPU: banded-matmul path (_pyr_down_mxu) — the shift-add chain's
    reshape/slice decimation costs ~0.2 ms/frame of layout copies there.
    CPU: shift-add + reshape (dense matmuls are slow on host; keeps the
    CPU-pinned suite fast). Equivalence pinned by tests/test_frontend.py.
    """
    if _on_tpu():
        return _pyr_down_mxu(img)
    x = sep_filter(img, _K5)
    H, W = x.shape
    He, We = -(-H // 2) * 2, -(-W // 2) * 2
    if (He, We) != (H, W):
        x = jnp.pad(x, ((0, He - H), (0, We - W)))
    return x.reshape(He // 2, 2, We // 2, 2)[:, 0, :, 0]


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """levels+1 images: [full res, /2, /4, ...]."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def _sep_apply(img, kr, kc):
    """Apply row kernel kr then column kernel kc by shift-and-add."""
    H, W = img.shape
    rr, rc = len(kr) // 2, len(kc) // 2
    x = jnp.pad(img, ((rr, rr), (0, 0)), mode="edge")
    acc = None
    for i, t in enumerate(kr):
        if t == 0.0:
            continue
        term = x[i : i + H, :] * t
        acc = term if acc is None else acc + term
    x = jnp.pad(acc, ((0, 0), (rc, rc)), mode="edge")
    acc = None
    for i, t in enumerate(kc):
        if t == 0.0:
            continue
        term = x[:, i : i + W] * t
        acc = term if acc is None else acc + term
    return acc


def scharr_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scharr x/y gradients (the kernel OpenCV uses for LK), edge-replicated."""
    smooth = [3.0 / 32.0, 10.0 / 32.0, 3.0 / 32.0]
    diff = [-1.0, 0.0, 1.0]
    gx = _sep_apply(img, smooth, diff)
    gy = _sep_apply(img, diff, smooth)
    return gx, gy


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation. img (H, W); xy (..., 2) as (x, y) pixel coords.

    Coordinates are clamped to the valid interpolation domain; callers that
    care about out-of-bounds must check separately (see in_bounds).
    """
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


def sample_patch(img: jnp.ndarray, center: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Bilinear (patch x patch) window centered at a float position.

    TPU-native path: ONE contiguous ``dynamic_slice`` of (patch+1)^2 pixels
    plus four statically-shifted sub-views — instead of patch^2 arbitrary
    gathers, which scalarize on TPU. The center is clamped so the slice stays
    in bounds (callers gate out-of-bounds separately via in_bounds).

    center: (2,) as (x, y). Returns (patch, patch).
    """
    H, W = img.shape
    r = patch // 2
    cx = jnp.clip(center[0], r, W - r - 2)
    cy = jnp.clip(center[1], r, H - r - 2)
    x0 = jnp.floor(cx).astype(jnp.int32) - r
    y0 = jnp.floor(cy).astype(jnp.int32) - r
    fx = cx - jnp.floor(cx)
    fy = cy - jnp.floor(cy)
    slab = jax.lax.dynamic_slice(img, (y0, x0), (patch + 1, patch + 1))
    i00 = slab[:-1, :-1]
    i01 = slab[:-1, 1:]
    i10 = slab[1:, :-1]
    i11 = slab[1:, 1:]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


def in_bounds(xy: jnp.ndarray, shape: tuple, margin: float = 0.0) -> jnp.ndarray:
    H, W = shape
    return (
        (xy[..., 0] >= margin)
        & (xy[..., 0] <= W - 1 - margin)
        & (xy[..., 1] >= margin)
        & (xy[..., 1] <= H - 1 - margin)
    )
