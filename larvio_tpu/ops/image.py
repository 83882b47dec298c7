"""Image primitives: bilinear sampling, separable blur, gradients, pyramids.

Counterpart of the reference's cv::buildOpticalFlowPyramid use
(ref:ImageProcessor::createImagePyramids, SURVEY.md §3.2) plus the sampling
helpers every other front-end stage builds on. All ops are fixed-shape, NHWC-
free (single-channel), and written so XLA maps the filters onto fused
elementwise/conv HLOs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 5-tap binomial (Gaussian approx) used by OpenCV's pyrDown
_K5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def sep_filter(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D filter with edge-replicate padding. img: (H, W)."""
    r = k.shape[0] // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k.astype(img.dtype)[None, None, :, None],
        (1, 1),
        "VALID",
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k.astype(img.dtype)[None, None, None, :],
        (1, 1),
        "VALID",
    )[0, 0]
    return x


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Blur + 2x decimation (cv::pyrDown semantics, ceil sizes)."""
    return sep_filter(img, _K5)[::2, ::2]


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """levels+1 images: [full res, /2, /4, ...]."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scharr x/y gradients (the kernel OpenCV uses for LK), edge-replicated."""
    smooth = jnp.array([3.0, 10.0, 3.0], img.dtype) / 32.0
    diff = jnp.array([-1.0, 0.0, 1.0], img.dtype)

    def apply(kr, kc):
        r = 1
        x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
        x = jax.lax.conv_general_dilated(
            x[None, None], kr[None, None, :, None], (1, 1), "VALID"
        )[0, 0]
        x = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
        return jax.lax.conv_general_dilated(
            x[None, None], kc[None, None, None, :], (1, 1), "VALID"
        )[0, 0]

    gx = apply(smooth, diff)
    gy = apply(diff, smooth)
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


def in_bounds(xy: jnp.ndarray, shape: tuple, margin: float = 0.0) -> jnp.ndarray:
    H, W = shape
    return (
        (xy[..., 0] >= margin)
        & (xy[..., 0] <= W - 1 - margin)
        & (xy[..., 1] >= margin)
        & (xy[..., 1] <= H - 1 - margin)
    )
