"""Camera projection and distortion models (pinhole + radtan + equidistant).

Counterpart of the reference's undistortPoints/distortion handling
(ref:src/image_processor.cpp undistortPoints(), SURVEY.md §3.2), which relies
on OpenCV. Here both directions are closed-form JAX:

  * ``distort_*``: ideal normalized coords -> distorted normalized coords.
  * ``undistort_normalize``: pixel coords -> ideal normalized coords, by a
    fixed-trip-count Newton/fixed-point iteration (no data-dependent control
    flow, so it vmaps over the whole padded feature table).

The equidistant (Kannala-Brandt fisheye) model covers the UZH-FPV configs
(SURVEY.md §2 "Config files"; BASELINE.json:10).
"""

from __future__ import annotations

import jax.numpy as jnp

_UNDISTORT_ITERS = 10


def distort_radtan(xy: jnp.ndarray, coeffs) -> jnp.ndarray:
    """Radial-tangential (plumb-bob) distortion on normalized coords (..., 2)."""
    k1, k2, p1, p2 = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def distort_equidistant(xy: jnp.ndarray, coeffs) -> jnp.ndarray:
    """Kannala-Brandt equidistant fisheye distortion on normalized coords."""
    k1, k2, k3, k4 = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    x, y = xy[..., 0], xy[..., 1]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-18))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = theta_d / r
    return jnp.stack([x * scale, y * scale], axis=-1)


def _distort(xy: jnp.ndarray, model: str, coeffs) -> jnp.ndarray:
    if model == "equidistant":
        return distort_equidistant(xy, coeffs)
    return distort_radtan(xy, coeffs)


def project(xy_normalized: jnp.ndarray, camera) -> jnp.ndarray:
    """Ideal normalized coords -> pixel coords through distortion + intrinsics."""
    coeffs = jnp.asarray(camera.distortion_coeffs, dtype=xy_normalized.dtype)
    fu, fv, cu, cv = camera.intrinsics
    d = _distort(xy_normalized, camera.distortion_model, coeffs)
    return jnp.stack([d[..., 0] * fu + cu, d[..., 1] * fv + cv], axis=-1)


def undistort_normalize(uv_pixels: jnp.ndarray, camera) -> jnp.ndarray:
    """Pixel coords -> ideal normalized coords (inverse of ``project``).

    Fixed-point iteration ``x_{k+1} = x_d - (distort(x_k) - x_k)`` with a
    static trip count — converges in a handful of iterations for both models
    at realistic distortion levels and compiles to a single fused loop.
    """
    dtype = uv_pixels.dtype
    coeffs = jnp.asarray(camera.distortion_coeffs, dtype=dtype)
    fu, fv, cu, cv = camera.intrinsics
    xd = jnp.stack(
        [(uv_pixels[..., 0] - cu) / fu, (uv_pixels[..., 1] - cv) / fv], axis=-1
    )
    if camera.distortion_model == "equidistant":
        # invert theta_d -> theta by Newton, then r = tan(theta)
        k1, k2, k3, k4 = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
        theta_d = jnp.sqrt(jnp.maximum(jnp.sum(xd * xd, axis=-1), 1e-18))
        theta = theta_d
        for _ in range(_UNDISTORT_ITERS):
            t2 = theta * theta
            f = theta * (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4) - theta_d
            fp = 1 + 3 * k1 * t2 + 5 * k2 * t2**2 + 7 * k3 * t2**3 + 9 * k4 * t2**4
            theta = theta - f / jnp.maximum(fp, 1e-6)
        scale = jnp.tan(theta) / theta_d
        return xd * scale[..., None]
    # divide-by-radial fixed point:  x <- (xd - tangential(x)) / radial(x)
    # (contraction even for strong k1; ~8 trips reach <1e-5 at image corners)
    k1, k2, p1, p2 = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    x = xd
    for _ in range(_UNDISTORT_ITERS):
        xx, yy = x[..., 0], x[..., 1]
        r2 = xx * xx + yy * yy
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        tx = 2.0 * p1 * xx * yy + p2 * (r2 + 2.0 * xx * xx)
        ty = p1 * (r2 + 2.0 * yy * yy) + 2.0 * p2 * xx * yy
        x = jnp.stack(
            [(xd[..., 0] - tx) / radial, (xd[..., 1] - ty) / radial], axis=-1
        )
    return x
