"""Rotation-steered binary (ORB-style) descriptors + Hamming matching.

Counterpart of ref:ORBDescriptor.{h,cpp} (ORB-SLAM2-derived rBRIEF,
SURVEY.md §2 "ORB descriptor helper"): the reference recomputes a descriptor
at each tracked corner and kills tracks whose Hamming distance to the
descriptor stored at track birth exceeds a threshold.

TPU design: descriptors only need to be *self-consistent* (matched against
our own descriptors, never OpenCV's), so instead of the learned ORB pattern we
use a fixed seeded Gaussian test pattern — same statistics, no vendored
table. The whole feature table's descriptors are computed in one vmapped
gather batch; Hamming distance is XOR + popcount on 8 uint32 lanes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from larvio_tpu.ops.image import in_bounds

PATCH = 31
N_BITS = 256
N_WORDS = N_BITS // 32

# fixed test pattern: pairs ~ N(0, (PATCH/5)^2), clipped to the patch
_rng = np.random.default_rng(20260816)
_PAT = np.clip(
    _rng.normal(0.0, PATCH / 5.0, size=(N_BITS, 4)), -(PATCH // 2 - 1), PATCH // 2 - 1
).astype(np.float32)

# circular mask grids for the intensity-centroid orientation (radius 15),
# laid out over the (PATCH x PATCH) slab so the moments are two fused
# elementwise reductions — no point gathers (TPU: gathers scalarize)
_r = PATCH // 2
_yy, _xx = np.mgrid[-_r : _r + 1, -_r : _r + 1]
_CIRC = (_xx**2 + _yy**2 <= _r**2).astype(np.float32)
_XGRID = (_xx * _CIRC).astype(np.float32)
_YGRID = (_yy * _CIRC).astype(np.float32)


def describe(img: jnp.ndarray, pos: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Descriptors for all feature slots. pos (F,2) px -> (F, 8) uint32.

    One contiguous (PATCH x PATCH) dynamic slice per feature; orientation from
    intensity-centroid moments over the slab; steered test pattern sampled
    nearest-neighbor from the slab (matching real ORB's integer sampling).
    """
    pat = jnp.asarray(_PAT)
    xg = jnp.asarray(_XGRID)
    yg = jnp.asarray(_YGRID)
    H, W = img.shape

    P32 = 32  # slab padded to the f32 sublane tile

    def one(center, ok):
        rx = jnp.clip(jnp.round(center[0]).astype(jnp.int32), _r, W - _r - 1)
        ry = jnp.clip(jnp.round(center[1]).astype(jnp.int32), _r, H - _r - 1)
        slab = jax.lax.dynamic_slice(img, (ry - _r, rx - _r), (PATCH, PATCH))
        m10 = jnp.sum(slab * xg)
        m01 = jnp.sum(slab * yg)
        th = jnp.arctan2(m01, m10)
        c, s = jnp.cos(th), jnp.sin(th)
        rot = jnp.array([[c, -s], [s, c]], img.dtype)
        a = pat[:, 0:2] @ rot.T  # (256, 2) slab-relative offsets
        b = pat[:, 2:4] @ rot.T
        pts = jnp.concatenate([a, b], axis=0)  # (512, 2)
        ix = jnp.clip(jnp.round(pts[:, 0]).astype(jnp.int32) + _r, 0, PATCH - 1)
        iy = jnp.clip(jnp.round(pts[:, 1]).astype(jnp.int32) + _r, 0, PATCH - 1)
        # nearest-neighbor sampling as one-hot einsum: a 512-point gather
        # scalarizes on TPU (~1 ms/frame); selecting through tiny one-hot
        # matrices rides the MXU instead
        slab_p = jnp.pad(slab, ((0, P32 - PATCH), (0, P32 - PATCH)))
        rows = jax.lax.broadcasted_iota(jnp.int32, (2 * N_BITS, P32), 1)
        rowsel = (rows == iy[:, None]).astype(img.dtype)  # (512, 32)
        colsel = (rows == ix[:, None]).astype(img.dtype)
        vals = jnp.einsum(
            "pr,rc,pc->p", rowsel, slab_p, colsel,
            precision=jax.lax.Precision.DEFAULT,
        )
        bits = (vals[:N_BITS] < vals[N_BITS:]).astype(jnp.uint32)
        words = bits.reshape(N_WORDS, 32)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        packed = jnp.sum(words << shifts[None, :], axis=1, dtype=jnp.uint32)
        return jnp.where(ok, packed, jnp.zeros(N_WORDS, jnp.uint32))

    return jax.vmap(one)(pos, valid)


def hamming(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Per-row Hamming distance between (..., 8) uint32 descriptors."""
    x = jnp.bitwise_xor(d1, d2)
    return jnp.sum(jnp.bitwise_count(x).astype(jnp.int32), axis=-1)


def descriptor_check(img, pos, valid, stored_desc, threshold: int):
    """Recompute descriptors at tracked positions; gate against stored ones."""
    H, W = img.shape
    ok_margin = in_bounds(pos, (H, W), margin=_r + 2)
    d = describe(img, pos, valid & ok_margin)
    dist = hamming(d, stored_desc)
    return (dist <= threshold) & ok_margin, dist
