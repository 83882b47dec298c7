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

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _slabs_xla(img: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """(F, PATCH, PATCH) integer-aligned slabs via vmapped dynamic_slice.

    Correctness baseline and CPU/fleet path. XLA lowers the vmapped
    dynamic_slice to a sequential per-feature while loop on TPU
    (~0.17 ms/frame at F=200); ``_slabs_pallas`` replaces it there.
    """
    H, W = img.shape

    def one(center):
        rx = jnp.clip(jnp.round(center[0]).astype(jnp.int32), _r, W - _r - 1)
        ry = jnp.clip(jnp.round(center[1]).astype(jnp.int32), _r, H - _r - 1)
        return jax.lax.dynamic_slice(img, (ry - _r, rx - _r), (PATCH, PATCH))

    return jax.vmap(one)(pos)


_SLAB_GROUP = 8


def _make_slab_kernel(H, W, Hp, Wp, G):
    """One program extracts G slabs; all F programs run data-parallel.

    Load pattern follows ops/lk_pallas.slab_at (Mosaic needs tile-aligned
    vector loads): an aligned window is loaded, rows rotated into place with
    a cheap sublane roll, then lane-rolled. Unlike LK's 16-row slabs, a
    31-row patch at row offset up to 7 spans up to 38 rows, so the window is
    64 rows (a 32-row window would WRAP the bottom rows of the patch —
    silently, since pltpu.roll is circular).
    """

    def kernel(pos_ref, img_ref, out_ref):
        for j in range(G):
            f = pl.program_id(0) * G + j
            cx = pos_ref[2 * f]
            cy = pos_ref[2 * f + 1]
            # invalid slots carry NaN/garbage positions; the INTEGER clip
            # forces the load offsets in range (slab content is then garbage
            # but gated out downstream — same as the XLA path's clamped-slice
            # semantics)
            rx = jnp.clip(jnp.round(cx).astype(jnp.int32), _r, W - _r - 1)
            ry = jnp.clip(jnp.round(cy).astype(jnp.int32), _r, H - _r - 1)
            x0 = rx - _r
            y0 = ry - _r
            ya = jnp.minimum((y0 // 8) * 8, Hp - 64)
            ya = pl.multiple_of(ya, 8)
            if Wp <= 256:
                wide = img_ref[pl.ds(ya, 64), :]
                xoff = x0
            else:
                xa = jnp.minimum((x0 // 128) * 128, Wp - 256)
                xa = pl.multiple_of(xa, 128)
                wide = img_ref[pl.ds(ya, 64), pl.ds(xa, 256)]
                xoff = x0 - xa
            # row roll needs rows (y0-ya)..(y0-ya)+30 <= 38 < 64: no wrap.
            # lane roll needs cols xoff..xoff+30 <= 239 < 256: no wrap.
            rows = pltpu.roll(wide, -(y0 - ya), axis=0)[:32, :]
            rolled = pltpu.roll(rows, -xoff, axis=1)
            out_ref[j, :, :] = rolled[:, :128]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _slabs_pallas_impl(img, pos, interpret=False):
    """(F, 32, 128) slab windows; ``[:, :PATCH, :PATCH]`` matches _slabs_xla."""
    F = pos.shape[0]
    H, W = img.shape
    Wp = -(-W // 128) * 128
    Hp = max(-(-H // 8) * 8, 64)
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, Hp - H), (0, Wp - W)))
    Fp = -(-F // _SLAB_GROUP) * _SLAB_GROUP
    # SMEM operand flattened to 1-D (multi-dim SMEM pads ~256 B/element)
    posf = jnp.pad(pos, ((0, Fp - F), (0, 0))).reshape(-1)
    out = pl.pallas_call(
        _make_slab_kernel(H, W, Hp, Wp, _SLAB_GROUP),
        grid=(Fp // _SLAB_GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_SLAB_GROUP, 32, 128), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Fp, 32, 128), jnp.float32),
        interpret=interpret,
    )(posf, img)
    return out[:F, :PATCH, :PATCH]


@jax.custom_batching.custom_vmap
def _slabs_pallas(img, pos):
    return _slabs_pallas_impl(img, pos)


@_slabs_pallas.def_vmap
def _slabs_pallas_batch(axis_size, in_batched, img, pos):
    # fleet path: keep the XLA gather semantics under vmap (aggregate fleet
    # throughput is bounded elsewhere; revisit with a (B, F) grid if it shows)
    img_b, pos_b = (
        x if b else jnp.broadcast_to(x[None], (axis_size, *x.shape))
        for x, b in ((img, in_batched[0]), (pos, in_batched[1]))
    )
    return jax.vmap(_slabs_xla)(img_b, pos_b), True


def extract_slabs(img: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """(F, PATCH, PATCH) patch slabs, Pallas on TPU / XLA elsewhere."""
    from larvio_tpu.ops.lk_pallas import pallas_available

    return (_slabs_pallas if pallas_available() else _slabs_xla)(img, pos)


def _desc_blur(img: jnp.ndarray) -> jnp.ndarray:
    """Separable binomial blur (two [1,4,6,4,1]/16 passes, sigma ~1.4).

    Real ORB computes BRIEF tests on a Gaussian-blurred image (OpenCV: 7x7
    sigma 2) because single-pixel comparisons are noise-fragile: measured on
    the noisy bench workload (2/255 sensor noise), raw-image descriptors of
    RANSAC-verified true tracks sat at median Hamming 67/256 vs the birth
    descriptor — above the gate (60) — so the ORB check killed >50% of
    genuinely-tracked features at age 0 (tools/diag_track_death.py). Blurring
    restores the test margins; edge padding keeps border intensities unbiased
    (features are margin-gated anyway).
    """
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    for axis in (0, 1):
        p = jnp.pad(img, [(2, 2) if a == axis else (0, 0) for a in (0, 1)],
                    mode="edge")
        n = img.shape[axis]
        img = sum(
            k[i] * jax.lax.slice_in_dim(p, i, i + n, axis=axis) for i in range(5)
        )
    return img


def describe(img: jnp.ndarray, pos: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Descriptors for all feature slots. pos (F,2) px -> (F, 8) uint32.

    One contiguous (PATCH x PATCH) slab per feature (Pallas data-parallel
    extraction on TPU — the vmapped dynamic_slice serializes there) from the
    descriptor-blurred image (_desc_blur); orientation from intensity-centroid
    moments over the slab; steered test pattern sampled nearest-neighbor from
    the slab (matching real ORB's integer sampling).
    """
    pat = jnp.asarray(_PAT)
    xg = jnp.asarray(_XGRID)
    yg = jnp.asarray(_YGRID)

    P32 = 32  # slab padded to the f32 sublane tile

    slabs = extract_slabs(_desc_blur(img), pos)

    def one(slab, ok):
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

    return jax.vmap(one)(slabs, valid)


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
