"""Pallas TPU kernel for pyramidal inverse-compositional LK tracking.

The flagship custom kernel (SURVEY.md §7 hard part #3; BASELINE.json:5 calls
for the LK front-end as fused Pallas kernels). Design:

  * the whole pyramid (prev + curr + prev-gradients) lives in VMEM for the
    kernel's lifetime (~7.7 MB at 480x752 with 3 sub-levels) — every patch
    access is a VMEM dynamic slice, no HBM traffic per iteration;
  * grid = one program per GROUP of ``_LK_GROUP`` features solved jointly;
    feature positions are scalar operands in SMEM driving the dynamic
    slices. One feature per program leaves the VPU idle on a long dependent
    chain — grouping puts independent chains in the same basic blocks so
    Mosaic's scheduler interleaves them (~1.7x at n=4);
  * per level, each feature's template patch and gradients are sliced once
    (inverse-compositional: the 2x2 normal matrix is constant across
    iterations), then a shared `while_loop` with per-feature early-exit
    freezing regathers only the current-image patches — data-dependent trip
    counts are free inside a kernel, unlike vmapped XLA;
  * correctness baseline: ops/lk.py (pure XLA); equivalence enforced by
    tests/test_lk_pallas.py on both paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from larvio_tpu.ops.lk import LKResult
from larvio_tpu.ops.image import in_bounds

# patch is PATCH x PATCH (odd); slices are (PATCH+1)^2 for bilinear
_MAX_ERR = 25.0
_MIN_EIG = 1e-3
# features solved jointly per program in the single-instance kernel: their
# independent op chains share basic blocks so Mosaic's scheduler interleaves
# them (1.7x over one-feature programs at n=4; n=8 blows up compile time)
_LK_GROUP = 4


def _bilinear_from_slab(slab, fx, fy, patch):
    i00 = slab[:patch, :patch]
    i01 = slab[:patch, 1 : patch + 1]
    i10 = slab[1 : patch + 1, :patch]
    i11 = slab[1 : patch + 1, 1 : patch + 1]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


def _make_multi_feature_body(shapes, patch, iters, precision, ld, n):
    """n-features-per-program LK solve with a JOINT per-level iteration loop.

    The per-feature solve is a long dependency chain of small vector ops
    (load -> sublane roll -> lane roll -> bilinear -> cross-lane reduce) that
    leaves the VPU mostly idle. Solving n features per program puts their
    independent chains in the SAME basic blocks (the template part is
    straight-line; the iteration loop is shared), so Mosaic's scheduler can
    interleave them — measured ~1.3x at n=2 over one-feature programs. The
    joint while freezes each feature at its own stop condition, so per-feature
    results are bit-identical to the n=1 kernel.
    """
    levels = len(shapes)
    S = patch + 1
    n_px = float(patch * patch)

    def pad_w(w):
        return -(-w // 128) * 128

    def body(prev, curr, gxs, gys, pxs, pys, gpxs, gpys, oks):
        def slab_at(ref, H, W, cx, cy):
            # Mosaic requires aligned vector loads: dynamic offsets must be
            # multiples of the tile (8 sublanes, 128 lanes for f32). Load an
            # aligned (32, <=256) window, rotate rows into place (cheap
            # sublane roll), STATIC-slice down to the 16 result rows, then
            # lane-roll (the expensive shuffle) on 2 row-tiles instead of 4.
            # NOTE: (24, .) loads + dynamic rolls MISCOMPILE in Mosaic
            # (silently wrong slabs); stay on (32, .). Clamping uses logical
            # sizes, loads use the padded ones.
            r = patch // 2
            Wp = pad_w(W)
            Hp = max(-(-H // 8) * 8, 32)  # must match _pad_hw
            cxc = jnp.clip(cx, r, W - r - 2.0)
            cyc = jnp.clip(cy, r, H - r - 2.0)
            x0 = jnp.floor(cxc).astype(jnp.int32) - r
            y0 = jnp.floor(cyc).astype(jnp.int32) - r
            ya = jnp.minimum((y0 // 8) * 8, Hp - 32)
            ya = pl.multiple_of(ya, 8)
            if Wp <= 256:
                wide = ld(ref, pl.ds(ya, 32), slice(None))
                xoff = x0
            else:
                xa = jnp.minimum((x0 // 128) * 128, Wp - 256)
                xa = pl.multiple_of(xa, 128)
                wide = ld(ref, pl.ds(ya, 32), pl.ds(xa, 256))
                xoff = x0 - xa
            rows = pltpu.roll(wide, -(y0 - ya), axis=0)[:S, :]
            rolled = pltpu.roll(rows, -xoff, axis=1)
            slab = rolled[:, :S]
            return slab, cxc - jnp.floor(cxc), cyc - jnp.floor(cyc)

        flow_x = [gpxs[k] - pxs[k] for k in range(n)]
        flow_y = [gpys[k] - pys[k] for k in range(n)]
        ok = list(oks)
        err = [jnp.float32(0.0)] * n

        for lvl in range(levels - 1, -1, -1):
            H, W = shapes[lvl]
            scale = jnp.float32(2.0 ** (-lvl))
            cx = [pxs[k] * scale for k in range(n)]
            cy = [pys[k] * scale for k in range(n)]

            tparts = [slab_at(prev[lvl], H, W, cx[k], cy[k]) for k in range(n)]
            T = [_bilinear_from_slab(s, fx, fy, patch) for s, fx, fy in tparts]
            gxsl = [slab_at(gxs[lvl], H, W, cx[k], cy[k])[0] for k in range(n)]
            gysl = [slab_at(gys[lvl], H, W, cx[k], cy[k])[0] for k in range(n)]
            Gx = [
                _bilinear_from_slab(gxsl[k], tparts[k][1], tparts[k][2], patch)
                for k in range(n)
            ]
            Gy = [
                _bilinear_from_slab(gysl[k], tparts[k][1], tparts[k][2], patch)
                for k in range(n)
            ]

            gxx = [jnp.sum(Gx[k] * Gx[k]) for k in range(n)]
            gxy = [jnp.sum(Gx[k] * Gy[k]) for k in range(n)]
            gyy = [jnp.sum(Gy[k] * Gy[k]) for k in range(n)]
            det = [gxx[k] * gyy[k] - gxy[k] * gxy[k] for k in range(n)]
            tr = [gxx[k] + gyy[k] for k in range(n)]
            min_e = [
                (tr[k] - jnp.sqrt(jnp.maximum(tr[k] * tr[k] - 4 * det[k], 0.0)))
                / (2 * n_px)
                for k in range(n)
            ]
            inv_det = [1.0 / jnp.maximum(det[k], 1e-12) for k in range(n)]
            margin = patch // 2 + 1
            lvl_ok = [
                (min_e[k] > _MIN_EIG)
                & (cx[k] >= margin) & (cx[k] <= W - 1 - margin)
                & (cy[k] >= margin) & (cy[k] <= H - 1 - margin)
                for k in range(n)
            ]

            def cond(carry):
                it = carry[0]
                done = carry[4]
                alldone = done[0]
                for k in range(1, n):
                    alldone = alldone & done[k]
                return (it < iters) & (~alldone)

            def wbody(carry):
                it, dx, dy, lerr, done = carry
                dx, dy, lerr, done = list(dx), list(dy), list(lerr), list(done)
                gath = [
                    slab_at(curr[lvl], H, W, cx[k] + dx[k], cy[k] + dy[k])
                    for k in range(n)
                ]
                for k in range(n):
                    islab, ifx, ify = gath[k]
                    I = _bilinear_from_slab(islab, ifx, ify, patch)
                    e = I - T[k]
                    err_new = jnp.sum(jnp.abs(e)) / n_px
                    bx = jnp.sum(Gx[k] * e)
                    by = jnp.sum(Gy[k] * e)
                    sx = (gyy[k] * bx - gxy[k] * by) * inv_det[k]
                    sy = (gxx[k] * by - gxy[k] * bx) * inv_det[k]
                    stop = ((sx * sx + sy * sy) < precision * precision) | (
                        it + 1 >= iters
                    )
                    # frozen features keep their state exactly (bit-parity
                    # with the n=1 kernel)
                    lerr[k] = jnp.where(done[k], lerr[k], err_new)
                    dx[k] = jnp.where(done[k] | stop, dx[k], dx[k] - sx)
                    dy[k] = jnp.where(done[k] | stop, dy[k], dy[k] - sy)
                    done[k] = done[k] | stop
                return it + 1, tuple(dx), tuple(dy), tuple(lerr), tuple(done)

            d0x = tuple(flow_x[k] * scale for k in range(n))
            d0y = tuple(flow_y[k] * scale for k in range(n))
            _, dxf, dyf, lvl_err, _ = jax.lax.while_loop(
                cond,
                wbody,
                (
                    jnp.int32(0), d0x, d0y,
                    tuple(jnp.float32(0.0) for _ in range(n)),
                    tuple(~lvl_ok[k] for k in range(n)),
                ),
            )
            for k in range(n):
                inb = (
                    (cx[k] + dxf[k] >= 1.0) & (cx[k] + dxf[k] <= W - 2.0)
                    & (cy[k] + dyf[k] >= 1.0) & (cy[k] + dyf[k] <= H - 2.0)
                )
                new_ok = lvl_ok[k] & inb
                flow_x[k] = jnp.where(new_ok, dxf[k] / scale, flow_x[k])
                flow_y[k] = jnp.where(new_ok, dyf[k] / scale, flow_y[k])
                if lvl == 0:
                    ok[k] = oks[k] & new_ok & (lvl_err[k] < _MAX_ERR)
                    err[k] = lvl_err[k]

        return (
            [pxs[k] + flow_x[k] for k in range(n)],
            [pys[k] + flow_y[k] for k in range(n)],
            ok,
            err,
        )

    return body


def _make_kernel_multi(shapes, patch, iters, precision, n):
    """Grid (F//n,): n features per program via the joint multi-body."""
    levels = len(shapes)
    multi = _make_multi_feature_body(
        shapes, patch, iters, precision, ld=lambda ref, r, c: ref[r, c], n=n
    )

    def kernel(pos_ref, guess_ref, valid_ref, *refs):
        prev = refs[0:levels]
        curr = refs[levels : 2 * levels]
        gxs = refs[2 * levels : 3 * levels]
        gys = refs[3 * levels : 4 * levels]
        out_pos = refs[4 * levels]
        out_valid = refs[4 * levels + 1]
        out_err = refs[4 * levels + 2]

        p = pl.program_id(0)
        ii = [n * p + k for k in range(n)]
        oks = [valid_ref[i] > 0 for i in ii]
        any_ok = oks[0]
        for k in range(1, n):
            any_ok = any_ok | oks[k]

        @pl.when(any_ok)
        def _():
            oxs, oys, okr, errs = multi(
                prev, curr, gxs, gys,
                tuple(pos_ref[i, 0] for i in ii),
                tuple(pos_ref[i, 1] for i in ii),
                tuple(guess_ref[i, 0] for i in ii),
                tuple(guess_ref[i, 1] for i in ii),
                tuple(oks),
            )
            for k, i in enumerate(ii):
                # invalid member of a mixed group reports the guess (matches
                # the n=1 kernel's skip path)
                out_pos[i, 0] = jnp.where(oks[k], oxs[k], guess_ref[i, 0])
                out_pos[i, 1] = jnp.where(oks[k], oys[k], guess_ref[i, 1])
                out_valid[i] = jnp.where(okr[k], jnp.int32(1), jnp.int32(0))
                out_err[i] = jnp.where(oks[k], errs[k], jnp.float32(0.0))

        @pl.when(jnp.logical_not(any_ok))
        def _():
            for i in ii:
                out_pos[i, 0] = guess_ref[i, 0]
                out_pos[i, 1] = guess_ref[i, 1]
                out_valid[i] = jnp.int32(0)
                out_err[i] = jnp.float32(0.0)

    return kernel


def _make_kernel_batched(shapes, patch, iters, precision, n_feat, n):
    """Fleet kernel: grid (B, F//n) — F innermost, so each instance's pyramid
    blocks stay resident in VMEM across its whole feature table (Pallas skips
    the re-copy when the block index map output is unchanged). Each program
    solves ``n`` features jointly (same ILP win as the single-instance
    kernel).

    Scalar operands are FLATTENED 1-D SMEM arrays indexed b*F+i: SMEM pads
    multi-dim arrays per element (~256 B each), so an (8, 200, 2) f32 operand
    would claim 800 KB of the 1 MB SMEM budget; flat it is 12.8 KB."""
    levels = len(shapes)
    multi = _make_multi_feature_body(
        shapes, patch, iters, precision, ld=lambda ref, r, c: ref[0, r, c], n=n
    )

    def kernel(pos_ref, guess_ref, valid_ref, *refs):
        prev = refs[0:levels]
        curr = refs[levels : 2 * levels]
        gxs = refs[2 * levels : 3 * levels]
        gys = refs[3 * levels : 4 * levels]
        out_pos = refs[4 * levels]
        out_valid = refs[4 * levels + 1]
        out_err = refs[4 * levels + 2]

        b = pl.program_id(0)
        p = pl.program_id(1)
        kk = [b * n_feat + n * p + j for j in range(n)]
        oks = [valid_ref[k] > 0 for k in kk]
        any_ok = oks[0]
        for j in range(1, n):
            any_ok = any_ok | oks[j]

        @pl.when(any_ok)
        def _():
            oxs, oys, okr, errs = multi(
                prev, curr, gxs, gys,
                tuple(pos_ref[2 * k] for k in kk),
                tuple(pos_ref[2 * k + 1] for k in kk),
                tuple(guess_ref[2 * k] for k in kk),
                tuple(guess_ref[2 * k + 1] for k in kk),
                tuple(oks),
            )
            for j, k in enumerate(kk):
                out_pos[2 * k] = jnp.where(oks[j], oxs[j], guess_ref[2 * k])
                out_pos[2 * k + 1] = jnp.where(oks[j], oys[j], guess_ref[2 * k + 1])
                out_valid[k] = jnp.where(okr[j], jnp.int32(1), jnp.int32(0))
                out_err[k] = jnp.where(oks[j], errs[j], jnp.float32(0.0))

        @pl.when(jnp.logical_not(any_ok))
        def _():
            for k in kk:
                out_pos[2 * k] = guess_ref[2 * k]
                out_pos[2 * k + 1] = guess_ref[2 * k + 1]
                out_valid[k] = jnp.int32(0)
                out_err[k] = jnp.float32(0.0)

    return kernel


def pallas_available() -> bool:
    """True when tracing for a TPU execution environment.

    Resolution order: an explicit ``jax_default_device`` pin wins (tests pin
    CPU; bench pins the TPU), else the process default backend. "axon" is the
    remote-TPU PJRT plugin this image can register — it executes TPU programs,
    so Pallas lowers for it. Mixed-platform processes that jit for a
    non-default device should set ``frontend.use_pallas_lk`` explicitly
    instead of relying on this heuristic; the driver's multi-chip dryrun runs
    in a hermetically CPU-pinned subprocess and never reaches here with a TPU
    registered.
    """
    tpu_like = ("tpu", "axon")
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            return str(getattr(dd, "platform", dd)).lower().startswith(tpu_like)
    except Exception:
        pass
    return jax.default_backend() in tpu_like


def lk_track_pallas(
    prev_pyr: tuple,
    curr_pyr: tuple,
    grad_pyr_x: tuple,
    grad_pyr_y: tuple,
    pos_prev: jnp.ndarray,
    pos_guess: jnp.ndarray,
    valid: jnp.ndarray,
    patch: int = 15,
    iters: int = 12,
    precision: float = 0.01,
) -> LKResult:
    """vmap-compatible wrapper: fleet batching maps to ONE batched kernel
    launch with grid (B, F) — per-instance pyramids ride in as (1, H, W)
    blocks (VERDICT r1 #5; the old lax.map custom_vmap serialized instances
    and regressed image-level fleet throughput)."""
    out = _lk_pallas_vmappable(
        patch, iters, float(precision),
        prev_pyr, curr_pyr, grad_pyr_x, grad_pyr_y, pos_prev, pos_guess, valid,
    )
    return LKResult(*out)


@functools.lru_cache(maxsize=None)
def _make_vmappable(patch, iters, precision):
    @jax.custom_batching.custom_vmap
    def fn(prev_pyr, curr_pyr, gx, gy, pos_prev, pos_guess, valid):
        r = _lk_track_pallas_impl(
            prev_pyr, curr_pyr, gx, gy, pos_prev, pos_guess, valid,
            patch=patch, iters=iters, precision=precision,
        )
        return (r.pos, r.valid, r.err)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):
        # move every batched leaf to a leading axis, broadcast the rest
        def prep(leaf, b):
            return leaf if b else jnp.broadcast_to(leaf[None], (axis_size, *leaf.shape))

        args_b = jax.tree.map(prep, list(args), in_batched)
        r = _lk_track_pallas_batched_impl(
            *args_b, patch=patch, iters=iters, precision=precision
        )
        return (r.pos, r.valid, r.err), (True, True, True)

    return fn


def _lk_pallas_vmappable(patch, iters, precision, *args):
    return _make_vmappable(patch, iters, precision)(*args)


def _pad_hw(H, W):
    return max(-(-H // 8) * 8, 32), -(-W // 128) * 128


@functools.partial(
    jax.jit, static_argnames=("patch", "iters", "precision", "interpret")
)
def _lk_track_pallas_batched_impl(
    prev_pyr: tuple,  # levels of (B, H, W)
    curr_pyr: tuple,
    grad_pyr_x: tuple,
    grad_pyr_y: tuple,
    pos_prev: jnp.ndarray,  # (B, F, 2)
    pos_guess: jnp.ndarray,
    valid: jnp.ndarray,  # (B, F)
    patch: int = 15,
    iters: int = 12,
    precision: float = 0.01,
    interpret: bool = False,
) -> LKResult:
    """Fleet LK: ONE pallas_call with grid (B, F).

    The image operands are blocked (1, Hp, Wp) with index map (b, f) ->
    (b, 0, 0): F is the innermost grid axis, so an instance's four pyramid
    block sets are copied into VMEM once and reused for its whole feature
    table — aggregate VMEM traffic is B x pyramid, not B x F x pyramid.
    """
    B, F = pos_prev.shape[0], pos_prev.shape[1]
    levels = len(prev_pyr)
    shapes = tuple((int(im.shape[1]), int(im.shape[2])) for im in prev_pyr)
    F_pad = -(-F // _LK_GROUP) * _LK_GROUP
    if F_pad != F:
        pos_prev = jnp.pad(pos_prev, ((0, 0), (0, F_pad - F), (0, 0)))
        pos_guess = jnp.pad(pos_guess, ((0, 0), (0, F_pad - F), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, F_pad - F)))
    kernel = _make_kernel_batched(
        shapes, patch, iters, float(precision), F_pad, _LK_GROUP
    )

    def padded(imgs):
        out = []
        for im in imgs:
            _, H, W = im.shape
            Hp, Wp = _pad_hw(H, W)
            if (Hp, Wp) != (H, W):
                im = jnp.pad(im, ((0, 0), (0, Hp - H), (0, Wp - W)))
            out.append(im)
        return tuple(out)

    prev_pyr = padded(prev_pyr)
    curr_pyr = padded(curr_pyr)
    grad_pyr_x = padded(grad_pyr_x)
    grad_pyr_y = padded(grad_pyr_y)

    img_specs = [
        pl.BlockSpec(
            (1, im.shape[1], im.shape[2]),
            lambda b, f: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for im in (*prev_pyr, *curr_pyr, *grad_pyr_x, *grad_pyr_y)
    ]
    out_pos, out_valid, out_err = pl.pallas_call(
        kernel,
        grid=(B, F_pad // _LK_GROUP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pos
            pl.BlockSpec(memory_space=pltpu.SMEM),  # guess
            pl.BlockSpec(memory_space=pltpu.SMEM),  # valid
            *img_specs,
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * F_pad * 2,), jnp.float32),
            jax.ShapeDtypeStruct((B * F_pad,), jnp.int32),
            jax.ShapeDtypeStruct((B * F_pad,), jnp.float32),
        ),
        interpret=interpret,
    )(
        pos_prev.reshape(-1),
        pos_guess.reshape(-1),
        valid.astype(jnp.int32).reshape(-1),
        *prev_pyr,
        *curr_pyr,
        *grad_pyr_x,
        *grad_pyr_y,
    )

    out_pos = out_pos.reshape(B, F_pad, 2)[:, :F]
    out_valid = out_valid.reshape(B, F_pad)[:, :F]
    out_err = out_err.reshape(B, F_pad)[:, :F]
    H0, W0 = shapes[0]
    ok = (out_valid > 0) & in_bounds(out_pos, (H0, W0), margin=1.0)
    return LKResult(pos=out_pos, valid=ok, err=out_err)


@functools.partial(
    jax.jit, static_argnames=("patch", "iters", "precision", "interpret")
)
def _lk_track_pallas_impl(
    prev_pyr: tuple,
    curr_pyr: tuple,
    grad_pyr_x: tuple,
    grad_pyr_y: tuple,
    pos_prev: jnp.ndarray,
    pos_guess: jnp.ndarray,
    valid: jnp.ndarray,
    patch: int = 15,
    iters: int = 12,
    precision: float = 0.01,
    interpret: bool = False,
) -> LKResult:
    F = pos_prev.shape[0]
    levels = len(prev_pyr)
    shapes = tuple((int(im.shape[0]), int(im.shape[1])) for im in prev_pyr)
    # _LK_GROUP features per program (joint-iteration ILP kernel); ragged
    # tables get padded invalid slots
    F_pad = -(-F // _LK_GROUP) * _LK_GROUP
    if F_pad != F:
        pos_prev = jnp.pad(pos_prev, ((0, F_pad - F), (0, 0)))
        pos_guess = jnp.pad(pos_guess, ((0, F_pad - F), (0, 0)))
        valid = jnp.pad(valid, (0, F_pad - F))
    kernel = _make_kernel_multi(shapes, patch, iters, float(precision), _LK_GROUP)

    def padded(imgs):
        out = []
        for im in imgs:
            H, W = im.shape
            Wp = -(-W // 128) * 128
            Hp = max(-(-H // 8) * 8, 32)
            if (Hp, Wp) != (H, W):
                im = jnp.pad(im, ((0, Hp - H), (0, Wp - W)))
            out.append(im)
        return tuple(out)

    prev_pyr = padded(prev_pyr)
    curr_pyr = padded(curr_pyr)
    grad_pyr_x = padded(grad_pyr_x)
    grad_pyr_y = padded(grad_pyr_y)

    img_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (4 * levels)
    out_pos, out_valid, out_err = pl.pallas_call(
        kernel,
        grid=(F_pad // _LK_GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pos
            pl.BlockSpec(memory_space=pltpu.SMEM),  # guess
            pl.BlockSpec(memory_space=pltpu.SMEM),  # valid
            *img_specs,
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F_pad, 2), jnp.float32),
            jax.ShapeDtypeStruct((F_pad,), jnp.int32),
            jax.ShapeDtypeStruct((F_pad,), jnp.float32),
        ),
        interpret=interpret,
    )(
        pos_prev,
        pos_guess,
        valid.astype(jnp.int32),
        *prev_pyr,
        *curr_pyr,
        *grad_pyr_x,
        *grad_pyr_y,
    )

    H0, W0 = shapes[0]
    pos = out_pos[:F]
    ok = (out_valid[:F] > 0) & in_bounds(pos, (H0, W0), margin=1.0)
    return LKResult(pos=pos, valid=ok, err=out_err[:F])
