"""Pallas LK kernel equivalence tests (SURVEY.md §7 hard part #3).

The Pallas kernel (ops/lk_pallas.py) is the production TPU tracking path;
ops/lk.py is the XLA correctness baseline. Interpret mode runs the kernel's
exact program through the Pallas emulator on CPU, so the equivalence gate is
part of the default (CPU-pinned) suite; a TPU-gated test re-checks parity on
real hardware when one is attached.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from larvio_tpu.config import VioConfig
from larvio_tpu.data.render import Renderer
from larvio_tpu.data.sim import SimConfig, Simulator
from larvio_tpu.ops.image import build_pyramid
from larvio_tpu.ops.lk import lk_track, make_grad_pyramid
from larvio_tpu.ops.lk_pallas import _lk_track_pallas_impl

cv2 = pytest.importorskip("cv2")

PATCH, ITERS, PREC = 15, 12, 0.01


@pytest.fixture(scope="module")
def tracking_problem():
    """Rendered frame pair + detected corners + pyramids, ready to track."""
    cfg = VioConfig()
    sim = Simulator(SimConfig(duration=8.0), cfg)
    rend = Renderer(cfg, np.asarray(sim.landmarks))

    def frame(t):
        p_w, R_wi = sim.pose(np.asarray(t))
        R_cw = np.asarray(sim.R_ci) @ R_wi
        p_cam = p_w + R_wi.T @ (-np.asarray(sim.R_ci).T @ np.asarray(sim.t_ci))
        return np.asarray(
            rend.render(jnp.asarray(R_cw.T, jnp.float32), jnp.asarray(p_cam, jnp.float32))
        )

    img0, img1 = frame(6.0), frame(6.05)
    pts = cv2.goodFeaturesToTrack(img0.astype(np.uint8), 80, 0.05, 20, blockSize=5)
    pts = pts.reshape(-1, 2).astype(np.float32)
    H, W = img0.shape
    keep = (
        (pts[:, 0] > 25) & (pts[:, 0] < W - 25) & (pts[:, 1] > 25) & (pts[:, 1] < H - 25)
    )
    F = 48  # padded table: last slots deliberately invalid (production shape)
    pts = pts[keep][: F - 8]
    n = len(pts)
    assert n >= 30
    pos = np.zeros((F, 2), np.float32)
    pos[:n] = pts
    valid = np.zeros(F, bool)
    valid[:n] = True

    pyr0 = tuple(build_pyramid(jnp.asarray(img0), 3))
    pyr1 = tuple(build_pyramid(jnp.asarray(img1), 3))
    grads = make_grad_pyramid(list(pyr0))
    gx = tuple(g[0] for g in grads)
    gy = tuple(g[1] for g in grads)
    return dict(
        pyr0=pyr0, pyr1=pyr1, grads=grads, gx=gx, gy=gy,
        pos=jnp.asarray(pos), valid=jnp.asarray(valid), n=n,
    )


def _run_xla(p):
    return lk_track(
        list(p["pyr0"]), list(p["pyr1"]), p["grads"],
        p["pos"], p["pos"], p["valid"],
        patch=PATCH, iters=ITERS, precision=PREC,
    )


def _run_pallas(p, interpret):
    return _lk_track_pallas_impl(
        p["pyr0"], p["pyr1"], p["gx"], p["gy"],
        p["pos"], p["pos"], p["valid"],
        patch=PATCH, iters=ITERS, precision=PREC, interpret=interpret,
    )


def _check_parity(ref, got, valid, n):
    ref_pos, ref_ok = np.asarray(ref.pos), np.asarray(ref.valid)
    got_pos, got_ok = np.asarray(got.pos), np.asarray(got.valid)
    valid = np.asarray(valid)
    # padding slots must never be valid
    assert not got_ok[~valid].any()
    # valid verdicts agree on >= 95% of real features
    agree = (ref_ok[:n] == got_ok[:n]).mean()
    assert agree >= 0.95, f"valid-mask agreement {agree:.2f}"
    both = ref_ok[:n] & got_ok[:n]
    assert both.sum() >= 0.7 * n
    d = np.linalg.norm(ref_pos[:n][both] - got_pos[:n][both], axis=1)
    frac = (d < 0.1).mean()
    assert frac >= 0.95, f"only {frac:.2f} within 0.1px (median {np.median(d):.4f})"


def test_interpret_mode_matches_xla(tracking_problem):
    """Kernel program (emulated) vs XLA baseline: sub-0.1px on real frames."""
    p = tracking_problem
    ref = _run_xla(p)
    got = _run_pallas(p, interpret=True)
    _check_parity(ref, got, p["valid"], p["n"])


def test_interpret_mode_all_invalid(tracking_problem):
    """An all-invalid table must come back all-invalid, not crash or NaN."""
    p = tracking_problem
    got = _run_pallas(
        dict(p, valid=jnp.zeros_like(p["valid"])), interpret=True
    )
    assert not np.asarray(got.valid).any()
    assert np.isfinite(np.asarray(got.pos)).all()


def test_batched_kernel_matches_single(rng):
    """The (B, F) fleet kernel must reproduce the single-instance kernel
    exactly per instance (VERDICT r1 #5). Interpret mode, small frames."""
    from larvio_tpu.ops.lk_pallas import (
        _lk_track_pallas_batched_impl,
        _lk_track_pallas_impl,
    )

    H, W, F, B = 120, 160, 16, 3
    p0s, p1s, gs = [], [], []
    ptss = []
    for b in range(B):
        im0 = cv2.GaussianBlur(
            rng.uniform(0, 255, (H, W)).astype(np.float32), (7, 7), 1.5
        )
        M = np.float32([[1, 0, 1.5 + b * 0.3], [0, 1, -1.0 + b * 0.2]])
        im1 = cv2.warpAffine(im0, M, (W, H))
        p0s.append(tuple(build_pyramid(jnp.asarray(im0), 2)))
        p1s.append(tuple(build_pyramid(jnp.asarray(im1), 2)))
        gs.append(make_grad_pyramid(list(p0s[-1])))
        ptss.append(rng.uniform([25, 25], [W - 25, H - 25], (F, 2)).astype(np.float32))
    pts = np.stack(ptss)
    valid = np.ones((B, F), bool)
    bp0 = tuple(jnp.stack([p0s[b][l] for b in range(B)]) for l in range(3))
    bp1 = tuple(jnp.stack([p1s[b][l] for b in range(B)]) for l in range(3))
    bgx = tuple(jnp.stack([gs[b][l][0] for b in range(B)]) for l in range(3))
    bgy = tuple(jnp.stack([gs[b][l][1] for b in range(B)]) for l in range(3))
    rb = _lk_track_pallas_batched_impl(
        bp0, bp1, bgx, bgy, jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(valid),
        patch=15, iters=12, precision=0.01, interpret=True,
    )
    for b in range(B):
        rs = _lk_track_pallas_impl(
            p0s[b], p1s[b],
            tuple(x[0] for x in gs[b]), tuple(x[1] for x in gs[b]),
            jnp.asarray(pts[b]), jnp.asarray(pts[b]), jnp.asarray(valid[b]),
            patch=15, iters=12, precision=0.01, interpret=True,
        )
        assert np.abs(np.asarray(rb.pos[b]) - np.asarray(rs.pos)).max() < 1e-4
        assert (np.asarray(rb.valid[b]) == np.asarray(rs.valid)).all()


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs a real TPU attached",
)
def test_compiled_tpu_matches_xla(tracking_problem):
    p = tracking_problem
    dev = jax.devices()[0]
    p_dev = {
        k: jax.device_put(v, dev) if k not in ("grads", "n") else v
        for k, v in p.items()
    }
    ref = _run_xla(p)  # XLA baseline on the default (CPU) backend
    got = _run_pallas(p_dev, interpret=False)
    _check_parity(ref, got, p["valid"], p["n"])
