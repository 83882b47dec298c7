"""IMU propagation of state and covariance with First-Estimates Jacobians.

Counterpart of ref:src/larvio.cpp batchImuProcessing() / processModel() /
predictNewState() (SURVEY.md §3.3): per IMU sample, RK4 integration of the
nominal state, third-order state-transition matrix, FEJ/observability fix-up
against the ``*_null`` linearization points, and the covariance GEMM.

TPU design: the frame's IMU samples arrive as a fixed-size padded batch
(``imu_slots_per_frame`` slots with a validity mask); propagation is a
``lax.scan`` over slots, each interval clamped to the propagation target time
``t_img + td`` — so a changing online ``td`` needs no host round-trip. Zero-dt
(padding) slots are exact no-ops.

The FEJ fix-up follows the published observability-constrained construction
(Li & Mourikis IJRR 2013 "High-precision, consistent EKF-based VIO"; the
"unbiased linear system model" of the reference's Sensors 2019 paper): the
yaw/position rows of Phi are corrected so the propagated unobservable
subspace stays in the nullspace of the information gained.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig
from larvio_tpu.core.linalg import mm, symmetrize
from larvio_tpu.core.quaternion import quat_normalize, quat_to_rotation
from larvio_tpu.core.so3 import skew
from larvio_tpu.models.state import (
    FilterState,
    IDX_BA,
    IDX_BG,
    IDX_P,
    IDX_THETA,
    IDX_V,
    IMU_DIM,
    slam_offset,
)


class ImuBatch(NamedTuple):
    """Padded per-frame IMU samples (host bucketing, SURVEY.md §7 layer 2)."""

    t: jnp.ndarray  # (S,) sample timestamps (monotone on valid slots)
    w: jnp.ndarray  # (S, 3) angular velocity (rad/s)
    a: jnp.ndarray  # (S, 3) specific force (m/s^2)
    valid: jnp.ndarray  # (S,) bool


def _rk4_nominal(q, v, p, w0, a0, w1, a1, dt, gravity):
    """Joint RK4 of (q, v, p); IMU inputs linearly interpolated over dt."""
    g_w = jnp.array([0.0, 0.0, -gravity], q.dtype)
    wm, am = 0.5 * (w0 + w1), 0.5 * (a0 + a1)

    def deriv(qq, vv, ww, aa):
        from larvio_tpu.core.quaternion import _omega

        dq = 0.5 * (_omega(ww) @ qq)
        dv = quat_to_rotation(qq).T @ aa + g_w
        return dq, dv, vv

    k1q, k1v, k1p = deriv(q, v, w0, a0)
    k2q, k2v, k2p = deriv(q + 0.5 * dt * k1q, v + 0.5 * dt * k1v, wm, am)
    k3q, k3v, k3p = deriv(q + 0.5 * dt * k2q, v + 0.5 * dt * k2v, wm, am)
    k4q, k4v, k4p = deriv(q + dt * k3q, v + dt * k3v, w1, a1)
    qn = q + (dt / 6.0) * (k1q + 2 * k2q + 2 * k3q + k4q)
    qn = qn / jnp.linalg.norm(qn)
    qn = qn * jnp.sign(jnp.where(qn[3] == 0, 1.0, qn[3]))
    vn = v + (dt / 6.0) * (k1v + 2 * k2v + 2 * k3v + k4v)
    pn = p + (dt / 6.0) * (k1p + 2 * k2p + 2 * k3p + k4p)
    return qn, vn, pn


def _phi_and_Q(cfg: VioConfig, q_old, q_new, v_old, v_new, p_old, p_new,
               q_null, v_null, p_null, w_hat, a_hat, dt, dtype):
    """Third-order Phi (15x15) + discrete noise Q, with FEJ fix-up."""
    nz = cfg.noise
    g_w = jnp.array([0.0, 0.0, -cfg.gravity], dtype)

    # continuous-time F, G evaluated at the FEJ linearization point
    R_null = quat_to_rotation(q_null)  # world->IMU at linearization point
    F = jnp.zeros((IMU_DIM, IMU_DIM), dtype)
    F = F.at[IDX_THETA:IDX_THETA + 3, IDX_THETA:IDX_THETA + 3].set(-skew(w_hat))
    F = F.at[IDX_THETA:IDX_THETA + 3, IDX_BG:IDX_BG + 3].set(-jnp.eye(3, dtype=dtype))
    F = F.at[IDX_V:IDX_V + 3, IDX_THETA:IDX_THETA + 3].set(-R_null.T @ skew(a_hat))
    F = F.at[IDX_V:IDX_V + 3, IDX_BA:IDX_BA + 3].set(-R_null.T)
    F = F.at[IDX_P:IDX_P + 3, IDX_V:IDX_V + 3].set(jnp.eye(3, dtype=dtype))

    G = jnp.zeros((IMU_DIM, 12), dtype)
    G = G.at[IDX_THETA:IDX_THETA + 3, 0:3].set(-jnp.eye(3, dtype=dtype))
    G = G.at[IDX_BG:IDX_BG + 3, 3:6].set(jnp.eye(3, dtype=dtype))
    G = G.at[IDX_V:IDX_V + 3, 6:9].set(-R_null.T)
    G = G.at[IDX_BA:IDX_BA + 3, 9:12].set(jnp.eye(3, dtype=dtype))

    Fdt = F * dt
    Fdt2 = mm(Fdt, Fdt)
    Phi = jnp.eye(IMU_DIM, dtype=dtype) + Fdt + 0.5 * Fdt2 + (1.0 / 6.0) * mm(Fdt2, Fdt)

    if cfg.filter.use_fej:
        # Observability-constrained fix-up (Li & Mourikis; MSCKF FEJ form):
        # force Phi to map the pre-step unobservable directions (global yaw,
        # position) onto the post-step ones.
        R_kk_1 = quat_to_rotation(q_null)  # linearization point at step start
        Phi = Phi.at[IDX_THETA:IDX_THETA + 3, IDX_THETA:IDX_THETA + 3].set(
            quat_to_rotation(q_new) @ R_kk_1.T
        )
        u = R_kk_1 @ g_w  # gravity in the old linearized body frame
        s = u / jnp.maximum(jnp.dot(u, u), 1e-12)

        A1 = Phi[IDX_V:IDX_V + 3, IDX_THETA:IDX_THETA + 3]
        w1 = skew(v_null - v_new) @ g_w
        Phi = Phi.at[IDX_V:IDX_V + 3, IDX_THETA:IDX_THETA + 3].set(
            A1 - jnp.outer(A1 @ u - w1, s)
        )
        A2 = Phi[IDX_P:IDX_P + 3, IDX_THETA:IDX_THETA + 3]
        w2 = skew(dt * v_null + p_null - p_new) @ g_w
        Phi = Phi.at[IDX_P:IDX_P + 3, IDX_THETA:IDX_THETA + 3].set(
            A2 - jnp.outer(A2 @ u - w2, s)
        )

    Qc = jnp.diag(
        jnp.concatenate(
            [
                jnp.full(3, nz.gyro_noise**2, dtype),
                jnp.full(3, nz.gyro_bias_noise**2, dtype),
                jnp.full(3, nz.acc_noise**2, dtype),
                jnp.full(3, nz.acc_bias_noise**2, dtype),
            ]
        )
    )
    Qd = mm(mm(Phi, mm(mm(G, Qc), G.T)), Phi.T) * dt
    return Phi, Qd


def propagate(cfg: VioConfig, fs: FilterState, imu: ImuBatch, t_target_img: jnp.ndarray) -> FilterState:
    """Propagate state + covariance through the frame's IMU batch — parallel.

    ``t_target_img`` is the raw image timestamp; the actual propagation target
    is ``t_target_img + td`` with the *current* td estimate (online temporal
    calibration, ref: processFeatures propagating to t_img + td).

    TPU design: the reference's per-sample sequential loop is latency-bound on
    TPU (24 tiny steps). Since the biases are constant within a frame, the
    quaternion RK4 step is LINEAR in q (q_i = M_i q_{i-1} with M_i a 4x4
    function of the interval's gyro samples only), so the whole chain
    parallelizes: per-slot M_i / Phi_i / Qd_i are built in one batch and the
    ordered products come from ``associative_scan`` (depth log2(S) instead of
    S). Velocity/position use Simpson / trapezoid on the recovered attitude
    chain — identical to the sequential RK4 to O(dt^3) per 5 ms step
    (validated against finite differences and the e2e ATE gates).
    """
    return _propagate_parallel(cfg, fs, imu, t_target_img)


def _propagate_parallel(cfg, fs, imu, t_target_img):
    from larvio_tpu.core.quaternion import _omega

    dtype = fs.P.dtype
    t_target = t_target_img + fs.td
    S = imu.t.shape[0]
    g_w = jnp.array([0.0, 0.0, -cfg.gravity], dtype)

    # --- per-slot intervals (parallel) ---------------------------------------
    t_end = jnp.minimum(imu.t, t_target)
    ends = jnp.where(imu.valid, t_end, -jnp.inf)
    run_max = jax.lax.associative_scan(jnp.maximum, ends)  # inclusive cummax
    start = jnp.maximum(
        fs.time, jnp.concatenate([jnp.full((1,), -jnp.inf, dtype), run_max[:-1]])
    )
    dt = jnp.maximum(t_end - start, 0.0) * imu.valid.astype(dtype)

    w_prev = jnp.concatenate([imu.w[:1], imu.w[:-1]], axis=0)
    a_prev = jnp.concatenate([imu.a[:1], imu.a[:-1]], axis=0)
    t_prev = jnp.concatenate([jnp.full((1,), -jnp.inf, dtype), imu.t[:-1]])
    w0 = w_prev - fs.bg
    a0 = a_prev - fs.ba
    w1f = imu.w - fs.bg
    a1f = imu.a - fs.ba
    frac = jnp.clip(
        (t_end - start) / jnp.maximum(imu.t - start, 1e-9), 0.0, 1.0
    )[:, None]
    w1 = w0 + frac * (w1f - w0)
    a1 = a0 + frac * (a1f - a0)
    wm = 0.5 * (w0 + w1)
    am = 0.5 * (a0 + a1)

    # --- quaternion chain: q_i = M_i q_{i-1}, M from linear RK4 ---------------
    eye4 = jnp.eye(4, dtype=dtype)
    A0 = 0.5 * _omega(w0)  # (S, 4, 4)
    Am = 0.5 * _omega(wm)
    A1 = 0.5 * _omega(w1)
    dte = dt[:, None, None]
    K1 = A0
    K2 = mm(Am, eye4 + 0.5 * dte * K1)
    K3 = mm(Am, eye4 + 0.5 * dte * K2)
    K4 = mm(A1, eye4 + dte * K3)
    M = eye4 + (dte / 6.0) * (K1 + 2 * K2 + 2 * K3 + K4)
    M = jnp.where((dt <= 0.0)[:, None, None], eye4, M)
    # ordered cumulative products P_i = M_i ... M_1
    Pq = jax.lax.associative_scan(lambda a, b: mm(b, a), M)
    q_chain = jnp.einsum("sij,j->si", Pq, fs.q)
    q_chain = q_chain / jnp.linalg.norm(q_chain, axis=-1, keepdims=True)
    q_prev_chain = jnp.concatenate([fs.q[None], q_chain[:-1]], axis=0)
    q_mid = q_prev_chain + q_chain
    q_mid = q_mid / jnp.linalg.norm(q_mid, axis=-1, keepdims=True)

    # --- velocity / position (Simpson / trapezoid on the attitude chain) -----
    R_prev = quat_to_rotation(q_prev_chain)  # (S,3,3) world->IMU
    R_mid = quat_to_rotation(q_mid)
    R_new = quat_to_rotation(q_chain)
    acc_w = (
        jnp.einsum("sji,sj->si", R_prev, a0)
        + 4.0 * jnp.einsum("sji,sj->si", R_mid, am)
        + jnp.einsum("sji,sj->si", R_new, a1)
    ) / 6.0 + g_w[None, :]
    dv = dt[:, None] * acc_w
    v_chain = fs.v + jnp.cumsum(dv, axis=0)
    v_prev_chain = jnp.concatenate([fs.v[None], v_chain[:-1]], axis=0)
    dp = dt[:, None] * 0.5 * (v_prev_chain + v_chain)
    p_chain = fs.p + jnp.cumsum(dp, axis=0)
    p_prev_chain = jnp.concatenate([fs.p[None], p_chain[:-1]], axis=0)

    # --- per-slot Phi / Qd (parallel), FEJ nulls lag the estimates ------------
    # The null linearization point for step i is the estimate at the end of
    # the last REAL (dt>0) step before i — or fs.*_null if none has happened
    # yet. The previous-chain value alone is wrong for the first real step
    # when leading slots are no-ops (slot 0 is always the zero-length seed):
    # it would substitute the current ESTIMATE for the first-estimate null,
    # silently defeating FEJ exactly where the post-update estimate/null gap
    # lives (matches _propagate_sequential, which carries the null through
    # no-op slots).
    stepped = dt > 0.0
    real_before = jnp.concatenate(
        [jnp.zeros((1,), bool), jnp.cumsum(stepped.astype(jnp.int32))[:-1] > 0]
    )
    q_prev_for_null = jnp.concatenate([fs.q[None], q_chain[:-1]], axis=0)
    v_prev_for_null = jnp.concatenate([fs.v[None], v_chain[:-1]], axis=0)
    p_prev_for_null = jnp.concatenate([fs.p[None], p_chain[:-1]], axis=0)
    q_null_chain = jnp.where(real_before[:, None], q_prev_for_null, fs.q_null[None, :])
    v_null_chain = jnp.where(real_before[:, None], v_prev_for_null, fs.v_null[None, :])
    p_null_chain = jnp.where(real_before[:, None], p_prev_for_null, fs.p_null[None, :])
    w_hat = 0.5 * (w0 + w1)
    a_hat = 0.5 * (a0 + a1)
    Phi_s, Qd_s = jax.vmap(
        lambda qo, qn, vo, vn, po, pn, qnl, vnl, pnl, wh, ah, d: _phi_and_Q(
            cfg, qo, qn, vo, vn, po, pn, qnl, vnl, pnl, wh, ah, d, dtype
        )
    )(q_prev_chain, q_chain, v_prev_chain, v_chain, p_prev_chain, p_chain,
      q_null_chain, v_null_chain, p_null_chain, w_hat, a_hat, dt)
    eye15 = jnp.eye(IMU_DIM, dtype=dtype)
    noop = (dt <= 0.0)[:, None, None]
    Phi_s = jnp.where(noop, eye15, Phi_s)
    Qd_s = jnp.where(noop, jnp.zeros_like(Qd_s), Qd_s)

    # suffix products S_i = Phi_S ... Phi_{i+1} via a reversed scan
    R_suffix = jax.lax.associative_scan(
        lambda a, b: mm(b, a), Phi_s[::-1]
    )[::-1]  # R_suffix[i] = Phi_S ... Phi_i
    Phi_acc = R_suffix[0]
    S_after = jnp.concatenate([R_suffix[1:], eye15[None]], axis=0)
    Q_acc = jnp.sum(mm(mm(S_after, Qd_s), jnp.swapaxes(S_after, -1, -2)), axis=0)

    P = _apply_frame_transition(
        cfg, fs.P, Phi_acc, Q_acc, _slam_frame_noise(cfg, fs, jnp.sum(dt))
    )

    q_new = quat_normalize(q_chain[-1])
    # State time = the time integration actually REACHED, not the target:
    # under an IMU blackout (no valid slot covers t_target) stamping t_target
    # would silently skip the un-integrated interval — the next frame's
    # start = max(fs.time, ...) must re-cover it (with held IMU), and the
    # vision-time gate (models/msckf.py 2b) must see the lag to drop the
    # mistimed frame's vision.
    t_reached = jnp.maximum(fs.time, jnp.max(jnp.where(imu.valid, t_end, -jnp.inf)))
    return fs.replace(
        q=q_new, v=v_chain[-1], p=p_chain[-1],
        q_null=q_new, v_null=v_chain[-1], p_null=p_chain[-1],
        P=P, time=t_reached,
    )


def _apply_frame_transition(cfg, P, Phi_acc, Q_acc, slam_q=None):
    """P <- diag(Phi,I) P diag(Phi,I)^T + diag(Q,0), in dense or factor form.

    Factor form (sqrt_form): the transition is a row op on the factor
    (S[:15] <- Phi S[:15]); the process noise stacks its own factor as 15
    extra columns. The WIDE (D, D+15) factor is returned as-is — every
    in-frame consumer (cov_diag, gates, augmentation, prune, re-anchor, the
    Gram-form updates) is a row op or Gram product that works at any factor
    width, and the frame's measurement update re-compresses to square via its
    unconditional psd_factor (models/update.py apply_update). Deferring the
    compression drops a full CholeskyQR2 (2 Cholesky custom calls + a blocked
    triangular solve + 2 (D,W) GEMMs) from every frame; the implied
    covariance is unchanged and still PSD by construction.

    ``slam_q`` (optional, (3*max_slam,) per-component std over this frame)
    injects a landmark random walk on the in-state slam rows
    (FilterConfig.slam_process_noise): dense adds slam_q^2 to the slam
    diagonal; sqrt appends one noise column per slam component.
    """
    if cfg.filter.sqrt_form:
        from larvio_tpu.core.linalg import psd_chol

        S = P.at[:IMU_DIM, :].set(mm(Phi_acc, P[:IMU_DIM, :]))
        Lq = psd_chol(Q_acc)
        col = jnp.zeros((S.shape[0], IMU_DIM), S.dtype).at[:IMU_DIM, :].set(Lq)
        S = jnp.concatenate([S, col], axis=1)
        if slam_q is not None:
            n = slam_q.shape[0]
            base = slam_offset(cfg, 0)
            scol = jnp.zeros((S.shape[0], n), S.dtype)
            scol = scol.at[base + jnp.arange(n), jnp.arange(n)].set(slam_q)
            S = jnp.concatenate([S, scol], axis=1)
        return S
    top = mm(Phi_acc, P[:IMU_DIM, :])
    P = P.at[:IMU_DIM, :].set(top)
    P = P.at[:, :IMU_DIM].set(mm(P[:, :IMU_DIM], Phi_acc.T))
    P = P.at[:IMU_DIM, :IMU_DIM].add(Q_acc)
    if slam_q is not None:
        base = slam_offset(cfg, 0)
        idx = base + jnp.arange(slam_q.shape[0])
        P = P.at[idx, idx].add(slam_q**2)
    return symmetrize(P)


def _slam_frame_noise(cfg, fs, dt_frame):
    """(3*max_slam,) per-component random-walk std for this frame, or None.

    Models the slam path's FEJ linearization-error dynamics as an idp random
    walk (FilterConfig.slam_process_noise): a frozen-linearization landmark
    otherwise accumulates information without bound and acts as a too-strong
    long-horizon anchor, which is the measured source of the exact-noise
    horizontal-position overconfidence (ROADMAP #4). alpha/beta (bearing)
    get 0.2x the rho value, matching the promotion gates' sigma ratio
    (slam._MAX_AB_SIGMA=0.05 vs slam_max_init_rho_sigma=0.25).
    """
    spn = cfg.filter.slam_process_noise
    if spn <= 0.0 or cfg.filter.max_slam_features == 0:
        return None
    dtype = fs.P.dtype
    w = jnp.array([0.2, 0.2, 1.0], dtype)
    scale = spn * jnp.sqrt(jnp.clip(dt_frame, 0.0, 1.0)).astype(dtype)
    per_slot = fs.slam.valid.astype(dtype)[:, None] * w[None, :]
    return scale * per_slot.reshape(-1)


def _propagate_sequential(cfg: VioConfig, fs: FilterState, imu: ImuBatch, t_target_img: jnp.ndarray) -> FilterState:
    """Reference sequential implementation — the correctness baseline the
    production parallel path is diffed against
    (tests/test_filter.py::TestPropagationParallelEquivalence: full batch,
    clamped/interpolated endpoint, all-padding no-op, pre-sample target,
    nonzero td, FEJ null offsets)."""
    dtype = fs.P.dtype
    t_target = t_target_img + fs.td

    def step(carry, inp):
        (q, bg, v, ba, p, q_null, v_null, p_null, Phi_acc, Q_acc, t_cur, w_prev, a_prev) = carry
        t_s, w_s, a_s, valid_s = inp

        w0, a0 = w_prev - bg, a_prev - ba
        w1, a1 = w_s - bg, a_s - ba
        # clamp the interval to the propagation target; invalid slots -> dt 0
        t_end = jnp.minimum(t_s, t_target)
        dt = jnp.maximum(t_end - t_cur, 0.0) * valid_s.astype(dtype)
        # interpolate the endpoint IMU sample if the interval was clamped
        frac = jnp.where(t_s > t_cur, (t_end - t_cur) / jnp.maximum(t_s - t_cur, 1e-9), 1.0)
        w1i = w0 + frac * (w1 - w0)
        a1i = a0 + frac * (a1 - a0)

        q_new, v_new, p_new = _rk4_nominal(q, v, p, w0, a0, w1i, a1i, dt, cfg.gravity)
        # FEJ null-state propagation uses the same nominal increments
        q_null_new, v_null_new, p_null_new = q_new, v_new, p_new

        w_hat = 0.5 * (w0 + w1i)
        a_hat = 0.5 * (a0 + a1i)
        Phi, Qd = _phi_and_Q(
            cfg, q, q_new, v, v_new, p, p_new, q_null, v_null, p_null,
            w_hat, a_hat, dt, dtype,
        )

        # masked no-op for padding: dt == 0 => Phi = I, Qd = 0 numerically,
        # but guard explicitly to keep padding exact
        is_noop = dt <= 0.0
        Phi = jnp.where(is_noop, jnp.eye(IMU_DIM, dtype=dtype), Phi)
        Qd = jnp.where(is_noop, jnp.zeros_like(Qd), Qd)
        q_new = jnp.where(is_noop, q, q_new)
        v_new = jnp.where(is_noop, v, v_new)
        p_new = jnp.where(is_noop, p, p_new)

        # accumulate the frame transition instead of touching the big P each
        # sample: Phi_acc <- Phi Phi_acc, Q_acc <- Phi Q_acc Phi^T + Qd.
        # One (15,D) GEMM pair applies the whole frame to P afterwards.
        Phi_acc = mm(Phi, Phi_acc)
        Q_acc = mm(mm(Phi, Q_acc), Phi.T) + Qd

        t_new = jnp.where(valid_s, jnp.maximum(t_cur, t_end), t_cur)
        # FEJ bookkeeping (ref processModel tail): linearization points track
        # the *propagated* estimate; measurement updates later move the
        # estimate but not these.
        carry = (
            q_new, bg, v_new, ba, p_new,
            jnp.where(is_noop, q_null, q_null_new),
            jnp.where(is_noop, v_null, v_null_new),
            jnp.where(is_noop, p_null, p_null_new),
            Phi_acc, Q_acc, t_new, w_s, a_s,
        )
        return carry, None

    # seed the "previous sample" with the first slot's values (zero-length
    # first interval) — matches the reference's use of the buffer's first
    # sample as the interval start.
    w_first = imu.w[0]
    a_first = imu.a[0]
    carry0 = (
        fs.q, fs.bg, fs.v, fs.ba, fs.p,
        fs.q_null, fs.v_null, fs.p_null,
        jnp.eye(IMU_DIM, dtype=dtype), jnp.zeros((IMU_DIM, IMU_DIM), dtype),
        fs.time, w_first, a_first,
    )
    carry, _ = jax.lax.scan(step, carry0, (imu.t, imu.w, imu.a, imu.valid))
    (q, bg, v, ba, p, q_null, v_null, p_null, Phi_acc, Q_acc, t_cur, _, _) = carry

    # apply the accumulated frame transition to the full covariance once:
    # P <- diag(Phi,I) P diag(Phi,I)^T + diag(Q,0)
    P = _apply_frame_transition(
        cfg, fs.P, Phi_acc, Q_acc,
        _slam_frame_noise(cfg, fs, jnp.maximum(t_cur - fs.time, 0.0)),
    )

    return fs.replace(
        q=q, bg=bg, v=v, ba=ba, p=p,
        q_null=q_null, v_null=v_null, p_null=p_null,
        # reached time, not the target (see _propagate_parallel's tail note)
        P=P, time=t_cur,
    )
