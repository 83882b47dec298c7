"""MSCKF measurement model: Jacobians, nullspace projection, gating, update.

Counterpart of ref:src/larvio.cpp measurementJacobian(), featureJacobian(),
gatingTest(), measurementUpdate() (SURVEY.md §3.3). All confirmed stages map
as:

  * per-(feature, clone) Jacobians     -> one vmapped einsum batch
  * left-nullspace projection of H_f   -> 3 masked Householder reflections
    (exactly equivalent to the reference's dynamically-sized projection; see
    core/linalg.householder_eliminate for the padding argument)
  * chi-square gating                  -> weight-zeroing of rejected features
  * Givens/QR measurement compression  -> thin QR of the zero-padded stack
  * EKF update                         -> Joseph form + symmetrization (f32
    health on TPU, SURVEY.md §7 hard part #2)

FEJ: Jacobians are evaluated at the clones' first-estimate (null) poses while
residuals use current estimates (Li & Mourikis FEJ; the reference's "FEJ
handling", BASELINE.json:5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig
from larvio_tpu.core.chi2 import chi2_inv
from larvio_tpu.core.linalg import (
    householder_eliminate,
    inv_quadform,
    joseph_update,
    mm,
    psd_factor,
    qr_compress,
    symmetrize,
)
from larvio_tpu.core.quaternion import quat_multiply, quat_to_rotation, small_angle_quat
from larvio_tpu.core.so3 import skew
from larvio_tpu.models.state import (
    CLONE_BASE,
    CLONE_DIM,
    FilterState,
    IDX_EXT_P,
    IDX_EXT_THETA,
    IDX_TD,
    IMU_DIM,
    state_dim,
)


class FeatureBlock(NamedTuple):
    """One feature's nullspace-projected measurement block.

    ``Rf/H3/r3`` are the three eliminated range-space rows
    (r3 = H3 dx + Rf df + n): discarded for plain MSCKF updates, used for
    exact delayed initialization when the feature is promoted into the state
    (models/slam.py).
    """

    H: jnp.ndarray  # (2C, D) projected Jacobian (rows 0..2 zeroed)
    r: jnp.ndarray  # (2C,) projected residual
    accept: jnp.ndarray  # () bool — triangulation + gating verdict
    Rf: jnp.ndarray  # (3, 3) feature-column factor of the eliminated rows
    H3: jnp.ndarray  # (3, D)
    r3: jnp.ndarray  # (3,)


def _project_jacobian(cfg: VioConfig, fs: FilterState, p_w: jnp.ndarray,
                      uv: jnp.ndarray, row_mask: jnp.ndarray):
    """Dense per-feature Jacobians over all clone slots.

    p_w: (3,) triangulated feature. uv: (C, 2) observations.
    row_mask: (C,) which clone observations
    contribute *rows* (dead-track update: all valid obs; prune update: only
    the clones being removed).
    Returns H_x (2C, D), H_f (2C, 3), r (2C,).
    """
    C = cfg.filter.max_clones
    D = state_dim(cfg)
    dtype = fs.P.dtype
    fej = cfg.filter.use_fej

    R_ci = quat_to_rotation(fs.q_ci)
    # Jacobian linearization poses (FEJ -> clone nulls), residual poses (current)
    q_lin = fs.clones.q_null if fej else fs.clones.q
    p_lin = fs.clones.p_null if fej else fs.clones.p
    R_wi_lin = quat_to_rotation(q_lin)  # (C, 3, 3)
    R_wi_cur = quat_to_rotation(fs.clones.q)
    p_cur = fs.clones.p

    # linearized point in IMU / cam frames
    p_ij = jnp.einsum("nab,nb->na", R_wi_lin, p_w[None, :] - p_lin)  # (C,3)
    p_cj = jnp.einsum("ab,nb->na", R_ci, p_ij) + fs.t_ci  # (C,3)
    # residual point at current estimates
    p_ij_cur = jnp.einsum("nab,nb->na", R_wi_cur, p_w[None, :] - p_cur)
    p_cj_cur = jnp.einsum("ab,nb->na", R_ci, p_ij_cur) + fs.t_ci

    z3 = p_cj[:, 2]
    z3 = jnp.where(jnp.abs(z3) < 1e-6, 1e-6, z3)
    Jpi = jnp.stack(
        [
            jnp.stack([1.0 / z3, jnp.zeros_like(z3), -p_cj[:, 0] / z3**2], axis=-1),
            jnp.stack([jnp.zeros_like(z3), 1.0 / z3, -p_cj[:, 1] / z3**2], axis=-1),
        ],
        axis=1,
    )  # (C, 2, 3)

    JR = jnp.einsum("nij,jk->nik", Jpi, R_ci)  # (C, 2, 3)
    H_theta = jnp.einsum("nij,njk->nik", JR, skew(p_ij))  # (C,2,3)
    H_p = -jnp.einsum("nij,njk->nik", JR, R_wi_lin)  # (C,2,3)
    H_f = -H_p  # dz/dp_w = Jpi R_ci R_wi
    H_ext_theta = jnp.einsum("nij,njk->nik", Jpi, skew(p_cj - fs.t_ci[None, :]))
    H_ext_p = Jpi
    # td enters through the augmentation Jacobian (clone error carries a
    # pose-rate x dtd component, augmentation.py), NOT through a velocity term
    # here: clones are stamped at t_img + td_hat(creation), so a measurement
    # H_td would double-count and turn inconsistent once td_hat evolves.

    # residual at current estimates
    z3c = p_cj_cur[:, 2]
    z3c = jnp.where(jnp.abs(z3c) < 1e-6, 1e-6, z3c)
    pred = p_cj_cur[:, :2] / z3c[:, None]
    r = jnp.where(row_mask[:, None], uv - pred, 0.0)  # (C, 2)

    # assemble dense rows (C, 2, D) by CONCAT, not .at[].set into zeros —
    # the scatter form materializes the zero tensor plus a dynamic-update
    # copy per block (~0.4 ms/frame in the profile)
    if cfg.filter.estimate_extrinsic:
        ext_cols = jnp.concatenate([H_ext_theta, H_ext_p], axis=-1)  # (C,2,6)
    else:
        ext_cols = jnp.zeros((C, 2, 6), dtype)
    # clone blocks: block-diagonal over clone index
    eyeC = jnp.eye(C, dtype=dtype)
    blocks = jnp.concatenate([H_theta, H_p], axis=-1)  # (C, 2, 6)
    clone_cols = jnp.einsum("cik,cd->cidk", blocks, eyeC).reshape(C, 2, C * CLONE_DIM)
    Hrows = jnp.concatenate(
        [
            jnp.zeros((C, 2, IDX_EXT_THETA), dtype),
            ext_cols,
            jnp.zeros((C, 2, CLONE_BASE - IDX_TD), dtype),  # td column
            clone_cols,
            jnp.zeros((C, 2, D - CLONE_BASE - C * CLONE_DIM), dtype),
        ],
        axis=-1,
    )

    Hrows = jnp.where(row_mask[:, None, None], Hrows, 0.0)
    H_f = jnp.where(row_mask[:, None, None], H_f, 0.0)
    return (
        Hrows.reshape(2 * C, D),
        H_f.reshape(2 * C, 3),
        r.reshape(2 * C),
    )


def feature_block(cfg: VioConfig, fs: FilterState, p_w, uv, row_mask, tri_valid) -> FeatureBlock:
    """Build one feature's projected, gated measurement block."""
    C = cfg.filter.max_clones
    sigma2 = jnp.asarray(cfg.noise.observation_noise**2, fs.P.dtype)

    # compact valid clone observations to the front (Householder pivot rows
    # must be valid — core/linalg.householder_eliminate contract)
    order = jnp.argsort(~row_mask, stable=True)  # valid first
    uv_s = uv[order]
    mask_s = row_mask[order]
    # permute rows consistently by expanding the clone permutation to row pairs
    H_x, H_f, r = _project_jacobian(cfg, fs, p_w, uv, row_mask)
    row_perm = (2 * order[:, None] + jnp.arange(2)[None, :]).reshape(-1)
    H_x, H_f, r = H_x[row_perm], H_f[row_perm], r[row_perm]

    H_o, r_o, _, (Rf, H3, r3) = householder_eliminate(H_f, H_x, r, 3)

    # robust (Huber) weighting of the projected rows (ref: huber_epsilon):
    # scale = max(mean |r| over informative rows, observation sigma), rows
    # beyond huber_k*scale downweighted by sqrt(w) on both H and r
    if cfg.filter.huber_k > 0:
        n_inf = jnp.maximum(jnp.sum(jnp.abs(r_o) > 0), 1)
        scale = jnp.maximum(
            jnp.sum(jnp.abs(r_o)) / n_inf, cfg.noise.observation_noise
        )
        w = jnp.minimum(1.0, cfg.filter.huber_k * scale / jnp.maximum(jnp.abs(r_o), 1e-12))
        sw = jnp.sqrt(w)
        H_o = H_o * sw[:, None]
        r_o = r_o * sw

    # chi-square gate (ref:gatingTest): gamma = r^T (H P H^T + s2 I)^-1 r,
    # via the custom-call-free Newton-Schulz quadform (core/linalg.py) — the
    # batched gate Cholesky was the single most expensive custom call in the
    # frame step. In square-root form H P H^T = (H S)(H S)^T is PSD by
    # construction, so the gate system is always legitimately SPD.
    if cfg.filter.sqrt_form:
        T = mm(H_o, fs.P)  # fs.P holds the factor S
        S = mm(T, T.T) + sigma2 * jnp.eye(2 * C, dtype=fs.P.dtype)
    else:
        S = mm(H_o, mm(fs.P, H_o.T)) + sigma2 * jnp.eye(2 * C, dtype=fs.P.dtype)
    gamma = inv_quadform(S, r_o)
    n_obs = jnp.sum(mask_s)
    dof = jnp.maximum(2 * n_obs - 3, 1)
    gate_ok = gamma < chi2_inv(dof, cfg.filter.chi2_confidence)

    accept = tri_valid & gate_ok & (n_obs >= 2)
    H_o = jnp.where(accept, H_o, 0.0)
    r_o = jnp.where(accept, r_o, 0.0)
    return FeatureBlock(H=H_o, r=r_o, accept=accept, Rf=Rf[:, :3], H3=H3, r3=r3)


def prune_feature_block(cfg: VioConfig, fs: FilterState, p_w, uv2, slots, row_ok, tri_valid):
    """Fast path for prune-marginalization features (ref:pruneCamStateBuffer).

    A prune feature contributes exactly the two removed clones' observations
    (4 rows); eliminating the 3 feature columns leaves ONE informative row.
    The general ``feature_block`` pays the full padded (2C, D) Jacobian, a
    (2C, D) Householder sweep and a (2C, 2C) gate Cholesky for it — ~100x the
    algebra actually needed. This builds the 4 rows directly and gates with a
    scalar S (no custom call).

    p_w: (3,), uv2: (2, 2) observations at ``slots`` (shared (2,) slot pair),
    row_ok: (2,) both-clones-valid mask, tri_valid: ().
    Returns (H_row (D,), r_row (), accept ()).
    """
    D = state_dim(cfg)
    dtype = fs.P.dtype
    fej = cfg.filter.use_fej
    sigma2 = jnp.asarray(cfg.noise.observation_noise**2, dtype)

    R_ci = quat_to_rotation(fs.q_ci)
    q_lin = (fs.clones.q_null if fej else fs.clones.q)[slots]  # (2, 4)
    p_lin = (fs.clones.p_null if fej else fs.clones.p)[slots]
    R_wi_lin = quat_to_rotation(q_lin)  # (2, 3, 3)
    R_wi_cur = quat_to_rotation(fs.clones.q[slots])
    p_cur = fs.clones.p[slots]

    p_ij = jnp.einsum("nab,nb->na", R_wi_lin, p_w[None, :] - p_lin)
    p_cj = jnp.einsum("ab,nb->na", R_ci, p_ij) + fs.t_ci
    p_ij_cur = jnp.einsum("nab,nb->na", R_wi_cur, p_w[None, :] - p_cur)
    p_cj_cur = jnp.einsum("ab,nb->na", R_ci, p_ij_cur) + fs.t_ci

    z3 = p_cj[:, 2]
    z3 = jnp.where(jnp.abs(z3) < 1e-6, 1e-6, z3)
    Jpi = jnp.stack(
        [
            jnp.stack([1.0 / z3, jnp.zeros_like(z3), -p_cj[:, 0] / z3**2], axis=-1),
            jnp.stack([jnp.zeros_like(z3), 1.0 / z3, -p_cj[:, 1] / z3**2], axis=-1),
        ],
        axis=1,
    )  # (2, 2, 3)
    JR = jnp.einsum("nij,jk->nik", Jpi, R_ci)
    H_theta = jnp.einsum("nij,njk->nik", JR, skew(p_ij))  # (2,2,3)
    H_p = -jnp.einsum("nij,njk->nik", JR, R_wi_lin)
    H_f = -H_p  # (2,2,3)

    z3c = p_cj_cur[:, 2]
    z3c = jnp.where(jnp.abs(z3c) < 1e-6, 1e-6, z3c)
    pred = p_cj_cur[:, :2] / z3c[:, None]
    r = jnp.where(row_ok[:, None], uv2 - pred, 0.0).reshape(4)

    # dense (2, 2, D) rows: ext cols + one clone block each, then mask
    if cfg.filter.estimate_extrinsic:
        H_ext_theta = jnp.einsum("nij,njk->nik", Jpi, skew(p_cj - fs.t_ci[None, :]))
        ext_cols = jnp.concatenate([H_ext_theta, Jpi], axis=-1)  # (2,2,6)
    else:
        ext_cols = jnp.zeros((2, 2, 6), dtype)
    rows = jnp.zeros((2, 2, D), dtype)
    rows = jax.lax.dynamic_update_slice(rows, ext_cols, (0, 0, IDX_EXT_THETA))
    block = jnp.concatenate([H_theta, H_p], axis=-1)  # (2, 2, 6)
    off = CLONE_BASE + slots * CLONE_DIM  # (2,)
    rows = rows.at[0].set(
        jax.lax.dynamic_update_slice(rows[0], block[0], (0, off[0]))
    )
    rows = rows.at[1].set(
        jax.lax.dynamic_update_slice(rows[1], block[1], (0, off[1]))
    )
    rows = jnp.where(row_ok[:, None, None], rows, 0.0).reshape(4, D)
    H_f4 = jnp.where(row_ok[:, None, None], H_f, 0.0).reshape(4, 3)

    H_o, r_o, _, _ = householder_eliminate(H_f4, rows, r, 3)
    H_row, r_row = H_o[3], r_o[3]

    # scalar chi2 gate (dof = 2*2 - 3 = 1)
    if cfg.filter.sqrt_form:
        Sh = mm(H_row[None, :], fs.P)[0]  # H S: (D,) in factor basis
        s = jnp.dot(Sh, Sh) + sigma2
    else:
        s = jnp.dot(H_row, mm(fs.P, H_row[:, None])[:, 0]) + sigma2
    gamma = r_row * r_row / s
    gate_ok = gamma < chi2_inv(jnp.asarray(1), cfg.filter.chi2_confidence)
    accept = tri_valid & gate_ok & row_ok.all()
    H_row = jnp.where(accept, H_row, 0.0)
    r_row = jnp.where(accept, r_row, 0.0)
    return H_row, r_row, accept


def sqrt_update(S, H, r):
    """EKF update on the covariance FACTOR (P = S S^T), whitened rows (R = I).

    The Joseph form P' = (I-KH) P (I-KH)^T + K R K^T is, in factor language,
    P' = M M^T with M = [(I-KH) S, K] = [S - K (H S), K] — stacking instead of
    multiply-and-add means nothing is ever SUBTRACTED from P, so the f32
    collapse class (catastrophic cancellation driving diag(P) negative under
    tightly-modeled noise) cannot occur: psd_factor re-compresses M into a
    square factor whose implied covariance is PSD by construction.

    Returns (dx, S_new). H: (n, D), r: (n,).
    """
    T = mm(H, S)  # (n, D) — H in the factor basis
    n = H.shape[0]
    Sy = mm(T, T.T) + jnp.eye(n, dtype=S.dtype)
    chol = jax.lax.linalg.cholesky(symmetrize(Sy))
    PHt = mm(S, T.T)  # (D, n)
    K = jax.scipy.linalg.cho_solve((chol, True), PHt.T).T  # (D, n)
    dx = mm(K, r[:, None])[:, 0]
    M = jnp.concatenate([S - mm(K, T), K], axis=1)  # (D, D+n)
    return dx, psd_factor(M)


def sqrt_update_gram(S, Hw, rw, refactor: bool):
    """Woodbury/information-form factor update for TALL whitened stacks (n > D).

    With T = Hw S and A = I_D + T^T T, the Woodbury identity collapses the
    optimal gain and covariance to

        K  = S A^{-1} T^T,          dx = S A^{-1} (T^T rw),
        P' = S A^{-1} S^T     =>    S' = S L^{-T}  with  A = L L^T.

    ONE Cholesky (of a matrix whose spectrum is floored at 1 by the +I) plus
    GEMMs replaces the qr_compress (2 chols + an N-wide triangular solve) ->
    innovation chol -> psd_factor (2 chols) chain of the compress-then-update
    path — algebraically the same update (the compression Q factor cancels
    inside A), and still PSD by construction (P' is a congruence of A^{-1}).

    f32 note: forming the Gram T^T T squares cond(T), but unlike the
    orthonormalization use-case (see qr_compress's Gram-domain warning) the +I
    floor makes that harmless here — directions whose information lands below
    the unit noise floor are barely updated, so their relative Gram error
    cannot surface. Directions far above the floor carry ~1e-7 relative error,
    the same as any f32 GEMM. Parity with the stacked-Joseph and dense-Joseph
    paths (dx and implied covariance, tall + padded systems) is unit-pinned by
    tests/test_gram_update.py; end-to-end trajectory parity by
    tests/test_sqrt_filter.py.

    refactor=True re-triangularizes through psd_factor: slam promotion writes
    measurement-noise factor blocks into freed slots' columns and requires
    them structurally zero (models/slam.py promote_features), which only the
    Jacobi-normalized Cholesky factor guarantees. The production caller
    (apply_update) always passes False and applies psd_factor itself AFTER
    its finite/enable selects — so the rejection fallback is refactored too
    and the propagation-wide factor (see _apply_frame_transition) is squared
    exactly once per frame; the parameter is kept for direct/unit-test use.
    """
    D, W = S.shape  # W > D when the factor is still propagation-wide
    T = mm(Hw, S)  # (n, W) — whitened rows in the factor basis
    A = symmetrize(mm(T.T, T)) + jnp.eye(W, dtype=S.dtype)
    L = jax.lax.linalg.cholesky(A)
    g = mm(T.T, rw[:, None])  # (W, 1)
    # ONE triangular solve with a combined RHS: L^{-1} [S^T | g] gives both
    # Sn = S L^{-T} = (L^{-1} S^T)^T and z = L^{-1} g, and
    # dx = S A^{-1} g = S L^{-T} (L^{-1} g) = Sn z — the second solve of the
    # former cho_solve pair is algebraically redundant (each triangular-solve
    # call costs a blocked InvertDiagBlocks custom-call chain on TPU).
    Y = jax.scipy.linalg.solve_triangular(
        L, jnp.concatenate([S.T, g], axis=1), lower=True
    )  # (W, D+1) — W == D for a square factor, D+15 propagation-wide.
    # Perf note: for D < n < W the (W, W) Gram chol here is slightly larger
    # than the (n, n) innovation chol would be; that window is only the 15
    # propagation columns wide and the innovation path would pay an extra
    # psd_factor, so the branch in apply_update intentionally stays at n > D.
    Sn = Y[:, :D].T
    dx = mm(Sn, Y[:, D:])[:, 0]
    # a NaN factorization (cannot happen for finite inputs — A >= I — but a
    # NaN-poisoned stack propagates) is contained by apply_update's
    # finite-guard, which rejects the whole update.
    if refactor:
        Sn = psd_factor(Sn)
    return dx, Sn


def apply_update(cfg: VioConfig, fs: FilterState, H: jnp.ndarray, r: jnp.ndarray,
                 noise_var, enable=None, refactor: bool = True):
    """Compressed EKF update + error injection into the nominal state.

    H: (N, D) stacked (zero rows = padding), r: (N,). ``enable`` (scalar bool)
    turns the whole update into a no-op while keeping one compiled trace.
    ``refactor`` (sqrt path only): see sqrt_update_gram — callers whose output
    factor is re-factored later the same frame pass False.
    Returns (new_state, dx, ok) — dx feeds delayed feature initialization;
    ``ok`` is the finite-guard verdict: False means the computed update was
    numerically broken and was REJECTED wholesale (state unchanged). Consumers
    that rely on the update having actually been applied — slam promotion
    reads the posterior factor's column structure and conditions on dx —
    must gate on it.
    """
    D = state_dim(cfg)
    # whiten per-row noise so QR row-mixing keeps R = I (required: compression
    # is only noise-preserving for iid rows)
    n = H.shape[0]
    sig = jnp.sqrt(jnp.broadcast_to(jnp.asarray(noise_var, fs.P.dtype), (n,)))
    Hw = H / sig[:, None]
    rw = r / sig
    if cfg.filter.sqrt_form:
        if n > D:
            # tall stack: Woodbury/Gram form — one chol, no explicit
            # compression. The refactor runs BELOW, after the finite/enable
            # selects: (a) the rejection fallback fs.P is then refactored too,
            # making promote_features' freed-column-zero invariant hold even
            # on a rejected update (ADVICE r3 #1), and (b) when fs.P is still
            # propagation-wide (D, W>D), the fallback and the update output
            # have the same wide shape and ONE psd_factor squares either.
            dx, P_new = sqrt_update_gram(fs.P, Hw, rw, refactor=False)
        else:
            # small system (e.g. the 9-row ZUPT): the (n, n) innovation chol
            # is cheaper than the (D, D) Gram chol. sqrt_update returns a
            # SQUARE factor; when the input was still propagation-wide, pad
            # with zero columns (implied covariance unchanged) so the
            # fallback select below stays shape-consistent.
            dx, P_new = sqrt_update(fs.P, Hw, rw)
            if fs.P.shape[1] > D:
                P_new = jnp.pad(P_new, ((0, 0), (0, fs.P.shape[1] - D)))
    else:
        if n > D:
            # QR compression to D rows (ref: Givens/QR measurement compression)
            H_c, r_c = qr_compress(Hw, rw)
        else:
            # already at/below state dim: compression would EXPAND the system
            # to D rows — use the whitened rows directly
            H_c, r_c = Hw, rw
        dx, P_new = joseph_update(fs.P, H_c, r_c, 1.0)
    # NaN containment (SURVEY.md §5 failure detection): a numerically broken
    # update must not poison the state — reject it wholesale and let the
    # online-reset guard decide if the filter needs reinitialization. Also
    # keeps one diverged vmap lane from corrupting a fleet batch.
    finite = jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(P_new))
    dx = jnp.where(finite, dx, 0.0)
    P_new = jnp.where(finite, P_new, fs.P)
    if enable is not None:
        dx = jnp.where(enable, dx, 0.0)
        P_new = jnp.where(enable, P_new, fs.P)
    if cfg.filter.sqrt_form and refactor and (n > D or P_new.shape[1] > D):
        # square the (possibly wide, possibly fallback) factor exactly once
        # per frame — the ONLY CholeskyQR2 on the hot path (propagation defers
        # its compression here; see _apply_frame_transition). Skipped when the
        # factor is already square (ZUPT path): sqrt_update refactors
        # internally and a square fallback was refactored by the frame's
        # earlier update.
        from larvio_tpu.core.linalg import psd_factor

        P_new = psd_factor(P_new)
    return inject_error(cfg, fs, dx).replace(P=P_new), dx, finite


def inject_error(cfg: VioConfig, fs: FilterState, dx: jnp.ndarray) -> FilterState:
    """Apply an error-state correction to the nominal state (masked slots)."""
    C = cfg.filter.max_clones
    S = cfg.filter.max_slam_features
    q = quat_multiply(small_angle_quat(dx[0:3]), fs.q)
    bg = fs.bg + dx[3:6]
    v = fs.v + dx[6:9]
    ba = fs.ba + dx[9:12]
    p = fs.p + dx[12:15]
    q_ci = quat_multiply(small_angle_quat(dx[IDX_EXT_THETA:IDX_EXT_THETA + 3]), fs.q_ci)
    t_ci = fs.t_ci + dx[IDX_EXT_P:IDX_EXT_P + 3]
    td = fs.td + dx[IDX_TD]

    dclone = dx[CLONE_BASE:CLONE_BASE + C * CLONE_DIM].reshape(C, CLONE_DIM)
    dtheta_c = jnp.where(fs.clones.valid[:, None], dclone[:, 0:3], 0.0)
    dp_c = jnp.where(fs.clones.valid[:, None], dclone[:, 3:6], 0.0)
    clones = fs.clones.replace(
        q=jax.vmap(lambda d, qq: quat_multiply(small_angle_quat(d), qq))(dtheta_c, fs.clones.q),
        p=fs.clones.p + dp_c,
    )
    slam = fs.slam
    if S > 0:
        base = CLONE_BASE + C * CLONE_DIM
        dslam = dx[base : base + S * 3].reshape(S, 3)
        slam = slam.replace(
            idp=slam.idp + jnp.where(slam.valid[:, None], dslam, 0.0)
        )
    return fs.replace(
        q=q, bg=bg, v=v, ba=ba, p=p, q_ci=q_ci, t_ci=t_ci, td=td,
        clones=clones, slam=slam,
    )
