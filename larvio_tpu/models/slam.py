"""In-state SLAM features: the hybrid part of the hybrid MSCKF.

Counterpart of the reference's SLAM-feature path (ref:src/larvio.cpp —
"hybrid SLAM-feature updates" confirmed at BASELINE.json:5; the hybrid
EKF-SLAM/MSCKF estimator after Mingyang Li, SURVEY.md §0/§3.3):

  * long-surviving tracks are **promoted** into the state: their
    accumulated observation window is consumed by one MSCKF-style
    marginalized update (so no history is wasted), then the feature enters
    the state with an EXACT conditional initialization from the window's
    eliminated range-space rows;
  * while tracked, a slam feature gets a cheap 2-row EKF update per frame
    against the newest clone (no window accumulation, no re-triangulation
    — this is what makes long tracks cheap in the hybrid filter);
  * on track death or persistent gating failure the feature is dropped and
    its covariance rows are zeroed (slot recycled).

Feature error state: **anchored inverse depth** [alpha, beta, rho] — the
normalized image coordinates and inverse depth of the feature in the anchor
clone's camera frame (the reference's parameterization, SURVEY.md §2 "State
vector layout"):

    p_w = p_A + R_A^T R_ci^T ([alpha, beta, 1]/rho - t_ci)

where (q_A, p_A) is the anchor clone's IMU pose and (R_ci, t_ci) the
camera-IMU extrinsic. Inverse depth conditions distant features gracefully
(rho -> 0 stays finite and well-scaled where world-xyz depth variance blows
up quadratically), which is what lets promotion engage at default thresholds.
When the anchor clone is pruned, the feature is **re-anchored** to the newest
surviving clone with an exact first-order covariance transform (same move as
the reference family's anchor change), so slam features outlive the clone
window — the whole point of the hybrid filter.

FEJ: Jacobians use idp_null + the anchor/observer clones' null poses;
residuals use current estimates. Re-anchoring restarts the feature's
linearization point at the current estimate (standard, documented FEJ
discontinuity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig
from larvio_tpu.core.chi2 import chi2_inv
from larvio_tpu.core.linalg import inv3, mm
from larvio_tpu.core.quaternion import quat_to_rotation
from larvio_tpu.core.so3 import skew
from larvio_tpu.models.state import (
    CLONE_BASE,
    CLONE_DIM,
    FilterState,
    IDX_EXT_P,
    IDX_EXT_THETA,
    SLAM_DIM,
    clone_offset,
    cov_diag,
    slam_offset,
    state_dim,
)

# promotion gate on the init uncertainty of the bearing part (normalized
# image units); the inverse-depth gate is configurable (slam_max_init_rho_sigma)
_MAX_AB_SIGMA = 0.05


def slam_owned_rows(cfg: VioConfig, fs: FilterState) -> jnp.ndarray:
    """(F,) mask: front-end rows whose track is an in-state slam feature."""
    if cfg.filter.max_slam_features == 0:
        return jnp.zeros(fs.obs.track_id.shape[0], bool)
    eq = fs.slam.track_id[:, None] == fs.obs.track_id[None, :]  # (S, F)
    eq = eq & fs.slam.valid[:, None] & (fs.obs.track_id >= 0)[None, :]
    return jnp.any(eq, axis=0)


def _ray(idp):
    """[alpha, beta, 1] homogeneous anchor-camera ray(s). idp: (..., 3)."""
    return jnp.concatenate(
        [idp[..., :2], jnp.ones((*idp.shape[:-1], 1), idp.dtype)], axis=-1
    )


def _anchor_rotations(fs: FilterState, fej: bool):
    """(S,3,3) world->IMU rotations and (S,3) positions of each anchor."""
    a = jnp.clip(fs.slam.anchor_slot, 0, fs.clones.q.shape[0] - 1)
    q = (fs.clones.q_null if fej else fs.clones.q)[a]
    p = (fs.clones.p_null if fej else fs.clones.p)[a]
    return quat_to_rotation(q), p


def slam_world_points(cfg: VioConfig, fs: FilterState, fej: bool = False):
    """(S, 3) world positions implied by the anchored inverse-depth states."""
    R_A, p_A = _anchor_rotations(fs, fej)
    R_ci = quat_to_rotation(fs.q_ci)
    idp = fs.slam.idp_null if fej else fs.slam.idp
    rho = jnp.where(jnp.abs(idp[:, 2]) < 1e-8, 1e-8, idp[:, 2])
    w = _ray(idp) / rho[:, None] - fs.t_ci[None, :]  # (S,3) cam-frame offset
    # R_ci^T w == w @ R_ci; then rotate by R_A^T (anchor IMU -> world)
    return p_A + jnp.einsum("sab,sb->sa", jnp.transpose(R_A, (0, 2, 1)), w @ R_ci)


def _world_point_and_jac(idp, R_A, p_A, R_ci, t_ci):
    """p_w plus Jacobians wrt idp, anchor pose, extrinsic. Batched over S.

    Conventions (JPL left errors): R_true = (I - [dtheta]x) R_hat for both
    clone and extrinsic rotations, so R^T_true = R_hat^T (I + [dtheta]x).
    """
    rho = jnp.where(jnp.abs(idp[:, 2]) < 1e-8, 1e-8, idp[:, 2])
    m = _ray(idp)  # (S,3)
    w = m / rho[:, None] - t_ci[None, :]  # (S,3) in cam frame
    RAT = jnp.transpose(R_A, (0, 2, 1))  # (S,3,3) anchor IMU->world
    u = w @ R_ci  # == R_ci^T w
    p_w = p_A + jnp.einsum("sab,sb->sa", RAT, u)

    # d(m/rho)/d idp
    z = jnp.zeros_like(rho)
    inv = 1.0 / rho
    M = jnp.stack(
        [
            jnp.stack([inv, z, -idp[:, 0] * inv**2], axis=-1),
            jnp.stack([z, inv, -idp[:, 1] * inv**2], axis=-1),
            jnp.stack([z, z, -(inv**2)], axis=-1),
        ],
        axis=1,
    )  # (S,3,3)
    W = jnp.einsum("sab,cb->sac", RAT, R_ci)  # (S,3,3) = R_A^T R_ci^T
    J_idp = jnp.einsum("sab,sbc->sac", W, M)
    J_thA = -jnp.einsum("sab,sbc->sac", RAT, skew(u))  # d p_w / d dtheta_A
    # extrinsic: d p_w = R_A^T R_ci^T (-[w]x dphi - dt_ci)
    J_phi = -jnp.einsum("sab,sbc->sac", W, skew(w))
    J_tci = -W
    return p_w, J_idp, J_thA, J_phi, J_tci, W


def slam_measurement_blocks(cfg: VioConfig, fs: FilterState, feats, newest_slot):
    """2 rows per tracked slam feature against this frame's clone.

    Returns (H (2S, D), r (2S,), accept (S,), gate_fail_hard (S,)).
    """
    S = cfg.filter.max_slam_features
    D = state_dim(cfg)
    dtype = fs.P.dtype
    if S == 0:
        return jnp.zeros((0, D), dtype), jnp.zeros((0,), dtype), jnp.zeros((0,), bool), jnp.zeros((0,), bool)
    sigma2 = jnp.asarray(cfg.noise.observation_noise**2, dtype)
    fej = cfg.filter.use_fej
    C = cfg.filter.max_clones

    # measurement for each slam feature: the front-end slot it owns
    slot = fs.slam.track_slot  # (S,)
    slot_c = jnp.clip(slot, 0, feats.uv.shape[0] - 1)
    z = feats.uv[slot_c]  # (S, 2)
    tracked = (
        fs.slam.valid
        & (slot >= 0)
        & feats.valid[slot_c]
        & (feats.ids[slot_c] == fs.slam.track_id)
    )

    q_lin = fs.clones.q_null if fej else fs.clones.q
    p_lin = fs.clones.p_null if fej else fs.clones.p
    R_wi_lin = quat_to_rotation(q_lin[newest_slot])
    R_wi_cur = quat_to_rotation(fs.clones.q[newest_slot])
    p_i_lin = p_lin[newest_slot]
    p_i_cur = fs.clones.p[newest_slot]
    R_ci = quat_to_rotation(fs.q_ci)

    # linearized world points + anchored-idp Jacobians (FEJ values)
    R_A_lin, p_A_lin = _anchor_rotations(fs, fej)
    idp_lin = fs.slam.idp_null if fej else fs.slam.idp
    p_f, J_idp, J_thA, J_phi, J_tci, _ = _world_point_and_jac(
        idp_lin, R_A_lin, p_A_lin, R_ci, fs.t_ci
    )
    # residual world points at current estimates
    p_f_cur = slam_world_points(cfg, fs, fej=False)

    p_ij = jnp.einsum("ab,sb->sa", R_wi_lin, p_f - p_i_lin[None, :])
    p_cj = jnp.einsum("ab,sb->sa", R_ci, p_ij) + fs.t_ci
    p_ij_cur = jnp.einsum("ab,sb->sa", R_wi_cur, p_f_cur - p_i_cur[None, :])
    p_cj_cur = jnp.einsum("ab,sb->sa", R_ci, p_ij_cur) + fs.t_ci

    z3 = jnp.where(jnp.abs(p_cj[:, 2]) < 1e-6, 1e-6, p_cj[:, 2])
    Jpi = jnp.stack(
        [
            jnp.stack([1.0 / z3, jnp.zeros_like(z3), -p_cj[:, 0] / z3**2], axis=-1),
            jnp.stack([jnp.zeros_like(z3), 1.0 / z3, -p_cj[:, 1] / z3**2], axis=-1),
        ],
        axis=1,
    )  # (S, 2, 3)
    JR = jnp.einsum("sij,jk->sik", Jpi, R_ci)
    B = jnp.einsum("sij,jk->sik", JR, R_wi_lin)  # (S,2,3) dz/dp_w chain
    # observer-clone terms (same form as the MSCKF measurement model)
    H_theta = jnp.einsum("sij,sjk->sik", JR, skew(p_ij))
    H_p_obs = -B
    # anchor-clone terms through the anchored point
    H_thA = jnp.einsum("sij,sjk->sik", B, J_thA)
    H_pA = B  # d p_w / d p_A = I
    # feature (idp) columns
    H_f = jnp.einsum("sij,sjk->sik", B, J_idp)
    # extrinsic: observer-side terms + anchor-side chain terms
    H_ext_theta = jnp.einsum("sij,sjk->sik", Jpi, skew(p_cj - fs.t_ci[None, :])) + jnp.einsum(
        "sij,sjk->sik", B, J_phi
    )
    H_ext_p = Jpi + jnp.einsum("sij,sjk->sik", B, J_tci)

    z3c = jnp.where(jnp.abs(p_cj_cur[:, 2]) < 1e-6, 1e-6, p_cj_cur[:, 2])
    pred = p_cj_cur[:, :2] / z3c[:, None]
    in_front = p_cj_cur[:, 2] > 0.1
    anchor_ok = fs.clones.valid[jnp.clip(fs.slam.anchor_slot, 0, C - 1)] & (
        fs.slam.anchor_slot >= 0
    )
    r = jnp.where((tracked & in_front)[:, None], z - pred, 0.0)  # (S, 2)

    # assemble rows: observer clone block, anchor clone block (ADDED — anchor
    # may coincide with the observer), extrinsic, own idp block
    # clone-window columns built BATCHED — the former vmapped
    # dynamic_update_slice pair lowered to a 12-iteration while loop of full
    # (S,2,D) copies (~70 us/frame of pure serialization). The observer
    # offset is shared (one 3-D update); the per-feature anchor block scatters
    # through a one-hot einsum (S·2·6·C flops — trivial, fully parallel).
    H = jnp.zeros((S, 2, D), dtype)
    off_obs = CLONE_BASE + CLONE_DIM * newest_slot
    obs_block = jnp.concatenate([H_theta, H_p_obs], axis=-1)  # (S,2,6)
    H = jax.lax.dynamic_update_slice(H, obs_block, (0, 0, off_obs))
    anc_block = jnp.concatenate([H_thA, H_pA], axis=-1)  # (S,2,6)
    anc_onehot = jax.nn.one_hot(
        jnp.clip(fs.slam.anchor_slot, 0, C - 1), C, dtype=dtype
    )  # (S, C)
    anc_cols = jnp.einsum("sij,sc->sicj", anc_block, anc_onehot).reshape(
        S, 2, C * CLONE_DIM
    )
    H = H.at[:, :, CLONE_BASE : CLONE_BASE + C * CLONE_DIM].add(anc_cols)
    if cfg.filter.estimate_extrinsic:
        H = H.at[:, :, IDX_EXT_THETA:IDX_EXT_THETA + 3].set(H_ext_theta)
        H = H.at[:, :, IDX_EXT_P:IDX_EXT_P + 3].set(H_ext_p)
    base = slam_offset(cfg, 0)
    eyeS = jnp.eye(S, dtype=dtype)
    fcols = jnp.einsum("sik,st->sitk", H_f, eyeS).reshape(S, 2, S * SLAM_DIM)
    H = H.at[:, :, base : base + S * SLAM_DIM].set(fcols)

    use = tracked & in_front & anchor_ok
    H = jnp.where(use[:, None, None], H, 0.0)

    # chi2 gate (2 dof) per feature
    Hf2 = H.reshape(S, 2, D)
    if cfg.filter.sqrt_form:
        # H P H^T = (H S)(H S)^T — PSD by construction in factor form
        HS = jnp.einsum("sid,de->sie", Hf2, fs.P)
        Svar = jnp.einsum("sie,sje->sij", HS, HS) + sigma2 * jnp.eye(2, dtype=dtype)
    else:
        Svar = jnp.einsum("sid,de,sje->sij", Hf2, fs.P, Hf2) + sigma2 * jnp.eye(2, dtype=dtype)
    # closed-form 2x2 inverse (batched LU custom-calls are pure overhead here)
    det = Svar[:, 0, 0] * Svar[:, 1, 1] - Svar[:, 0, 1] * Svar[:, 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    gamma = (
        Svar[:, 1, 1] * r[:, 0] ** 2
        - (Svar[:, 0, 1] + Svar[:, 1, 0]) * r[:, 0] * r[:, 1]
        + Svar[:, 0, 0] * r[:, 1] ** 2
    ) / det
    # an indefinite innovation covariance (gamma < 0 or non-finite) means the
    # feature's covariance block has gone numerically bad: hard-fail it
    bad = ~jnp.isfinite(gamma) | (gamma < 0.0)
    gate = chi2_inv(jnp.full((S,), 2, jnp.int32), cfg.filter.chi2_confidence)
    accept = use & (gamma < gate) & ~bad
    hard_fail = use & ((gamma > 5.0 * gate) | bad)

    H = jnp.where(accept[:, None, None], H, 0.0)
    r = jnp.where(accept[:, None], r, 0.0)
    return H.reshape(2 * S, D), r.reshape(2 * S), accept, hard_fail


def _idp_of_world(p_w, R_A, p_A, R_ci, t_ci):
    """[alpha, beta, rho] of world point(s) in the anchor camera. Batched."""
    pc = jnp.einsum("ab,sb->sa", R_ci, jnp.einsum("sab,sb->sa", R_A, p_w - p_A)) + t_ci
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-8, 1e-8, pc[:, 2])
    return jnp.stack([pc[:, 0] / z, pc[:, 1] / z, 1.0 / z], axis=-1), pc[:, 2]


def promote_features(cfg: VioConfig, fs: FilterState, blocks, tri, idx, sel, dx,
                     anchor_slot) -> FilterState:
    """Promote consumed candidates into free slam slots — exact delayed init.

    Each candidate's observation window was split by the Householder
    elimination (update.feature_block) into a nullspace part (already applied
    in the stacked update that produced ``dx`` and the posterior ``fs.P``)
    and three range-space rows

        r3 = H3 dx + Rf df + n,   n ~ N(0, sigma^2 I),

    where df is the feature's WORLD-position error. Conditioning on the
    posterior gives the exact joint initialization (Li & Mourikis-style):

        df_hat = Rf^-1 (r3 - H3 dx_hat)
        P_ff   = Rf^-1 (H3 P+ H3^T + sigma^2 I) Rf^-T
        P_fx   = -Rf^-1 H3 P+

    The stored state is anchored inverse depth at ``anchor_slot`` (the newest
    clone). The idp error relates to the world error by

        df = J_idp d_idp + J_thA dtheta_A + dp_A + J_phi dphi + J_tci dt_ci

    so  d_idp = J_idp^-1 (df - A dx_ae)  with A = [J_thA, I, J_phi, J_tci]
    against the stacked [anchor(6); extrinsic(6)] columns, giving

        P_idp,x   = T (P_fx - A P[ae,:])         T = J_idp^-1
        P_idp,idp = T (P_ff - P_fx[:,ae] A^T - A P_fx[:,ae]^T
                       + A P[ae,ae] A^T) T^T
    """
    S = cfg.filter.max_slam_features
    if S == 0:
        return fs
    # candidate-batch length: may exceed the slot budget when bootstrap mode
    # widens the consume channel (msckf._consume_blocks, bootstrap_consume_k)
    # — extra consumed windows retire with their MSCKF update applied but can
    # only be installed while free slots remain (the take/cumsum cap below)
    K = sel.shape[0]
    obs = fs.obs
    C = cfg.filter.max_clones
    # promotion-INIT noise floor: the delayed-init covariance scales with the
    # modeled observation noise, but a fresh landmark's true error also
    # carries triangulation-linearization bias that does not shrink with the
    # sensor noise. With tightly-modeled noise (e.g. 0.002 exactly matching
    # the sensor) the init is ~25x overconfident and the subsequent slam
    # updates pin the state to biased landmarks — isolated as THE driver of
    # the ~1 m bootstrap-phase drift at exact noise (S=0 runs stay at 7 cm;
    # FEJ on/off irrelevant). The floor only affects the landmark's initial
    # uncertainty — steady-state measurement weighting is untouched, and at
    # the conservative default (0.035) the floor is inactive.
    sigma2 = jnp.asarray(
        max(cfg.noise.observation_noise, cfg.filter.slam_init_noise_floor) ** 2,
        fs.P.dtype,
    )
    D = state_dim(cfg)
    dtype = fs.P.dtype

    R_ci = quat_to_rotation(fs.q_ci)
    a_slot = jnp.clip(anchor_slot, 0, C - 1)
    R_Aq = quat_to_rotation(fs.clones.q[a_slot])
    p_Aq = fs.clones.p[a_slot]
    ao = clone_offset(a_slot)

    # per-candidate conditional init (vmapped pre-pass); the conditioning
    # columns are the stacked [anchor(6); extrinsic(6)] block
    P_a_rows = jax.lax.dynamic_slice(fs.P, (ao, 0), (CLONE_DIM, D))  # (6,D)
    P_e_rows = fs.P[IDX_EXT_THETA : IDX_EXT_THETA + 6, :]  # (6,D)
    P_ae_rows = jnp.concatenate([P_a_rows, P_e_rows], axis=0)  # (12,D)
    P_aaee = jnp.concatenate(
        [
            jax.lax.dynamic_slice(P_ae_rows, (0, ao), (12, CLONE_DIM)),
            P_ae_rows[:, IDX_EXT_THETA : IDX_EXT_THETA + 6],
        ],
        axis=1,
    )  # (12,12)

    def init_of(k):
        Rf = blocks.Rf[k] + 1e-9 * jnp.eye(3, dtype=dtype)
        H3 = blocks.H3[k]
        r3 = blocks.r3[k]
        rhs = r3 - mm(H3, dx[:, None])[:, 0]
        df = jax.scipy.linalg.solve_triangular(Rf, rhs[:, None], lower=False)[:, 0]
        E = jax.scipy.linalg.solve_triangular(Rf, H3, lower=False)  # (3,D)
        # dense: P_fx = -E P. sqrt: fs.P holds the factor S, so the SAME
        # expression yields the feature's factor rows -E S (P_fx S^T = -E P).
        P_fx = -mm(E, fs.P)  # (3, D)
        RfinvT = jax.scipy.linalg.solve_triangular(
            Rf, jnp.eye(3, dtype=dtype), lower=False
        )  # Rf^-1
        if cfg.filter.sqrt_form:
            P_ff = mm(P_fx, P_fx.T) + sigma2 * mm(RfinvT, RfinvT.T)
        else:
            P_ff = -mm(P_fx, E.T) + sigma2 * mm(RfinvT, RfinvT.T)
        P_ff = 0.5 * (P_ff + P_ff.T)

        # world -> anchored-idp error transform. The anchored point depends on
        # the anchor pose AND the camera-IMU extrinsic:
        #   df = J_idp d_idp + [J_thA, I] dx_anchor + [J_phi, J_tci] dx_ext
        # so the init conditions on the stacked 12 columns [anchor(6); ext(6)]
        # (the extrinsic cross-terms were formerly neglected — ROADMAP r2 #4).
        p_init = tri.p_w[k] + df
        idp_hat, zA = _idp_of_world(
            p_init[None], R_Aq[None], p_Aq[None], R_ci, fs.t_ci
        )
        idp_hat, zA = idp_hat[0], zA[0]
        _, J_idp, J_thA, J_phi, J_tci, _ = _world_point_and_jac(
            idp_hat[None], R_Aq[None], p_Aq[None], R_ci, fs.t_ci
        )
        J_idp, J_thA = J_idp[0], J_thA[0]
        A12 = jnp.concatenate(
            [J_thA, jnp.eye(3, dtype=dtype), J_phi[0], J_tci[0]], axis=1
        )  # (3,12) against rows [anchor(6); ext(6)]
        T = inv3(J_idp)
        # P_idp_x: dense rows T(P_fx - A12 P_ae) of the covariance — or, in
        # sqrt mode, the feature's FACTOR rows (P_fx/P_ae_rows are then factor
        # rows and the identical congruence applies in the factor basis)
        P_idp_x = mm(T, P_fx - mm(A12, P_ae_rows))  # (3,D)
        W = mm(T, RfinvT)  # noise-injection factor (sqrt of sigma2 W W^T)
        if cfg.filter.sqrt_form:
            P_idp = mm(P_idp_x, P_idp_x.T) + sigma2 * mm(W, W.T)
        else:
            P_fae = jnp.concatenate(
                [
                    jax.lax.dynamic_slice(P_fx, (0, ao), (3, CLONE_DIM)),
                    P_fx[:, IDX_EXT_THETA : IDX_EXT_THETA + 6],
                ],
                axis=1,
            )  # (3,12)
            core = (
                P_ff - mm(P_fae, A12.T) - mm(A12, P_fae.T)
                + mm(A12, mm(P_aaee, A12.T))
            )
            P_idp = mm(T, mm(core, T.T))
        P_idp = 0.5 * (P_idp + P_idp.T)
        # consistency-aware init (slam_init_rho_inflation = k): add k^2 x the
        # init's own rho variance as INDEPENDENT noise along rho only —
        # triangulation-linearization bias concentrates along the anchor ray.
        # In sqrt mode the extra noise must ride the slot's own noise columns,
        # so W is re-factored with the rho term folded in (W' W'^T sigma2 =
        # sigma2 W W^T + k^2 P_rho e3 e3^T); dense mode adds it to P_idp
        # directly. P_idp is inflated in BOTH modes so the well_init gates see
        # the honest uncertainty.
        k_rho = cfg.filter.slam_init_rho_inflation
        if k_rho > 0.0:
            extra = (k_rho**2) * P_idp[2, 2]
            e33 = jnp.zeros((3, 3), dtype).at[2, 2].set(1.0)
            P_idp = P_idp + extra * e33
            if cfg.filter.sqrt_form:
                Wg = mm(W, W.T) + (extra / sigma2) * e33
                Wn = jax.lax.linalg.cholesky(Wg + 1e-12 * jnp.eye(3, dtype=dtype))
                W = jnp.where(jnp.any(jnp.isnan(Wn)), W, Wn)
        return idp_hat, zA, P_idp_x, P_idp, df, E, P_fx, A12, T, W

    (idp_all, zA_all, P_fx_all, P_ff_all, df_all, E_all, P_fx_raw, A12_all,
     T_all, W_all) = jax.vmap(init_of)(jnp.arange(K))

    # CROSS-covariance between co-promoted features — co-promoted features
    # share the same state errors through their H3 blocks, so leaving these
    # blocks zero makes the filter treat S highly-correlated landmarks as
    # independent, which is catastrophically overconfident (observed: P
    # collapses within ~50 frames of a 12-feature co-promotion). Exact:
    #   Cov(d_i, d_j) = T_i [E_i P E_j^T - X_i A_j^T - A_i X_j^T
    #                        + A_i P_aa A_j^T] T_j^T,   X_i = P_fx_i[:, a6]
    # (measurement noises of distinct features are independent — no sigma^2
    # cross term).
    # (sqrt mode: the cross blocks are IMPLIED by the shared factor columns of
    # the co-promoted rows — no explicit algebra, and exactly consistent.)
    if not cfg.filter.sqrt_form:
        X_all = jax.vmap(
            lambda Pf: jnp.concatenate(
                [
                    jax.lax.dynamic_slice(Pf, (0, ao), (3, CLONE_DIM)),
                    Pf[:, IDX_EXT_THETA : IDX_EXT_THETA + 6],
                ],
                axis=1,
            )
        )(P_fx_raw)  # (S,3,12)

        def cross_of(i, j):
            m1 = -mm(P_fx_raw[i], E_all[j].T)  # E_i P E_j^T  (P_fx = -E P)
            m2 = -mm(X_all[i], A12_all[j].T)  # -X_i A_j^T
            m3 = -mm(A12_all[i], X_all[j].T)  # -A_i X_j^T
            m4 = mm(A12_all[i], mm(P_aaee, A12_all[j].T))
            return mm(T_all[i], mm(m1 + m2 + m3 + m4, T_all[j].T))

        cross_all = jax.vmap(
            lambda i: jax.vmap(lambda j: cross_of(i, j))(jnp.arange(K))
        )(jnp.arange(K))  # (K,K,3,3)

    # only promote features whose initialization is well-constrained — a
    # promoted feature's linearization point is (FEJ-)frozen. With inverse
    # depth the gates are unit-correct: bearing sigma (normalized image) and
    # inverse-depth sigma (1/m) — distant features have small rho and small
    # rho-sigma, so they pass where a world-xyz depth gate starved them.
    diag_ff = jnp.diagonal(P_ff_all, axis1=1, axis2=2)
    fcfg = cfg.filter
    well_init = (
        (jnp.max(diag_ff[:, :2], axis=1) < _MAX_AB_SIGMA**2)
        & (diag_ff[:, 2] < fcfg.slam_max_init_rho_sigma**2)
        & (jnp.min(diag_ff, axis=1) > 0.0)
        & (zA_all > fcfg.tri_min_depth)
        & (idp_all[:, 2] > 1.0 / fcfg.tri_max_depth)
        & (jnp.min(jnp.abs(jnp.diagonal(blocks.Rf, axis1=1, axis2=2)), axis=1) > 1e-4)
        & jnp.all(jnp.isfinite(idp_all), axis=1)
        & jnp.all(jnp.isfinite(df_all), axis=1)
        & jnp.all(jnp.isfinite(P_fx_all.reshape(K, -1)), axis=1)
        & jnp.all(jnp.isfinite(P_ff_all.reshape(K, -1)), axis=1)
        & fs.clones.valid[a_slot]
        & (anchor_slot >= 0)
    )
    sel = sel & well_init

    n_free = jnp.sum(~fs.slam.valid)
    take = sel & (jnp.cumsum(sel.astype(jnp.int32)) <= n_free)

    # k-th taken candidate -> k-th free slot
    free_order = jnp.argsort(fs.slam.valid.astype(jnp.int32))  # free slots first
    rank = jnp.cumsum(take.astype(jnp.int32)) - 1
    slot_for_cand = jnp.where(take, free_order[jnp.clip(rank, 0, S - 1)], -1)

    # inverse map: which candidate (if any) took slot s. Out-of-range scatter
    # indices are dropped, so untaken slots keep cand 0 but slot_taken=False.
    scatter_idx = jnp.where(take, slot_for_cand, S)
    cand_of_slot = jnp.zeros(S, jnp.int32).at[scatter_idx].set(
        jnp.arange(K, dtype=jnp.int32), mode="drop"
    )
    slot_taken = jnp.zeros(S, bool).at[scatter_idx].set(True, mode="drop")

    # ---- slot bookkeeping (vectorized; no scan) ------------------------------
    sel_c = lambda a: a[cand_of_slot]
    tk = slot_taken
    idp_new = jnp.where(tk[:, None], sel_c(idp_all), fs.slam.idp)
    null_new = jnp.where(tk[:, None], sel_c(idp_all), fs.slam.idp_null)
    anch_new = jnp.where(tk, a_slot.astype(jnp.int32), fs.slam.anchor_slot)
    rows_c = jnp.clip(idx[cand_of_slot], 0, obs.track_id.shape[0] - 1)
    tslot_new = jnp.where(tk, rows_c.astype(jnp.int32), fs.slam.track_slot)
    tid_new = jnp.where(tk, obs.track_id[rows_c], fs.slam.track_id)
    valid_new = fs.slam.valid | tk

    # ---- covariance write: ONE static-slice row pass + col pass + block fix --
    # (a per-candidate scan of dynamic_update_slice materializes a full (D,D)
    # copy per step; at S=12 plus S^2 cross writes that was ~30 MB of HBM
    # traffic per frame and cost ~17% of pipeline throughput)
    base = slam_offset(cfg, 0)
    nS = S * SLAM_DIM
    P = fs.P
    old_rows = P[base : base + nS, :].reshape(S, SLAM_DIM, D)
    rows_full = jnp.where(tk[:, None, None], sel_c(P_fx_all), old_rows)
    P = P.at[base : base + nS, :].set(rows_full.reshape(nS, D))
    if cfg.filter.sqrt_form:
        # factor form: the rows T(-E S - A12 S_ae) already encode every
        # cross-covariance with the state AND between co-promoted siblings
        # (shared factor columns). The only missing piece is the feature's own
        # measurement noise sigma^2 W W^T — written as the factor sigma W into
        # the slot's OWN columns, which are structurally zero while the slot
        # is invalid (psd_factor re-zeroes freed slots every frame), so the
        # noise stays uncorrelated with everything else, exactly.
        sigW = jnp.sqrt(sigma2) * sel_c(W_all)  # (S,3,3)
        blk = P[base : base + nS, base : base + nS].reshape(S, SLAM_DIM, S, SLAM_DIM)
        eye_pair = tk[:, None] & tk[None, :] & jnp.eye(S, dtype=bool)
        blk = blk + sigW[:, :, None, :] * eye_pair[:, None, :, None]
        P = P.at[base : base + nS, base : base + nS].set(blk.reshape(nS, nS))
    else:
        # column pass: mirror the rows (P_fx^T per taken slot)
        old_cols = P[:, base : base + nS].reshape(D, S, SLAM_DIM)
        cols_full = jnp.where(
            tk[None, :, None], jnp.transpose(rows_full, (2, 0, 1)), old_cols
        )
        P = P.at[:, base : base + nS].set(cols_full.reshape(D, nS))
        # slam-block interior: taken diagonals get P_ff; taken-taken
        # off-diagonal pairs get the exact cross blocks (their P_fx columns
        # were zero — each was computed before any sibling existed)
        blk = P[base : base + nS, base : base + nS].reshape(S, SLAM_DIM, S, SLAM_DIM)
        M = cross_all[cand_of_slot[:, None], cand_of_slot[None, :]]  # (S,S,3,3)
        M = jnp.transpose(M, (0, 2, 1, 3))  # -> (S,3,S,3)
        pair = tk[:, None] & tk[None, :]
        off_diag = pair & ~jnp.eye(S, dtype=bool)
        blk = jnp.where(off_diag[:, None, :, None], M, blk)
        diag = P_ff_all[cand_of_slot]  # (S,3,3)
        eye_pair = tk[:, None] & tk[None, :] & jnp.eye(S, dtype=bool)
        blk = jnp.where(eye_pair[:, None, :, None], diag[:, :, None, :], blk)
        P = P.at[base : base + nS, base : base + nS].set(blk.reshape(nS, nS))

    return fs.replace(
        slam=fs.slam.replace(
            idp=idp_new, idp_null=null_new, anchor_slot=anch_new,
            track_slot=tslot_new, track_id=tid_new, valid=valid_new,
            age=jnp.where(tk, 0, fs.slam.age),
        ),
        P=P,
    )


def reanchor_on_prune(cfg: VioConfig, fs: FilterState, slot_a, slot_b, do_prune) -> FilterState:
    """Re-anchor slam features whose anchor clone is being pruned.

    MUST run before prune.remove_clones zeroes the pruned slots' covariance —
    the transform consumes the old anchor's rows. New anchor = newest clone
    that survives the prune. First-order error map (see module docstring
    conventions):

        d_idp_B = G_f d_idp_A + G_A dx_A + G_B dx_B + G_E dx_ext
        G_f = N R_ci R_B J_idp^A
        G_A = N R_ci R_B [J_thA, I]
        G_B = N [R_ci [v]x, -R_ci R_B],  v = R_B (p_w - p_B)
        G_E = [N R_ci R_B J_phi^A + N [R_ci v]x,  N R_ci R_B J_tci^A + N]
        (extrinsic enters both through the old-anchor world point and the
        new-anchor projection)

    with N = d idp_B / d p_cB. Covariance: P' = T P T^T applied as a masked
    row pass then column pass (each feature's rows/cols are disjoint and the
    read set — own block, anchor blocks — is never written by another
    feature, so sequential masked updates compose exactly).
    """
    S = cfg.filter.max_slam_features
    if S == 0:
        return fs
    C = cfg.filter.max_clones
    D = state_dim(cfg)
    dtype = fs.P.dtype
    R_ci = quat_to_rotation(fs.q_ci)

    pruned = (jax.nn.one_hot(slot_a, C, dtype=bool) | jax.nn.one_hot(slot_b, C, dtype=bool)) & do_prune
    a_cur = jnp.clip(fs.slam.anchor_slot, 0, C - 1)
    needs = fs.slam.valid & (fs.slam.anchor_slot >= 0) & pruned[a_cur]

    # new anchor: newest surviving clone
    surv = fs.clones.valid & ~pruned
    frame = jnp.where(surv, fs.clones.frame, -1)
    b_slot = jnp.argmax(frame)
    has_b = jnp.any(surv)
    needs = needs & has_b

    R_A, p_A = _anchor_rotations(fs, fej=False)
    R_B = quat_to_rotation(fs.clones.q[b_slot])
    p_B = fs.clones.p[b_slot]
    bo = clone_offset(b_slot)

    # current world point + old-anchor Jacobians at the CURRENT estimate
    p_w, J_idpA, J_thA, J_phiA, J_tciA, _ = _world_point_and_jac(
        fs.slam.idp, R_A, p_A, R_ci, fs.t_ci
    )
    idp_B, zB = _idp_of_world(p_w, jnp.tile(R_B[None], (S, 1, 1)), p_B[None], R_ci, fs.t_ci)
    ok = needs & (zB > 0.05) & jnp.all(jnp.isfinite(idp_B), axis=1)

    # N = d idp_B / d p_cB at p_cB
    pcB = jnp.einsum("ab,sb->sa", R_ci, jnp.einsum("ab,sb->sa", R_B, p_w - p_B)) + fs.t_ci
    zb = jnp.where(jnp.abs(pcB[:, 2]) < 1e-8, 1e-8, pcB[:, 2])
    zr = jnp.zeros_like(zb)
    N = jnp.stack(
        [
            jnp.stack([1 / zb, zr, -pcB[:, 0] / zb**2], axis=-1),
            jnp.stack([zr, 1 / zb, -pcB[:, 1] / zb**2], axis=-1),
            jnp.stack([zr, zr, -1 / zb**2], axis=-1),
        ],
        axis=1,
    )  # (S,3,3)
    NRB = jnp.einsum("sab,bc,cd->sad", N, R_ci, R_B)  # (S,3,3) N R_ci R_B
    G_f = jnp.einsum("sab,sbc->sac", NRB, J_idpA)
    G_A = jnp.concatenate(
        [jnp.einsum("sab,sbc->sac", NRB, J_thA), NRB], axis=2
    )  # (S,3,6)
    v = jnp.einsum("ab,sb->sa", R_B, p_w - p_B)
    G_B = jnp.concatenate(
        [
            jnp.einsum("sab,bc,scd->sad", N, R_ci, skew(v)),
            -NRB,
        ],
        axis=2,
    )  # (S,3,6)
    # extrinsic columns: old-anchor chain (J_phiA/J_tciA through p_w) plus the
    # direct new-anchor projection terms d p_cB = [R_ci v]x dphi + dt_ci
    u_cb = jnp.einsum("ab,sb->sa", R_ci, v)  # R_ci v
    G_E = jnp.concatenate(
        [
            jnp.einsum("sab,sbc->sac", NRB, J_phiA)
            + jnp.einsum("sab,sbc->sac", N, skew(u_cb)),
            jnp.einsum("sab,sbc->sac", NRB, J_tciA) + N,
        ],
        axis=2,
    )  # (S,3,6)

    ao_all = clone_offset(a_cur)  # (S,)
    dead = needs & ~ok  # couldn't re-anchor (behind new anchor / no survivor)

    # P' = T P T^T as one vectorized row pass + col pass (a per-feature scan
    # of dynamic_update_slice copies the full (D,D) each step). The read set
    # of every feature (own block, old/new anchor rows) is disjoint from the
    # write set (own slam rows/cols), so the batched row pass equals T P and
    # the batched col pass equals (T P) T^T exactly.
    base = slam_offset(cfg, 0)
    nS = S * SLAM_DIM
    P = fs.P
    # factor width W — may exceed D while the factor is propagation-wide
    # (sqrt path defers its compression to the frame's update); every op
    # below is a row op, valid at any width
    W = P.shape[1]
    gidx = ao_all[:, None] + jnp.arange(CLONE_DIM)[None, :]  # (S,6)
    rows_f = P[base : base + nS, :].reshape(S, SLAM_DIM, W)
    rows_a = P[gidx.reshape(-1), :].reshape(S, CLONE_DIM, W)
    rows_b = jax.lax.dynamic_slice(P, (bo, 0), (CLONE_DIM, W))
    rows_e = P[IDX_EXT_THETA : IDX_EXT_THETA + 6, :]
    new_rows = (
        jnp.einsum("sab,sbd->sad", G_f, rows_f)
        + jnp.einsum("sab,sbd->sad", G_A, rows_a)
        + jnp.einsum("sab,bd->sad", G_B, rows_b)
        + jnp.einsum("sab,bd->sad", G_E, rows_e)
    )
    keep = ~(ok | dead)
    new_rows = jnp.where(ok[:, None, None], new_rows, rows_f)
    new_rows = jnp.where(keep[:, None, None], rows_f, new_rows)
    new_rows = jnp.where(dead[:, None, None], 0.0, new_rows)
    P = P.at[base : base + nS, :].set(new_rows.reshape(nS, W))

    if not cfg.filter.sqrt_form:
        # dense only: mirror the congruence on the columns. In factor form the
        # row pass IS the whole transform (P' = (T S)(T S)^T) — factor columns
        # are shared basis directions and must not be touched.
        cols_f = P[:, base : base + nS].reshape(D, S, SLAM_DIM)
        cols_a = P[:, gidx.reshape(-1)].reshape(D, S, CLONE_DIM)
        cols_b = jax.lax.dynamic_slice(P, (0, bo), (D, CLONE_DIM))
        cols_e = P[:, IDX_EXT_THETA : IDX_EXT_THETA + 6]
        new_cols = (
            jnp.einsum("dsb,sab->dsa", cols_f, G_f)
            + jnp.einsum("dsb,sab->dsa", cols_a, G_A)
            + jnp.einsum("db,sab->dsa", cols_b, G_B)
            + jnp.einsum("db,sab->dsa", cols_e, G_E)
        )
        new_cols = jnp.where(ok[None, :, None], new_cols, cols_f)
        new_cols = jnp.where(keep[None, :, None], cols_f, new_cols)
        new_cols = jnp.where(dead[None, :, None], 0.0, new_cols)
        P = P.at[:, base : base + nS].set(new_cols.reshape(D, nS))

    slam = fs.slam.replace(
        idp=jnp.where(ok[:, None], idp_B, fs.slam.idp),
        idp_null=jnp.where(ok[:, None], idp_B, fs.slam.idp_null),
        anchor_slot=jnp.where(
            ok, jnp.full((S,), 1, jnp.int32) * b_slot.astype(jnp.int32),
            jnp.where(dead, -1, fs.slam.anchor_slot),
        ),
        valid=fs.slam.valid & ~dead,
        track_id=jnp.where(dead, -1, fs.slam.track_id),
        track_slot=jnp.where(dead, -1, fs.slam.track_slot),
    )
    return fs.replace(slam=slam, P=P)


def relinearize_nulls(cfg: VioConfig, fs: FilterState) -> FilterState:
    """Refresh a slam feature's FEJ null once the estimate leaves its trust
    region (ROADMAP r3 #4; gated by ``slam_relin_sigma``, 0 = pure FEJ).

    Pure FEJ freezes ``idp_null`` at promotion so the measurement Jacobians
    stay consistent along the unobservable directions — but it also freezes
    the promotion-time triangulation bias into every subsequent Jacobian.
    Once the filter has moved the estimate k feature-sigmas away from the
    null, the Jacobian is evaluated at a point the filter itself asserts is
    wrong, and the linearization error acts as a persistent measurement bias
    (observed as bounded position overconfidence at exactly-matched
    observation noise). Refreshing the null at the current estimate is the
    same documented discontinuity re-anchoring already makes; the sigma-unit
    threshold means converged features (small sigma AND small motion) never
    churn their linearization point, so the observability leak is bounded by
    k sigma per refresh and refreshes are self-limiting.
    """
    S = cfg.filter.max_slam_features
    k = cfg.filter.slam_relin_sigma
    if S == 0 or k <= 0.0:
        return fs
    from larvio_tpu.models.state import cov_diag

    base = slam_offset(cfg, 0)
    var = cov_diag(cfg, fs.P)[base : base + S * SLAM_DIM].reshape(S, SLAM_DIM)
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    dev = jnp.abs(fs.slam.idp - fs.slam.idp_null)
    refresh = fs.slam.valid & jnp.any(dev > k * sigma, axis=-1)
    return fs.replace(
        slam=fs.slam.replace(
            idp_null=jnp.where(refresh[:, None], fs.slam.idp, fs.slam.idp_null)
        )
    )


def drop_lost(cfg: VioConfig, fs: FilterState, feats, hard_fail) -> FilterState:
    """Drop slam features whose track died, fail gating hard, or aged out.

    The lifetime cap (``slam_max_lifetime``, 0 = off) drops a still-healthy
    feature so its live track re-promotes with a fresh exact delayed init —
    bounding how long a frozen (biased) linearization point can keep feeding
    Jacobians (the exact-noise position-overconfidence mechanism, ROADMAP #4).
    """
    S = cfg.filter.max_slam_features
    if S == 0:
        return fs
    slot = jnp.clip(fs.slam.track_slot, 0, feats.uv.shape[0] - 1)
    tracked = (
        fs.slam.valid
        & (fs.slam.track_slot >= 0)
        & feats.valid[slot]
        & (feats.ids[slot] == fs.slam.track_id)
    )
    # Post-reset note: suspending the cap during recovery (age freeze keyed
    # on velocity uncertainty and/or a reset cooldown counter) was tried in
    # r5 and REVERTED — measured NaN-accel recovery 1.48 -> 1.57/1.61 and it
    # broke the gyro-fault scale re-learning (biased chaos-phase landmarks
    # kept pinning the state). The recovery-quality lever that measures well
    # is the cap VALUE itself (less churn), not conditional suspension.
    age = fs.slam.age + fs.slam.valid.astype(jnp.int32)
    if cfg.filter.slam_max_lifetime > 0:
        expired = fs.slam.valid & (age > cfg.filter.slam_max_lifetime)
    else:
        expired = jnp.zeros_like(fs.slam.valid)
    drop = fs.slam.valid & (~tracked | hard_fail | expired)

    D = state_dim(cfg)
    P = fs.P

    # zero the dropped slots' covariance rows (and cols in dense form) in ONE
    # masked write — the slam block is the tail of the state, so a row's slot
    # is (row - base) // SLAM_DIM. (The former per-slot lax.scan of
    # dynamic_update_slice copied the full (D,D) S times per frame; jnp.where
    # is NaN-safe where a 0/1 multiply is not — poisoned rows must clear.)
    base = slam_offset(cfg, 0)
    ar = jnp.arange(D)
    row_dropped = (ar >= base) & jnp.take(
        drop, jnp.clip((ar - base) // SLAM_DIM, 0, S - 1)
    )
    P = jnp.where(row_dropped[:, None], jnp.zeros((), P.dtype), P)
    if not cfg.filter.sqrt_form:
        # factor form: zero rows alone zero the implied P rows AND cols
        P = jnp.where(row_dropped[None, :], jnp.zeros((), P.dtype), P)
    return fs.replace(
        slam=fs.slam.replace(
            valid=fs.slam.valid & ~drop,
            track_id=jnp.where(drop, -1, fs.slam.track_id),
            track_slot=jnp.where(drop, -1, fs.slam.track_slot),
            anchor_slot=jnp.where(drop, -1, fs.slam.anchor_slot),
            age=jnp.where(drop, 0, age),
        ),
        P=P,
    )
