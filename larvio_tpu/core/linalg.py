"""Dense linear-algebra helpers for the filter.

TPU note: f32 matmuls default to bf16 MXU passes. Covariance algebra needs
full f32, so every filter matmul goes through :func:`mm` (HIGHEST precision —
on TPU this selects the 6-pass f32 MXU algorithm). Image-plane compute keeps
the fast default.

Also home of the masked Householder elimination used for the MSCKF nullspace
projection (SURVEY.md §3.3 featureJacobian) — built so that padded invalid
rows are provably untouched (their Householder components are zero), making
the padded update *exactly* equal to the reference's dynamically-sized one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision matmul (batched ok)."""
    return jnp.matmul(a, b, precision=_HI)


def symmetrize(P: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (P + jnp.swapaxes(P, -1, -2))


def householder_eliminate(A: jnp.ndarray, B: jnp.ndarray, r: jnp.ndarray, ncols: int):
    """Eliminate the first ``ncols`` columns of A from the system [A B | r].

    Applies ``ncols`` Householder reflections (the Q^T of a QR of A) to A, B
    and r simultaneously, then returns (B', r') with the first ``ncols`` rows
    implicitly discarded by zeroing. Rows of A that are exactly zero (padding)
    are fixed points of every reflection, so padding is exact, **provided the
    first ``ncols`` rows are valid** — callers must compact valid rows to the
    front.

    A: (m, ncols), B: (m, n), r: (m,).
    Returns (B', r', row_keep) with row_keep masking out the eliminated rows.
    """
    m = A.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)

    def body(k, carry):
        A_, B_, r_ = carry
        x = jnp.where(rows >= k, A_[:, k], 0.0)
        normx = jnp.sqrt(jnp.sum(x * x) + 1e-30)
        x_k = jnp.sum(jnp.where(rows == k, x, 0.0))
        alpha = -jnp.sign(jnp.where(x_k == 0, 1.0, x_k)) * normx
        v = x - alpha * (rows == k).astype(x.dtype)
        vnorm2 = jnp.sum(v * v) + 1e-30
        # H = I - 2 v v^T / |v|^2 applied to each column
        def refl(M):
            return M - (2.0 / vnorm2) * jnp.outer(v, jnp.matmul(v, M, precision=_HI))

        return refl(A_), refl(B_), r_ - (2.0 / vnorm2) * v * jnp.dot(v, r_)

    A2, B2, r2 = jax.lax.fori_loop(
        0, ncols, body, (A.astype(jnp.float32), B.astype(jnp.float32), r.astype(jnp.float32)),
        unroll=True,
    )
    row_keep = rows >= ncols
    return (
        jnp.where(row_keep[:, None], B2, 0.0),
        jnp.where(row_keep, r2, 0.0),
        row_keep,
        # the eliminated range-space rows: r_top = B_top dx + A_top df + n.
        # These carry the feature-conditional information and enable exact
        # delayed initialization of in-state features (models/slam.py).
        (A2[:ncols, :], B2[:ncols, :], r2[:ncols]),
    )


def solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 solve via the adjugate (batched over leading axes).

    jnp.linalg.solve on (…,3,3) lowers to a batched LU *custom call* on TPU —
    ~19 us of fixed overhead per call inside every GN iteration. The adjugate
    form is pure fused VPU elementwise work.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c01 * b1 + c02 * b2) * inv_det
    x1 = (c10 * b0 + c11 * b1 + c12 * b2) * inv_det
    x2 = (c20 * b0 + c21 * b1 + c22 * b2) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse via the adjugate (batched over leading axes).

    jnp.linalg.inv on (…,3,3) lowers to a batched LU custom call on TPU
    (same latency trap as solve3's note above); the adjugate form is fused
    VPU elementwise work.
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    return jnp.stack([solve3(A, eye[..., i, :]) for i in range(3)], axis=-1)


def qr_compress(H: jnp.ndarray, r: jnp.ndarray, mode: str = "cholqr2"):
    """Compress a tall stacked (whitened) measurement system to state dim.

    Counterpart of the reference's Givens/QR measurement compression
    (BASELINE.json:5; measurementUpdate in ref:src/larvio.cpp). H's zero
    (padding) rows make col(H) supported on valid rows only, so the
    compression maps the iid measurement noise to iid noise exactly (see
    tests/test_filter.py for the numerical equivalence check against the
    dense unpadded computation).

    mode="cholqr2": CholeskyQR2 (the default) — two rounds of
                 chol(H^T H)-based factorization. Round 1 squares the
                 conditioning (the reason plain "gram" measured ~3x worse
                 ATE); round 2 re-factors the nearly-orthonormal intermediate,
                 restoring Householder-grade accuracy for cond(H) up to
                 ~1/sqrt(eps_f32) ~ 4e3 (far above whitened filter stacks).
                 Cost is 3 MXU GEMMs + 2 small Cholesky + triangular solves —
                 ~5x cheaper on TPU than the blocked-Householder QR custom
                 calls at our (N~1300, D~142) sizes, which are latency-bound.
    mode="qr":   Householder thin QR (exact, stable; the former default).
    mode="gram": single-pass chol(H^T H + eps I) — kept as the numerical
                 floor / fallback documented above.

    H: (N, D), r: (N,) -> (D, D) H_c and (D,) r_c with H_c^T H_c = H^T H and
    H_c^T r_c = H^T r (same information, same normal equations).
    """
    if mode == "qr":
        q, R = jnp.linalg.qr(H, mode="reduced")
        return R, mm(q.T, r[:, None])[:, 0]
    if mode == "cholqr2":
        D = H.shape[1]
        eye = jnp.eye(D, dtype=H.dtype)
        G = symmetrize(mm(H.T, H))
        # jitter above the f32 GEMM rounding floor; 3e-5 relative is 4+ orders
        # below any real information (see "gram" note below)
        eps = 3e-5 * (1.0 + jnp.max(jnp.diagonal(G)))
        R1 = jax.lax.linalg.cholesky(G + eps * eye).T  # upper
        safe1 = jnp.sqrt(jnp.maximum(jnp.diagonal(G), 0.0) + eps)
        R1 = jnp.where(jnp.isnan(R1), jnp.diag(safe1), R1)
        # B = H R1^{-1}: rows of H in the (near-)orthonormal basis.
        # NOTE: do NOT rewrite round 2 in the Gram domain
        # (G2 = R1^{-T} G R1^{-1}, r_c from H^T r): it is identical math but
        # squares the conditioning of what round 2 exists to repair, and it
        # measurably degraded f32 filter accuracy (noisy-20s ATE
        # 0.043 -> 0.156). The N-wide solve + GEMM below are the price of
        # the accuracy.
        B = jax.scipy.linalg.solve_triangular(R1.T, H.T, lower=True).T  # (N, D)
        G2 = symmetrize(mm(B.T, B))
        R2 = jax.lax.linalg.cholesky(G2 + (1e-6) * eye).T
        R2 = jnp.where(jnp.isnan(R2), eye, R2)
        H_c = mm(R2, R1)  # upper-triangular product; H = Q2 H_c with Q2 ~ orthonormal
        # r_c = Q2^T r = R2^{-T} B^T r
        Btr = mm(B.T, r[:, None])
        r_c = jax.scipy.linalg.solve_triangular(R2.T, Btr, lower=True)[:, 0]
        bad = jnp.any(jnp.isnan(r_c)) | jnp.any(jnp.isnan(H_c))
        H_c = jnp.where(bad, jnp.diag(safe1), H_c)
        r_c = jnp.where(bad, 0.0, r_c)
        return H_c, r_c
    D = H.shape[1]
    G = mm(H.T, H)
    # jitter must sit above the f32 GEMM rounding floor (~1e-7 * ||G|| *
    # sqrt(N) can push eigenvalues negative by ~1e-7 relative); 3e-5 relative
    # is invisible to the filter (it is 4+ orders below any real information)
    eps = 3e-5 * (1.0 + jnp.max(jnp.diagonal(G)))
    L = jax.lax.linalg.cholesky(symmetrize(G) + eps * jnp.eye(D, dtype=H.dtype))
    # containment: if rounding still defeated the jitter, fall back to the
    # diagonal factor instead of poisoning the filter with NaNs
    safe = jnp.sqrt(jnp.maximum(jnp.diagonal(G), 0.0) + eps)
    L = jnp.where(jnp.isnan(L), jnp.diag(safe), L)
    Htr = mm(H.T, r[:, None])  # (D, 1)
    # solve L r_c = H^T r  =>  H_c^T r_c = H^T r with H_c = L^T
    r_c = jax.scipy.linalg.solve_triangular(L, Htr, lower=True)[:, 0]
    r_c = jnp.where(jnp.isnan(r_c), 0.0, r_c)
    return L.T, r_c


def inv_quadform(S: jnp.ndarray, r: jnp.ndarray, iters: int = 24) -> jnp.ndarray:
    """gamma = r^T S^{-1} r for SPD S — custom-call-free (chi-square gates).

    The per-feature gate Cholesky lowers to a batched TPU custom call that is
    latency-bound (~200 us for a (48, 40, 40) batch). This computes S^{-1} via
    Jacobi-preconditioned Newton-Schulz iteration — X_{k+1} = X_k (2I - A X_k)
    — which is pure batched MXU GEMM work and vmaps for free. Quadratic
    convergence: with the Gershgorin-scaled start the error is squared each
    step, giving ~1e-6 relative gamma error for cond(S) up to ~1e5 at
    ``iters=24`` (test_core.py pins 1e4 plus a 3e4 margin case; bootstrap
    covariances can push the gate system to ~1e5). The gate only compares gamma to a
    chi-square threshold, so even percent-level error is immaterial — but the
    EKF update itself keeps its exact solve.

    GUARDED domain (not assumed): the residual ``max|I - A X|`` bounds the
    relative gamma error. If the iteration left its convergence radius
    (indefinite S from f32 corruption, conditioning far beyond 1e5, NaNs),
    gamma is returned as +inf — the chi-square gate then REJECTS the
    measurement instead of acting on a garbage statistic. A rejected-good
    measurement costs one feature-frame of information; an accepted-garbage
    one corrupts the filter. test_core.py pins the kappa~1e6 behavior:
    finite => accurate, else +inf, never silent garbage.

    S: (n, n) SPD, r: (n,). Batched over leading dims by vmap.
    """
    n = S.shape[-1]
    d = jnp.diagonal(S)
    ds = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    A = S * ds[:, None] * ds[None, :]  # unit diagonal
    rs = r * ds
    # Gershgorin upper bound on lambda_max(A)
    lam = jnp.max(jnp.sum(jnp.abs(A), axis=-1))
    X = jnp.eye(n, dtype=S.dtype) / lam
    eye2 = 2.0 * jnp.eye(n, dtype=S.dtype)

    def body(X, _):
        return mm(X, eye2 - mm(A, X)), None

    X, _ = jax.lax.scan(body, X, None, length=iters, unroll=True)
    X = symmetrize(X)
    gamma = jnp.dot(rs, mm(X, rs[:, None])[:, 0])
    # convergence guard: one extra (n, n) GEMM. resid ~ relative gamma error
    # under quadratic convergence; 0.25 tolerates the slow-converging tail of
    # the cond~1e5 bootstrap systems (resid ~ 1e-2 there) with margin while
    # catching divergence (resid explodes past 1 within a few iterations).
    resid = jnp.max(jnp.abs(jnp.eye(n, dtype=S.dtype) - mm(A, X)))
    ok = jnp.isfinite(gamma) & (gamma >= 0.0) & (resid < 0.25)
    return jnp.where(ok, gamma, jnp.inf)


def psd_factor(M: jnp.ndarray) -> jnp.ndarray:
    """Square factor S (D, D) with S S^T = M M^T, for a wide factor M (D, W).

    The square-root covariance path (SURVEY.md §7 hard part #2) represents
    P = S S^T and rebuilds S after steps that widen the factor (Joseph-form
    update stacks [S - K H S, K sqrt(R)]; propagation stacks the process-noise
    factor). Implemented as Jacobi-normalized CholeskyQR2 on M^T:

      pass 1:  L1 = chol(corr(G) + eps1 I) in the unit-diagonal scaling
      pass 2:  B = L1^{-1} D^{-1/2} M  (rows near-orthonormal),
               S = D^{1/2} L1 chol(B B^T + eps2 I)

    The pass-1 jitter cancels exactly (S S^T = D^{1/2} L1 (B B^T) L1^T D^{1/2}
    = G in exact arithmetic for ANY nonsingular L1); the pass-2 jitter adds
    eps2 RELATIVE variance inflation per call (~1e-6 — invisible against
    process noise). Crucially the result is a legitimate factor whatever the
    f32 roundoff did: the implied covariance S S^T can NEVER be indefinite,
    which removes the Joseph-form collapse class (negative diagonal from
    catastrophic cancellation) by construction.

    Zero rows of M (invalid padded slots) stay structurally zero: their
    normalized diagonal is the floor value, pass-1/2 factors carry ~sqrt(eps)
    on the diagonal only, and the rescale by D^{1/2} ~ 1e-10 pushes the
    implied variance to ~1e-26 — exact-zero semantics for every consumer.
    """
    D = M.shape[0]
    G = symmetrize(mm(M, M.T))
    d = jnp.diagonal(G)
    # sanitize: a NaN-poisoned row must not poison the diagonal FALLBACK too
    d = jnp.where(jnp.isfinite(d), d, 0.0)
    ds = jnp.sqrt(jnp.maximum(d, 1e-20))
    eye = jnp.eye(D, dtype=M.dtype)
    N = G / (ds[:, None] * ds[None, :])
    L1 = jax.lax.linalg.cholesky(symmetrize(N) + 3e-5 * eye)
    L1 = jnp.where(jnp.isnan(L1), eye, L1)
    # NOTE: computing G2 from the explicit B (not in the Gram domain as
    # L1^{-1} N L1^{-T}) is deliberate: the Gram shortcut squares the
    # conditioning of the inputs, and the equivalent rewrite in qr_compress
    # measurably degraded f32 filter accuracy (noisy-20s ATE 0.043 -> 0.156)
    # despite being "identical math". Keep B materialized.
    B = jax.scipy.linalg.solve_triangular(L1, M / ds[:, None], lower=True)
    G2 = symmetrize(mm(B, B.T))
    L2 = jax.lax.linalg.cholesky(G2 + 1e-6 * eye)
    L2 = jnp.where(jnp.isnan(L2), eye, L2)
    S = ds[:, None] * mm(L1, L2)
    # containment: a NaN-poisoned M must not silently produce garbage — fall
    # back to the diagonal factor (the caller's finite-guard then rejects)
    return jnp.where(jnp.any(jnp.isnan(S)), jnp.diag(ds), S)


def psd_chol(Q: jnp.ndarray, rel_jitter: float = 1e-6) -> jnp.ndarray:
    """Lower Cholesky factor of a small PSD matrix, Jacobi-normalized with
    relative jitter (process-noise factors for the square-root path)."""
    d = jnp.diagonal(Q)
    ds = jnp.sqrt(jnp.maximum(d, 1e-30))
    N = Q / (ds[:, None] * ds[None, :])
    eye = jnp.eye(Q.shape[0], dtype=Q.dtype)
    L = jax.lax.linalg.cholesky(symmetrize(N) + rel_jitter * eye)
    L = jnp.where(jnp.isnan(L), eye, L)
    return ds[:, None] * L


def joseph_update(P, H, r, noise_var):
    """EKF update with Joseph-form covariance for f32 health.

    Returns (dx, P_new). H: (n, D), r: (n,), noise_var: scalar or (n,).
    """
    D = P.shape[0]
    n = H.shape[0]
    Rn = jnp.broadcast_to(jnp.asarray(noise_var, P.dtype), (n,))
    PHt = mm(P, H.T)  # (D, n)
    S = mm(H, PHt) + jnp.diag(Rn)
    S = symmetrize(S)
    chol = jax.lax.linalg.cholesky(S + 1e-12 * jnp.eye(n, dtype=P.dtype))
    K = jax.scipy.linalg.cho_solve((chol, True), PHt.T).T  # (D, n)
    dx = jnp.matmul(K, r, precision=_HI)
    IKH = jnp.eye(D, dtype=P.dtype) - mm(K, H)
    P_new = mm(mm(IKH, P), IKH.T) + mm(K * Rn[None, :], K.T)
    return dx, symmetrize(P_new)
