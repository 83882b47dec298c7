"""Window structure-from-motion for dynamic initialization.

Counterpart of ref:Initializer/{solve_5pts, initial_sfm} (MotionEstimator +
GlobalSFM, SURVEY.md §3.4): relative pose of two parallax frames from the
essential matrix, then progressive triangulation + PnP over the window.
Differences from the reference: the essential matrix uses the normalized
8-point algorithm with a small RANSAC loop (we have hundreds of tracked
correspondences, so 5-point's minimal-sample advantage is irrelevant), and
the bundle-adjustment polish is a few Gauss-Newton sweeps instead of a ceres
solve — adequate because the visual-inertial alignment and the filter itself
refine everything downstream.
"""

from __future__ import annotations

import numpy as np


def essential_8pt(p1: np.ndarray, p2: np.ndarray) -> np.ndarray:
    """Normalized 8-point essential matrix. p1, p2: (N, 2) normalized coords."""
    x1 = np.concatenate([p1, np.ones((len(p1), 1))], axis=1)
    x2 = np.concatenate([p2, np.ones((len(p2), 1))], axis=1)
    A = np.einsum("ni,nj->nij", x2, x1).reshape(len(p1), 9)
    _, _, vt = np.linalg.svd(A)
    E = vt[-1].reshape(3, 3)
    u, s, vt = np.linalg.svd(E)
    return u @ np.diag([1.0, 1.0, 0.0]) @ vt


def decompose_essential(E, p1, p2):
    """Pick the (R, t) with the best cheirality among the 4 candidates.

    Returns R, t with x2 ~ R @ x1 + t (frame1 coords -> frame2 coords).
    """
    u, _, vt = np.linalg.svd(E)
    if np.linalg.det(u) < 0:
        u = -u
    if np.linalg.det(vt) < 0:
        vt = -vt
    W = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    cands = [
        (u @ W @ vt, u[:, 2]),
        (u @ W @ vt, -u[:, 2]),
        (u @ W.T @ vt, u[:, 2]),
        (u @ W.T @ vt, -u[:, 2]),
    ]
    best, best_n = None, -1
    for R, t in cands:
        z1, z2 = _depths(R, t, p1, p2)
        n = int(np.sum((z1 > 0) & (z2 > 0)))
        if n > best_n:
            best, best_n = (R, t), n
    return best[0], best[1], best_n


def _depths(R, t, p1, p2):
    """Two-view triangulation depths for cheirality checks."""
    x1 = np.concatenate([p1, np.ones((len(p1), 1))], axis=1)
    x2 = np.concatenate([p2, np.ones((len(p2), 1))], axis=1)
    z1 = np.zeros(len(p1))
    z2 = np.zeros(len(p1))
    for i in range(len(p1)):
        m = R @ x1[i]
        A = np.stack([m[:2] - x2[i, :2] * m[2]], axis=0).reshape(-1)
        b = np.array([x2[i, 0] * t[2] - t[0], x2[i, 1] * t[2] - t[1]])
        a2 = np.array([m[0] - x2[i, 0] * m[2], m[1] - x2[i, 1] * m[2]])
        denom = a2 @ a2
        z1[i] = (a2 @ b) / denom if denom > 1e-12 else -1.0
        z2[i] = (R[2] @ x1[i]) * z1[i] + t[2]
    return z1, z2


def relative_pose_ransac(p1, p2, iters=64, thresh=2e-3, rng=None):
    """Essential-matrix RANSAC on (N,2) correspondences. Returns R, t, inliers."""
    rng = rng or np.random.default_rng(0)
    n = len(p1)
    x1 = np.concatenate([p1, np.ones((n, 1))], axis=1)
    x2 = np.concatenate([p2, np.ones((n, 1))], axis=1)
    best_inl, best_E = None, None
    for _ in range(iters):
        idx = rng.choice(n, 8, replace=False)
        E = essential_8pt(p1[idx], p2[idx])
        # Sampson distance
        Ex1 = x1 @ E.T
        Etx2 = x2 @ E
        num = np.einsum("ni,ni->n", x2, x1 @ E.T) ** 2
        den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
        d = num / np.maximum(den, 1e-12)
        inl = d < thresh**2
        if best_inl is None or inl.sum() > best_inl.sum():
            best_inl, best_E = inl, E
    if best_inl.sum() >= 12:
        best_E = essential_8pt(p1[best_inl], p2[best_inl])
    R, t, _ = decompose_essential(best_E, p1[best_inl], p2[best_inl])
    return R, t, best_inl


def triangulate(R1, t1, R2, t2, p1, p2):
    """Linear triangulation. (R_i, t_i): world->cam_i. Returns (N, 3) world pts."""
    P1 = np.concatenate([R1, t1[:, None]], axis=1)
    P2 = np.concatenate([R2, t2[:, None]], axis=1)
    out = np.zeros((len(p1), 3))
    for i in range(len(p1)):
        A = np.stack(
            [
                p1[i, 0] * P1[2] - P1[0],
                p1[i, 1] * P1[2] - P1[1],
                p2[i, 0] * P2[2] - P2[0],
                p2[i, 1] * P2[2] - P2[1],
            ]
        )
        _, _, vt = np.linalg.svd(A)
        X = vt[-1]
        out[i] = X[:3] / X[3] if abs(X[3]) > 1e-12 else np.full(3, np.nan)
    return out


def pnp(pts3d, pts2d, R0=None, t0=None, iters=10):
    """DLT + Gauss-Newton PnP. Returns (R, t) world->cam, inlier mask."""
    n = len(pts3d)
    if R0 is None:
        # DLT
        A = np.zeros((2 * n, 12))
        for i in range(n):
            X = np.concatenate([pts3d[i], [1.0]])
            A[2 * i, 0:4] = X
            A[2 * i, 8:12] = -pts2d[i, 0] * X
            A[2 * i + 1, 4:8] = X
            A[2 * i + 1, 8:12] = -pts2d[i, 1] * X
        _, _, vt = np.linalg.svd(A)
        P = vt[-1].reshape(3, 4)
        Rr = P[:, :3]
        u, s, vt2 = np.linalg.svd(Rr)
        sign = np.sign(np.linalg.det(u @ vt2))
        R = sign * u @ vt2
        t = sign * P[:, 3] / np.mean(s)
    else:
        R, t = R0.copy(), t0.copy()

    def _skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    for _ in range(iters):
        pc = (R @ pts3d.T).T + t
        z = np.maximum(pc[:, 2], 1e-6)
        pred = pc[:, :2] / z[:, None]
        r = (pts2d - pred).reshape(-1)
        J = np.zeros((2 * n, 6))
        for i in range(n):
            Jp = np.array([[1 / z[i], 0, -pc[i, 0] / z[i] ** 2],
                           [0, 1 / z[i], -pc[i, 1] / z[i] ** 2]])
            J[2 * i : 2 * i + 2, 0:3] = Jp @ (-_skew(pc[i]))  # rotation (left)
            J[2 * i : 2 * i + 2, 3:6] = Jp
        dx, *_ = np.linalg.lstsq(J, r, rcond=None)
        R = _exp(dx[:3]) @ R
        t = t + dx[3:6]
    pc = (R @ pts3d.T).T + t
    pred = pc[:, :2] / np.maximum(pc[:, 2:3], 1e-6)
    inl = np.linalg.norm(pred - pts2d, axis=1) < 0.01
    return R, t, inl


def _exp(phi):
    th = np.linalg.norm(phi)
    K = np.array([[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]], [-phi[1], phi[0], 0]])
    if th < 1e-9:
        return np.eye(3) + K
    return (
        np.eye(3)
        + np.sin(th) / th * K
        + (1 - np.cos(th)) / th**2 * (K @ K)
    )
