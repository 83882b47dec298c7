"""Front-end kernel tests, golden-checked against OpenCV where applicable
(SURVEY.md §4 'Front-end golden tests')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from larvio_tpu.config import VioConfig
from larvio_tpu.data.sim import SimConfig, Simulator
from larvio_tpu.data.render import Renderer
from larvio_tpu.ops.detect import grid_topk, nms, shi_tomasi_response
from larvio_tpu.ops.image import build_pyramid, bilinear_sample
from larvio_tpu.ops.lk import lk_track, make_grad_pyramid
from larvio_tpu.ops.orb import describe, hamming
from larvio_tpu.ops.ransac import two_point_ransac

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def rendered_pair():
    """Two consecutive rendered frames with known camera motion."""
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

    return frame(6.0), frame(6.05), cfg


class TestPyramid:
    def test_matches_cv2_pyrdown(self, rendered_pair):
        img, _, _ = rendered_pair
        ours = np.asarray(build_pyramid(jnp.asarray(img), 2)[1])
        ref = cv2.pyrDown(img)
        # interior agreement (border handling differs)
        d = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert np.median(d) < 1.0 and d.mean() < 1.5

    def test_mxu_path_matches_shift_add(self, rng):
        # the TPU production path (banded matmuls) must equal the shift-add
        # reference to f32 rounding, including odd sizes / edge replication
        from larvio_tpu.ops.image import _pyr_down_mxu, pyr_down

        for shape in [(480, 752), (479, 751), (241, 377), (7, 9)]:
            im = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
            a = np.asarray(pyr_down(im))
            b = np.asarray(_pyr_down_mxu(im))
            assert a.shape == b.shape
            assert np.abs(a - b).max() < 1e-3, shape


class TestDetect:
    def test_corners_near_cv2_corners(self, rendered_pair):
        img, _, cfg = rendered_pair
        resp = nms(shi_tomasi_response(jnp.asarray(img)), radius=7)
        scores, xy = grid_topk(resp, 4, 5, 10, border=18)
        ours = np.asarray(xy).reshape(-1, 2)[np.asarray(scores).reshape(-1) > 15.0]
        ref = cv2.goodFeaturesToTrack(
            img.astype(np.uint8), 400, 0.01, 10
        ).reshape(-1, 2)
        d = np.sqrt(((ours[:, None, :] - ref[None, :, :]) ** 2).sum(-1)).min(1)
        # most of our corners coincide with an OpenCV corner
        assert (d < 3.0).mean() > 0.8, f"only {(d<3.0).mean():.2f} matched"


class TestLK:
    def test_tracks_match_cv2(self, rendered_pair):
        img0, img1, cfg = rendered_pair
        # detect in frame 0
        pts = cv2.goodFeaturesToTrack(img0.astype(np.uint8), 120, 0.05, 20, blockSize=5)
        pts = pts.reshape(-1, 2).astype(np.float32)
        # keep interior points so patch margins are satisfied
        H, W = img0.shape
        keep = (
            (pts[:, 0] > 25) & (pts[:, 0] < W - 25) & (pts[:, 1] > 25) & (pts[:, 1] < H - 25)
        )
        pts = pts[keep][:64]
        n = len(pts)
        assert n >= 30

        ref_pts, st, _ = cv2.calcOpticalFlowPyrLK(
            img0.astype(np.uint8), img1.astype(np.uint8), pts.reshape(-1, 1, 2), None,
            winSize=(15, 15), maxLevel=3,
        )
        ref_pts = ref_pts.reshape(-1, 2)
        st = st.reshape(-1).astype(bool)

        pyr0 = build_pyramid(jnp.asarray(img0), 3)
        pyr1 = build_pyramid(jnp.asarray(img1), 3)
        grads = make_grad_pyramid(pyr0)
        res = lk_track(
            pyr0, pyr1, grads,
            jnp.asarray(pts), jnp.asarray(pts), jnp.ones(n, bool),
            patch=15, iters=15, precision=0.01,
        )
        ours = np.asarray(res.pos)
        ok = np.asarray(res.valid) & st
        assert ok.sum() >= 0.7 * n
        err = np.linalg.norm(ours[ok] - ref_pts[ok], axis=1)
        assert np.median(err) < 0.5, f"median {np.median(err):.3f}px"
        assert (err < 1.5).mean() > 0.9


def _textured_image(rng, shape=(480, 640)):
    """Smoothed noise: corners are distinctive (the rendered sim scene's
    Gaussian blobs are all identical, which ORB correctly reports as
    indistinguishable — unusable for a distinctiveness test)."""
    img = rng.uniform(0, 255, shape).astype(np.float32)
    return cv2.GaussianBlur(img, (7, 7), 1.5)


class TestORB:
    def test_descriptor_stability_and_distinctiveness(self, rng):
        img0 = _textured_image(rng)
        H, W = img0.shape
        M = np.float32([[1, 0, 1.3], [0, 1, 0.7]])
        img1 = cv2.warpAffine(img0, M, (W, H))
        pts = cv2.goodFeaturesToTrack(img0.astype(np.uint8), 80, 0.03, 20).reshape(-1, 2)
        keep = (
            (pts[:, 0] > 25) & (pts[:, 0] < W - 25) & (pts[:, 1] > 25) & (pts[:, 1] < H - 25)
        )
        pts = pts[keep].astype(np.float32)
        n = len(pts)
        d0 = describe(jnp.asarray(img0), jnp.asarray(pts), jnp.ones(n, bool))
        d1 = describe(
            jnp.asarray(img1),
            jnp.asarray(pts + np.array([1.3, 0.7], np.float32)),
            jnp.ones(n, bool),
        )
        same = np.asarray(hamming(d0, d1))
        cross = np.asarray(hamming(d0, jnp.roll(d0, 1, axis=0)))
        assert np.median(same) < 30  # stable under subpixel shift
        assert np.median(cross) > 80  # distinct across different corners

    def test_rotation_invariance(self, rng):
        img0 = _textured_image(rng)
        # rotate the image 30 deg about a known point; descriptor should match
        H, W = img0.shape
        c = (W / 2, H / 2)
        M = cv2.getRotationMatrix2D(c, 30.0, 1.0)
        img_r = cv2.warpAffine(img0, M, (W, H))
        pts = cv2.goodFeaturesToTrack(img0.astype(np.uint8), 80, 0.05, 25).reshape(-1, 2)
        ptsh = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
        pts_r = (M @ ptsh.T).T.astype(np.float32)
        keep = (
            (pts[:, 0] > 40) & (pts[:, 0] < W - 40) & (pts[:, 1] > 40) & (pts[:, 1] < H - 40)
            & (pts_r[:, 0] > 40) & (pts_r[:, 0] < W - 40) & (pts_r[:, 1] > 40) & (pts_r[:, 1] < H - 40)
        )
        pts, pts_r = pts[keep].astype(np.float32), pts_r[keep]
        n = len(pts)
        d0 = describe(jnp.asarray(img0), jnp.asarray(pts), jnp.ones(n, bool))
        dr = describe(jnp.asarray(img_r), jnp.asarray(pts_r), jnp.ones(n, bool))
        same = np.asarray(hamming(d0, dr))
        assert np.median(same) < 60  # steered BRIEF survives 30 deg rotation


class TestRansac:
    def test_separates_outliers(self, rng):
        n = 100
        # random 3D points seen by two cameras with known rotation + translation
        p3 = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))
        from scipy.spatial.transform import Rotation as R_

        R = R_.from_euler("xyz", [0.02, -0.03, 0.05]).as_matrix()
        t = np.array([0.3, 0.1, 0.05])
        p1 = p3 / p3[:, 2:3]
        p3c = (R @ (p3 - t).T).T
        p2 = p3c / p3c[:, 2:3]
        p1, p2 = p1[:, :2].astype(np.float32), p2[:, :2].astype(np.float32)
        # corrupt 20 correspondences
        out_idx = rng.choice(n, 20, replace=False)
        p2_bad = p2.copy()
        p2_bad[out_idx] += rng.uniform(0.02, 0.08, (20, 2)) * rng.choice([-1, 1], (20, 2))

        res = two_point_ransac(
            jnp.asarray(p1), jnp.asarray(p2_bad), jnp.asarray(R.astype(np.float32)),
            jnp.ones(n, bool), jax.random.PRNGKey(0), threshold=3.0 / 458.0,
        )
        inl = np.asarray(res.inliers)
        is_out = np.zeros(n, bool)
        is_out[out_idx] = True
        assert inl[~is_out].mean() > 0.9  # keeps the good ones
        assert inl[is_out].mean() < 0.3  # kills most outliers

    def test_degenerate_pure_rotation(self, rng):
        n = 60
        p3 = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))
        from scipy.spatial.transform import Rotation as R_

        R = R_.from_euler("xyz", [0.02, -0.03, 0.05]).as_matrix()
        p1 = (p3 / p3[:, 2:3])[:, :2].astype(np.float32)
        p3c = (R @ p3.T).T
        p2 = (p3c / p3c[:, 2:3])[:, :2].astype(np.float32)
        res = two_point_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(R.astype(np.float32)),
            jnp.ones(n, bool), jax.random.PRNGKey(1), threshold=3.0 / 458.0,
        )
        assert bool(res.degenerate)
        assert np.asarray(res.inliers).mean() > 0.95

    def test_partially_valid_mask(self, rng):
        """Padded tables are never fully valid in production — the degenerate
        gate must be computed from valid slots only (ADVICE r1 high: a NaN-
        poisoned median made every frame 'degenerate', disabling RANSAC)."""
        n, n_valid = 100, 60
        p3 = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))
        from scipy.spatial.transform import Rotation as R_

        R = R_.from_euler("xyz", [0.02, -0.03, 0.05]).as_matrix()
        t = np.array([0.3, 0.1, 0.05])
        p1 = (p3 / p3[:, 2:3])[:, :2].astype(np.float32)
        p3c = (R @ (p3 - t).T).T
        p2 = (p3c / p3c[:, 2:3])[:, :2].astype(np.float32)
        valid = np.zeros(n, bool)
        valid[:n_valid] = True
        # garbage in the invalid (padding) slots, as in the real feature table
        p1[~valid] = 0.0
        p2[~valid] = 0.0
        out_idx = rng.choice(n_valid, 12, replace=False)
        p2[out_idx] += 0.05
        res = two_point_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(R.astype(np.float32)),
            jnp.asarray(valid), jax.random.PRNGKey(2), threshold=3.0 / 458.0,
        )
        assert not bool(res.degenerate)  # real translation, not pure rotation
        inl = np.asarray(res.inliers)
        assert not inl[~valid].any()  # padding never marked inlier
        is_out = np.zeros(n, bool)
        is_out[out_idx] = True
        assert inl[valid & ~is_out].mean() > 0.9
        assert inl[is_out].mean() < 0.3

    def test_masked_median_matches_numpy(self, rng):
        from larvio_tpu.ops.ransac import masked_median

        for trial in range(20):
            n = 33
            x = rng.normal(size=n).astype(np.float32)
            k = int(rng.integers(0, n + 1))
            mask = np.zeros(n, bool)
            mask[rng.choice(n, k, replace=False)] = True
            got = float(masked_median(jnp.asarray(x), jnp.asarray(mask)))
            want = float(np.median(x[mask])) if k else 0.0
            assert got == pytest.approx(want, abs=1e-6), (trial, k)
