"""EuRoC ASL dataset toolkit (non-ROS entry path).

Counterpart of the reference's EuRoC readers under ref:app/ (SURVEY.md §2
"Non-ROS EuRoC toolkit": reads mav0/cam0/data.csv + PNGs and mav0/imu0/
data.csv, time-sorts, feeds the pipeline, writes a TUM trajectory).

Host-side by design (disk I/O); the per-frame IMU bucketing produces exactly
the padded ImuBatch layout the on-device pipeline consumes (slot 0 = the
sample at/before the previous frame so propagation can seed its interval,
plus a margin past the frame for online-td propagation).

A native C++ CSV parser (native/euroc_loader.cpp, built via ctypes) is used
when available — the reference's loader is C++ and large sequences parse
~10x faster; the numpy fallback is always correct.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from larvio_tpu.config import VioConfig


def _load_csv_native(path: str, n_cols: int) -> Optional[np.ndarray]:
    try:
        from larvio_tpu.utils.native import load_csv  # ctypes binding

        return load_csv(path, n_cols)
    except Exception:
        return None


def _load_csv(path: str, n_cols: int) -> np.ndarray:
    out = _load_csv_native(path, n_cols)
    if out is not None:
        return out
    return np.loadtxt(path, delimiter=",", comments="#", usecols=range(n_cols), ndmin=2)


class EurocSequence:
    """One EuRoC ASL sequence directory (the folder containing mav0/)."""

    def __init__(self, root: str, cam: str = "cam0", imu: str = "imu0"):
        mav = os.path.join(root, "mav0") if os.path.isdir(os.path.join(root, "mav0")) else root
        self.cam_dir = os.path.join(mav, cam, "data")
        cam_csv = os.path.join(mav, cam, "data.csv")
        imu_csv = os.path.join(mav, imu, "data.csv")
        gt_csv = os.path.join(mav, "state_groundtruth_estimate0", "data.csv")

        # image stamps name the PNG files: parse as exact int64 (EuRoC ns
        # stamps ~1.4e18 exceed float64's 2^53 integer range)
        stamps = []
        with open(cam_csv) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                stamps.append(int(line.split(",")[0]))
        self.image_stamps = np.sort(np.array(stamps, np.int64))
        imu_data = _load_csv(imu_csv, 7)
        order = np.argsort(imu_data[:, 0])
        imu_data = imu_data[order]
        self.imu_t = imu_data[:, 0].astype(np.int64)
        self.imu_w = imu_data[:, 1:4].astype(np.float32)
        self.imu_a = imu_data[:, 4:7].astype(np.float32)

        self.gt = None
        if os.path.exists(gt_csv):
            g = _load_csv(gt_csv, 8)
            self.gt = {
                "t": g[:, 0].astype(np.int64),
                "p": g[:, 1:4].astype(np.float64),
                "q_wxyz": g[:, 4:8].astype(np.float64),
            }

        # common clock origin so f32 timestamps keep microsecond resolution
        self.t0 = int(min(self.image_stamps[0], self.imu_t[0]))

    def _sec(self, ns: np.ndarray) -> np.ndarray:
        return ((np.asarray(ns) - self.t0) * 1e-9).astype(np.float64)

    def load_image(self, stamp_ns: int) -> np.ndarray:
        import cv2

        path = os.path.join(self.cam_dir, f"{stamp_ns}.png")
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        # keep uint8: the streaming path ships this to the device (possibly
        # over a network tunnel) — 4x less traffic than f32; the pipeline
        # casts on device (pipeline_step)
        return img

    def frames(self, cfg: VioConfig, max_frames: Optional[int] = None,
               skip_frames: int = 0, lazy: bool = False) -> Iterator[dict]:
        """Yield per-frame dicts: image + padded ImuBatch arrays + t_img.

        lazy=True yields "image" as a zero-arg callable instead of the decoded
        array — the CLI's prefetcher resolves these on a thread pool so PNG
        decodes run concurrently (cv2 releases the GIL)."""
        S = cfg.filter.imu_slots_per_frame
        imu_sec = self._sec(self.imu_t)
        stamps = self.image_stamps[skip_frames:]
        if max_frames:
            stamps = stamps[:max_frames]
        t_prev = 0.0
        for k, ns in enumerate(stamps):
            t_img = float(self._sec(ns))
            # samples: one at/before t_prev (interval seed) .. margin past t_img
            lo = np.searchsorted(imu_sec, t_prev, side="right") - 1
            hi = np.searchsorted(imu_sec, t_img + 0.04, side="right")
            lo = max(lo, 0)
            sel = slice(lo, min(hi, lo + S))
            n = sel.stop - sel.start
            it = np.zeros(S, np.float32)
            iw = np.zeros((S, 3), np.float32)
            ia = np.zeros((S, 3), np.float32)
            iv = np.zeros(S, bool)
            it[:n] = imu_sec[sel]
            iw[:n] = self.imu_w[sel]
            ia[:n] = self.imu_a[sel]
            iv[:n] = True
            yield {
                "image": (
                    (lambda s=int(ns): self.load_image(s))
                    if lazy
                    else self.load_image(int(ns))
                ),
                "imu_t": it,
                "imu_w": iw,
                "imu_a": ia,
                "imu_valid": iv,
                "t_img": np.float32(t_img),
            }
            t_prev = t_img

    def ground_truth_at(self, t_sec: np.ndarray):
        """Interpolated ground-truth positions at the given times."""
        assert self.gt is not None, "sequence has no ground truth"
        gt_t = self._sec(self.gt["t"])
        p = np.stack(
            [np.interp(t_sec, gt_t, self.gt["p"][:, i]) for i in range(3)], axis=-1
        )
        return p
