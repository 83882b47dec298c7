"""Trajectory output in the reference's format (compatibility contract).

The reference writes TUM-style lines ``t x y z qx qy qz qw`` (SURVEY.md §5
"Metrics / logging": the output format must be preserved, BASELINE.json:5).
Pose convention: position of the IMU in the world frame and the **Hamilton
world<-IMU** quaternion (the TUM convention), converted from our internal JPL
world->IMU representation (conjugate + reorder is the identity here: JPL
[x,y,z,w] global->local equals Hamilton local->global [x,y,z,w]).
"""

from __future__ import annotations

import numpy as np


def write_tum(path: str, t: np.ndarray, p: np.ndarray, q_jpl_wi: np.ndarray) -> None:
    """t (N,), p (N,3), q_jpl_wi (N,4) JPL world->IMU [x,y,z,w]."""
    # JPL q (global->local) has the same numbers as the Hamilton quaternion of
    # the inverse rotation (local->global), which is exactly body-in-world.
    q = np.asarray(q_jpl_wi)
    with open(path, "w") as f:
        for i in range(len(t)):
            f.write(
                f"{t[i]:.9f} {p[i,0]:.6f} {p[i,1]:.6f} {p[i,2]:.6f} "
                f"{q[i,0]:.6f} {q[i,1]:.6f} {q[i,2]:.6f} {q[i,3]:.6f}\n"
            )


def read_tum(path: str):
    data = np.loadtxt(path)
    return data[:, 0], data[:, 1:4], data[:, 4:8]
