"""Clone-window pruning: redundancy selection + covariance row removal.

Counterpart of ref:src/larvio.cpp findRedundantCamStates() /
pruneCamStateBuffer() (SURVEY.md §3.3). The reference erases map entries and
shrinks the covariance; here a pruned clone's slot just flips its mask bit and
its covariance rows/columns are zeroed — the slot is then reused by a later
augmentation.

Selection follows the published keyframe-style heuristic (also used by the
MSCKF family): compare the two clones following the "key" (fourth-newest)
clone against it — if their relative motion is small they are near-duplicates
and get removed, otherwise the oldest clones go.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig
from larvio_tpu.core.quaternion import quat_inverse, quat_multiply, quat_to_rotation
from larvio_tpu.core.so3 import so3_log
from larvio_tpu.models.state import FilterState, CLONE_BASE, CLONE_DIM, state_dim


def select_redundant(cfg: VioConfig, fs: FilterState) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pick 2 clone slots to remove (window full). Returns (slot_a, slot_b)."""
    C = cfg.filter.max_clones
    fcfg = cfg.filter
    frame = jnp.where(fs.clones.valid, fs.clones.frame, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(frame)  # oldest first; invalid slots sort last
    n = jnp.sum(fs.clones.valid)

    # key clone = fourth newest; candidates = third and second newest
    key = order[jnp.maximum(n - 4, 0)]
    cand1 = order[jnp.maximum(n - 3, 0)]
    cand2 = order[jnp.maximum(n - 2, 0)]

    q_key, p_key = fs.clones.q[key], fs.clones.p[key]

    def is_close(slot):
        dq = quat_multiply(fs.clones.q[slot], quat_inverse(q_key))
        ang = jnp.linalg.norm(so3_log(quat_to_rotation(dq)))
        dist = jnp.linalg.norm(fs.clones.p[slot] - p_key)
        return (ang < fcfg.redundancy_angle_threshold) & (
            dist < fcfg.redundancy_distance_threshold
        )

    oldest1 = order[0]
    oldest2 = order[1]
    close1 = is_close(cand1)
    slot_a = jnp.where(close1, cand1, oldest1)
    # second pick: avoid choosing the same slot twice
    close2 = is_close(cand2)
    next_oldest = jnp.where(close1, oldest1, oldest2)
    slot_b = jnp.where(close2, cand2, next_oldest)
    return slot_a, slot_b


def remove_clones(cfg: VioConfig, fs: FilterState, slot_a, slot_b, do_prune) -> FilterState:
    """Clear 2 clone slots: mask bits, observation columns, covariance rows/cols."""
    C = cfg.filter.max_clones
    D = state_dim(cfg)
    sel = (jax.nn.one_hot(slot_a, C, dtype=bool) | jax.nn.one_hot(slot_b, C, dtype=bool)) & do_prune

    clones = fs.clones.replace(valid=fs.clones.valid & ~sel)
    obs = fs.obs.replace(valid=fs.obs.valid & ~sel[None, :])

    # zero covariance rows/cols of both slots (exactness of the padded P).
    # Factor form: zeroing the slot's ROWS of S zeroes the implied P rows AND
    # cols (P = S S^T); the slot's factor columns are basis directions shared
    # with other states and must NOT be zeroed.
    # one masked write for both slots: a row belongs to clone (row-base)//6;
    # ``sel`` already carries do_prune. jnp.where (not a 0/1 multiply) so
    # poisoned (NaN/inf) rows still clear exactly.
    P = fs.P
    ar = jnp.arange(D)
    in_clones = (ar >= CLONE_BASE) & (ar < CLONE_BASE + C * CLONE_DIM)
    row_cleared = in_clones & jnp.take(
        sel, jnp.clip((ar - CLONE_BASE) // CLONE_DIM, 0, C - 1)
    )
    P = jnp.where(row_cleared[:, None], jnp.zeros((), P.dtype), P)
    if not cfg.filter.sqrt_form:
        P = jnp.where(row_cleared[None, :], jnp.zeros((), P.dtype), P)

    return fs.replace(clones=clones, obs=obs, P=P)
