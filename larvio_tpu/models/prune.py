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
from larvio_tpu.models.state import FilterState, clone_offset, CLONE_DIM, state_dim


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
    P = fs.P
    zero6 = jnp.zeros((CLONE_DIM, D), P.dtype)
    for slot in (slot_a, slot_b):
        off = clone_offset(slot)
        Pa = jax.lax.dynamic_update_slice(P, zero6, (off, 0))
        if not cfg.filter.sqrt_form:
            Pa = jax.lax.dynamic_update_slice(Pa, zero6.T, (0, off))
        P = jnp.where(do_prune, Pa, P)

    return fs.replace(clones=clones, obs=obs, P=P)
