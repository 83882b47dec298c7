"""ORB slab-extraction Pallas kernel equivalence tests.

ops/orb._slabs_pallas is the TPU path for descriptor patch extraction (the
vmapped dynamic_slice serializes into a per-feature while loop on TPU);
_slabs_xla is the correctness baseline. Interpret mode runs the exact kernel
program on CPU; a TPU-gated test re-checks compiled parity (Mosaic has
miscompiled roll patterns that interpret mode does not catch — see
ops/lk_pallas.py slab_at notes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from larvio_tpu.ops.orb import (
    PATCH,
    _r,
    _slabs_pallas_impl,
    _slabs_xla,
    describe,
)


def _problem(rng, H=480, W=752, F=48):
    img = rng.uniform(0.0, 255.0, (H, W)).astype(np.float32)
    pos = rng.uniform([0, 0], [W - 1, H - 1], (F, 2)).astype(np.float32)
    # exercise every clamp/alignment branch: corners, edges, the aligned-load
    # clamp region near the right/bottom borders, and sub-pixel rounding
    pos[0] = [0.0, 0.0]
    pos[1] = [W - 1.0, H - 1.0]
    pos[2] = [W - 1.0, 0.0]
    pos[3] = [0.0, H - 1.0]
    pos[4] = [W - _r - 1.4, H / 2]      # right clamp boundary
    pos[5] = [W / 2, H - _r - 1.4]      # bottom clamp boundary
    pos[6] = [_r + 0.49, _r + 0.51]     # rounding on both sides
    pos[7] = [W - 20.5, H - 20.5]       # load-window clamp (xa = Wp-256)
    pos[8] = [np.nan, np.nan]           # invalid slot: must not crash
    return jnp.asarray(img), jnp.asarray(pos)


def test_interpret_matches_xla(rng):
    img, pos = _problem(rng)
    ref = np.asarray(_slabs_xla(img, pos))
    got = np.asarray(_slabs_pallas_impl(img, pos, interpret=True))
    # the NaN slot's content is unspecified on both paths (clamped garbage);
    # every finite-position slab must match exactly
    finite = np.isfinite(np.asarray(pos)).all(axis=1)
    np.testing.assert_array_equal(got[finite], ref[finite])
    assert got.shape == (pos.shape[0], PATCH, PATCH)


def test_interpret_small_image(rng):
    # image smaller than one (64, 256) load window: the Hp/Wp floors kick in
    img, pos = _problem(rng, H=50, W=120, F=16)
    ref = np.asarray(_slabs_xla(img, pos))
    got = np.asarray(_slabs_pallas_impl(img, pos, interpret=True))
    finite = np.isfinite(np.asarray(pos)).all(axis=1)
    np.testing.assert_array_equal(got[finite], ref[finite])


def test_describe_fleet_vmap_runs(rng):
    # the custom_vmap fallback keeps the fleet path on XLA gather semantics
    B, F, H, W = 2, 16, 96, 128
    imgs = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    pos = jnp.asarray(rng.uniform([20, 20], [W - 20, H - 20], (B, F, 2)).astype(np.float32))
    valid = jnp.ones((B, F), bool)
    d = jax.vmap(describe)(imgs, pos, valid)
    assert d.shape == (B, F, 8)
    assert np.asarray(d).any()


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs a real TPU attached",
)
def test_compiled_tpu_matches_xla(rng):
    img, pos = _problem(rng)
    ref = np.asarray(_slabs_xla(img, pos))
    dev = jax.devices()[0]
    got = np.asarray(
        _slabs_pallas_impl(jax.device_put(img, dev), jax.device_put(pos, dev))
    )
    finite = np.isfinite(np.asarray(pos)).all(axis=1)
    np.testing.assert_array_equal(got[finite], ref[finite])
