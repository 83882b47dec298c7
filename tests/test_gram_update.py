"""Unit-pins for the Woodbury/Gram square-root update (VERDICT r3 #4).

sqrt_update_gram (update.py) landed in the r3 end-of-round snapshot with only
transitive coverage (end-to-end sqrt-vs-Joseph trajectory parity). Pinned
directly here:

  * tall (n > D) Gram path == small-n stacked-Joseph sqrt_update == dense
    Joseph update on random whitened systems (dx and implied covariance),
    including zero padding rows
  * the refactor=True contract that slam promotion relies on: freed slots'
    (zero-row) factor COLUMNS are structurally zero after the update
  * refactor=False documents the hazard: the output factor is NOT
    column-structured (this is why msckf gates promotion on the update's
    finite verdict and passes refactor=(S==0) for the marginalization update)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from larvio_tpu.core.linalg import joseph_update
from larvio_tpu.models.update import sqrt_update, sqrt_update_gram


def _random_system(rng, D, n, n_pad=0, zero_rows=()):
    """Well-conditioned random factor S0 (D,D), whitened rows Hw (n,D), rw."""
    A = rng.normal(size=(D, D)).astype(np.float32)
    # factor with spread singular values but benign f32 conditioning
    U, _ = np.linalg.qr(rng.normal(size=(D, D)))
    V, _ = np.linalg.qr(rng.normal(size=(D, D)))
    sv = np.logspace(0, -2, D)
    S0 = (U * sv) @ V.T
    S0 = S0.astype(np.float32)
    Hw = rng.normal(size=(n, D)).astype(np.float32)
    rw = rng.normal(size=(n,)).astype(np.float32)
    if n_pad:
        Hw[-n_pad:] = 0.0
        rw[-n_pad:] = 0.0
    for i in zero_rows:
        # freed slot: no information touches it, no prior either
        S0[i, :] = 0.0
        Hw[:, i] = 0.0
    return S0, Hw, rw


def _implied(S):
    S = np.asarray(S, np.float64)
    return S @ S.T


class TestGramUpdateParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_tall_gram_vs_stacked_vs_joseph(self, seed):
        rng = np.random.default_rng(seed)
        D, n = 24, 60  # tall: n > D exercises the Gram branch of apply_update
        S0, Hw, rw = _random_system(rng, D, n, n_pad=13)
        P0 = _implied(S0).astype(np.float32)

        dx_j, P_j = joseph_update(jnp.asarray(P0), jnp.asarray(Hw), jnp.asarray(rw), 1.0)
        dx_g, S_g = sqrt_update_gram(jnp.asarray(S0), jnp.asarray(Hw), jnp.asarray(rw), refactor=True)
        dx_g0, S_g0 = sqrt_update_gram(jnp.asarray(S0), jnp.asarray(Hw), jnp.asarray(rw), refactor=False)
        dx_s, S_s = sqrt_update(jnp.asarray(S0), jnp.asarray(Hw), jnp.asarray(rw))

        dx_j = np.asarray(dx_j)
        scale_dx = max(np.abs(dx_j).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(dx_g), dx_j, atol=2e-4 * scale_dx + 1e-6)
        np.testing.assert_allclose(np.asarray(dx_g0), dx_j, atol=2e-4 * scale_dx + 1e-6)
        np.testing.assert_allclose(np.asarray(dx_s), dx_j, atol=2e-4 * scale_dx + 1e-6)

        P_j = np.asarray(P_j, np.float64)
        scale_P = max(np.abs(P_j).max(), 1e-8)
        for S_out in (S_g, S_g0, S_s):
            np.testing.assert_allclose(
                _implied(S_out) / scale_P, P_j / scale_P, atol=5e-4
            )

    def test_small_stacked_vs_joseph(self):
        rng = np.random.default_rng(3)
        D, n = 30, 9  # the ZUPT-sized small-system branch
        S0, Hw, rw = _random_system(rng, D, n)
        P0 = _implied(S0).astype(np.float32)
        dx_j, P_j = joseph_update(jnp.asarray(P0), jnp.asarray(Hw), jnp.asarray(rw), 1.0)
        dx_s, S_s = sqrt_update(jnp.asarray(S0), jnp.asarray(Hw), jnp.asarray(rw))
        np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_j), atol=1e-4)
        P_j = np.asarray(P_j, np.float64)
        scale = max(np.abs(P_j).max(), 1e-8)
        np.testing.assert_allclose(_implied(S_s) / scale, P_j / scale, atol=5e-4)


class TestRefactorColumnContract:
    """promote_features writes sigma-W noise factors into a freed slot's OWN
    columns and requires them structurally zero beforehand (slam.py)."""

    ZERO = (5, 6, 7, 18)

    def _updated(self, refactor):
        rng = np.random.default_rng(7)
        D, n = 24, 70
        S0, Hw, rw = _random_system(rng, D, n, zero_rows=self.ZERO)
        _, S_out = sqrt_update_gram(
            jnp.asarray(S0), jnp.asarray(Hw), jnp.asarray(rw), refactor=refactor
        )
        return np.asarray(S_out)

    def test_refactor_true_zeroes_freed_columns_and_rows(self):
        S_out = self._updated(refactor=True)
        live = np.abs(S_out).max()
        for i in self.ZERO:
            # rows: the slot carries no variance
            assert np.abs(S_out[i, :]).max() < 1e-6 * live, i
            # columns: no OTHER state leans on the freed slot's basis
            # direction — the structural-zero contract promotion requires
            col = np.delete(S_out[:, i], list(self.ZERO))
            assert np.abs(col).max() < 1e-6 * live, i

    def test_refactor_false_rows_zero_columns_not_guaranteed(self):
        S_out = self._updated(refactor=False)
        live = np.abs(S_out).max()
        for i in self.ZERO:
            # rows still zero (S L^{-T} keeps zero rows zero)...
            assert np.abs(S_out[i, :]).max() < 1e-6 * live, i
        # ...but the columns are NOT structurally zero in general: L^{-T}
        # mixes basis directions. This is the documented hazard that makes
        # refactor=True mandatory before promote_features runs.
        col_mass = max(
            np.abs(np.delete(S_out[:, i], list(self.ZERO))).max() for i in self.ZERO
        )
        assert col_mass > 1e-4 * live  # the hazard is real, not hypothetical
