"""Observation-space analysis diagnostics.

Standard data-assimilation consistency checks the reference does not
compute: innovation (O-B) and residual (O-A) statistics and the chi-square
consistency ratio

    chi2 = mean( (y - xa)^2 / (Sa + So) )

which should be ~1 when the prescribed error variances are consistent with
the actual innovations (Desroziers-style sanity check).  All jitted,
NaN-aware, shard-friendly reductions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["InnovationStats", "innovation_stats"]


class InnovationStats(NamedTuple):
    n: jax.Array  # cells with all inputs finite
    omb_mean: jax.Array  # mean(y - xa)        (bias of the prior)
    omb_rms: jax.Array  # rms(y - xa)
    oma_mean: jax.Array  # mean(y - xb)        (bias of the posterior)
    oma_rms: jax.Array  # rms(y - xb)
    chi2: jax.Array  # mean((y-xa)^2 / (Sa+So)) — expect ~1


def _masked_mean(x, m):
    c = jnp.sum(m)
    return jnp.where(c > 0, jnp.sum(jnp.where(m, x, 0.0)) / c, jnp.nan)


@jax.jit
def innovation_stats(xa, y, xb, sa, so) -> InnovationStats:
    """All inputs one shape; NaN cells excluded from every statistic."""
    xa = jnp.asarray(xa)
    y = jnp.asarray(y)
    xb = jnp.asarray(xb)
    sa = jnp.asarray(sa)
    so = jnp.asarray(so)
    m = (jnp.isfinite(xa) & jnp.isfinite(y) & jnp.isfinite(xb)
         & jnp.isfinite(sa) & jnp.isfinite(so))
    omb = y - xa
    oma = y - xb
    denom = sa + so
    chi = jnp.where(denom > 0, omb * omb / denom, jnp.nan)
    mchi = m & jnp.isfinite(chi)
    return InnovationStats(
        n=jnp.sum(m),
        omb_mean=_masked_mean(omb, m),
        omb_rms=jnp.sqrt(_masked_mean(omb * omb, m)),
        oma_mean=_masked_mean(oma, m),
        oma_rms=jnp.sqrt(_masked_mean(oma * oma, m)),
        chi2=_masked_mean(chi, mchi),
    )
