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

__all__ = ["InnovationStats", "innovation_stats", "DesroziersEstimate",
           "desroziers_estimates"]


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


class DesroziersEstimate(NamedTuple):
    so_hat: jax.Array  # diagnosed mean observation-error variance E[d_oa d_ob]
    sa_hat: jax.Array  # diagnosed mean background-error variance E[d_ab d_ob]
    so_scale: jax.Array  # so_hat / mean(prescribed So)
    sa_scale: jax.Array  # sa_hat / mean(prescribed Sa)
    n: jax.Array


@jax.jit
def desroziers_estimates(xa, y, xb, sa, so) -> DesroziersEstimate:
    """Desroziers et al. (2005, QJRMS 131:3385) observation-space error
    diagnostics for the per-cell scalar analysis (H = I):

        E[(y - xb)(y - xa)] = R    ->  so_hat
        E[(xb - xa)(y - xa)] = B   ->  sa_hat

    The expectations are grid means, so the diagnosed values rescale the
    *mean* prescribed variances; per-cell structure is kept by applying the
    scale factors multiplicatively (clipped to [1e-4, 1e4] — the raw
    moments can go negative on small/biased samples, in which case the
    scale falls back to 1).  Capability extension over the reference
    (CLAUDE.md round-2 priority 5; extends optimal_interpolation.py:6-52).
    """
    xa, y, xb = jnp.asarray(xa), jnp.asarray(y), jnp.asarray(xb)
    sa, so = jnp.asarray(sa), jnp.asarray(so)
    m = (jnp.isfinite(xa) & jnp.isfinite(y) & jnp.isfinite(xb)
         & jnp.isfinite(sa) & jnp.isfinite(so))
    d_ob = y - xa
    d_oa = y - xb
    d_ab = xb - xa
    so_hat = _masked_mean(d_oa * d_ob, m)
    sa_hat = _masked_mean(d_ab * d_ob, m)
    so_mean = _masked_mean(so, m)
    sa_mean = _masked_mean(sa, m)

    def scale(hat, mean):
        s = hat / mean
        ok = jnp.isfinite(s) & (s > 0)
        return jnp.clip(jnp.where(ok, s, 1.0), 1e-4, 1e4)

    return DesroziersEstimate(so_hat=so_hat, sa_hat=sa_hat,
                              so_scale=scale(so_hat, so_mean),
                              sa_scale=scale(sa_hat, sa_mean),
                              n=jnp.sum(m))
