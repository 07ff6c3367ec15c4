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

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["InnovationStats", "innovation_stats", "DesroziersEstimate",
           "desroziers_estimates", "desroziers_binned", "lat_band_index"]


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


def lat_band_index(lat2d, n_bins: int) -> np.ndarray:
    """Uniform latitude-band labels (int32, same shape as ``lat2d``) for
    :func:`desroziers_binned` — host NumPy, built once per analysis.

    Non-finite latitudes get the label ``-1`` ("no band"): a NaN
    coordinate must not contaminate a real band's moments (oi_full guards
    NaN coords the same way), and :func:`desroziers_binned` excludes
    negative labels from every statistic."""
    lat = np.asarray(lat2d, np.float64)
    finite = np.isfinite(lat)
    if not finite.any():
        return np.full(lat.shape, -1, np.int32)
    lo = float(np.nanmin(lat))
    span = max(float(np.nanmax(lat)) - lo, 1e-12)
    idx = np.floor((np.where(finite, lat, lo) - lo) / span * n_bins).astype(np.int32)
    return np.where(finite, np.clip(idx, 0, n_bins - 1), -1).astype(np.int32)


@partial(jax.jit, static_argnames=("n_bins",))
def desroziers_binned(xa, y, xb, sa, so, bins, n_bins: int) -> DesroziersEstimate:
    """Spatially-binned Desroziers diagnostics: the cross-moments of
    :func:`desroziers_estimates` evaluated per region label (e.g. latitude
    bands from :func:`lat_band_index`), returning per-bin (B,) diagnosed
    variances and scale factors.

    What binning identifies — and what it cannot: for the scalar H=I
    analysis, ``d_oa = (1-K) d_ob`` holds cell-by-cell, so the Sa/So
    *split within a bin* is gain-determined (same identifiability limit as
    the global estimator).  What the bins DO recover is the spatial
    structure of the total error: each bin's diagnosed ``sa_hat + so_hat``
    equals that bin's innovation variance exactly, so a north/south error
    contrast shows up in the per-bin scales and per-band chi^2 converges
    to 1 everywhere — the global estimator leaves the prescribed variances
    spatially flat and per-band chi^2 wrong wherever the truth varies
    (see tests/test_desroziers.py).  Segment-sum reductions — one pass,
    shard-friendly.
    """
    xa, y, xb = jnp.asarray(xa), jnp.asarray(y), jnp.asarray(xb)
    sa, so = jnp.asarray(sa), jnp.asarray(so)
    bins = jnp.asarray(bins, jnp.int32).ravel()
    # negative labels mean "no band" (non-finite coordinates,
    # lat_band_index); exclude those cells and point them at segment 0
    # with zero weight so segment_sum stays in range
    m = (jnp.isfinite(xa) & jnp.isfinite(y) & jnp.isfinite(xb)
         & jnp.isfinite(sa) & jnp.isfinite(so)).ravel() & (bins >= 0)
    seg = jnp.where(bins >= 0, bins, 0)
    w = m.astype(xa.dtype)
    c = jax.ops.segment_sum(w, seg, num_segments=n_bins)

    def bmean(v):
        s = jax.ops.segment_sum(jnp.where(m, v.ravel(), 0.0), seg,
                                num_segments=n_bins)
        return jnp.where(c > 0, s / c, jnp.nan)

    d_ob = (y - xa).ravel()
    d_oa = (y - xb).ravel()
    d_ab = (xb - xa).ravel()
    so_hat = bmean(d_oa * d_ob)
    sa_hat = bmean(d_ab * d_ob)
    so_mean = bmean(so)
    sa_mean = bmean(sa)

    def scale(hat, mean):
        s = hat / mean
        ok = jnp.isfinite(s) & (s > 0)
        return jnp.clip(jnp.where(ok, s, 1.0), 1e-4, 1e4)

    return DesroziersEstimate(so_hat=so_hat, sa_hat=sa_hat,
                              so_scale=scale(so_hat, so_mean),
                              sa_scale=scale(sa_hat, sa_mean), n=c)
