"""Kneedle knee-point detection, jittable.

The reference picks the OI regularization factor as the knee of the
mean-averaging-kernel-vs-regularization curve using ``kneed.KneeLocator``
(reference oisatgmi/optimal_interpolation.py:35-43, direction='increasing',
i.e. curve='concave', S=1.0, offline).  ``kneed`` implements the Kneedle
algorithm (Satopaa et al., 2011, "Finding a 'Kneedle' in a Haystack").

We re-implement Kneedle twice:

  * :func:`kneedle_index_np` — a plain NumPy implementation, the golden
    reference for tests.
  * :func:`kneedle_index` — a JAX implementation of the same state machine
    with static shapes (a masked scan over the curve), usable inside ``jit``
    so the whole OI analysis stays on device.

Both return the *index* into ``x`` of the knee, or ``fallback`` (default 0)
when no knee is found — mirroring the reference's
``knee_index = argwhere(x == kneedle.knee); if empty -> [0]``
(reference oisatgmi/optimal_interpolation.py:38-43).

Algorithm (concave, increasing, offline):
  1. min-max normalize x and y,
  2. difference curve  d = y_n - x_n,
  3. local extrema of d with clipped-boundary >=/<= comparisons,
  4. per-maximum threshold  T = d[max] - S * mean(|diff(x_n)|),
  5. walk the curve from the first maximum; at each local max reset the
     threshold, at each local min reset it to 0; the first time the *next*
     point drops below the current threshold, the knee is the most recent
     local maximum.  Stop at x_n == 1.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _extrema_masks_np(d: np.ndarray):
    left = np.concatenate([d[:1], d[:-1]])
    right = np.concatenate([d[1:], d[-1:]])
    is_max = (d >= left) & (d >= right)
    is_min = (d <= left) & (d <= right)
    return is_max, is_min


def kneedle_index_np(x: np.ndarray, y: np.ndarray, S: float = 1.0, fallback: int = 0) -> int:
    """NumPy Kneedle (concave / increasing / offline). Returns index into x."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.size
    if n < 2 or not np.all(np.isfinite(y)):
        # NaN curves (e.g. an all-NaN analysis domain) have no knee; the
        # reference then falls back to index 0.  Mirrored by `curve_ok` in
        # the JAX version below.
        return fallback
    if y.max() == y.min():
        return fallback  # flat curve: no knee (and no 0/0 warning)
    x_n = (x - x.min()) / (x.max() - x.min())
    y_n = (y - y.min()) / (y.max() - y.min())
    d = y_n - x_n
    is_max, is_min = _extrema_masks_np(d)
    if not is_max.any():
        return fallback
    t_offset = S * np.abs(np.diff(x_n).mean())
    first_max = int(np.argmax(is_max))
    threshold = 0.0
    threshold_index = fallback
    for i in range(n):
        if i < first_max:
            continue
        if x_n[i] == 1.0:
            break
        if is_max[i]:
            threshold = d[i] - t_offset
            threshold_index = i
        if is_min[i]:
            threshold = 0.0
        if i + 1 >= n:  # unsorted x can skip the x_n==1.0 stop
            break
        if d[i + 1] < threshold:
            return threshold_index
    return fallback


def kneedle_index(x: jnp.ndarray, y: jnp.ndarray, S: float = 1.0, fallback: int = 0) -> jnp.ndarray:
    """Jittable Kneedle (concave / increasing / offline).

    ``x`` must be statically shaped and strictly increasing.  Returns an
    int32 scalar index into ``x`` (``fallback`` when no knee found).
    Implemented as a masked ``lax.scan`` over the 99-point curve — negligible
    cost next to the field computations it gates.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    x_n = (x - x.min()) / (x.max() - x.min())
    y_min = jnp.nanmin(y)
    y_max = jnp.nanmax(y)
    y_n = (y - y_min) / (y_max - y_min)
    d = y_n - x_n
    left = jnp.concatenate([d[:1], d[:-1]])
    right = jnp.concatenate([d[1:], d[-1:]])
    is_max = (d >= left) & (d >= right)
    is_min = (d <= left) & (d <= right)
    any_max = is_max.any()
    t_offset = S * jnp.abs(jnp.diff(x_n).mean())
    first_max = jnp.argmax(is_max)  # index of first True (0 if none; gated by any_max)
    d_next = right  # d[i+1]; last entry unused (the x_n==1 stop fires first)

    curve_ok = any_max & jnp.all(jnp.isfinite(y))

    def step(carry, inp):
        found, knee_idx, threshold, threshold_index, stopped = carry
        i, di, dnext, imax, imin, xni = inp
        active = (~stopped) & (~found) & (i >= first_max) & curve_ok
        stop_here = xni == 1.0
        stopped = stopped | (active & stop_here)
        active = active & (~stop_here)
        threshold = jnp.where(active & imax, di - t_offset, threshold)
        threshold_index = jnp.where(active & imax, i, threshold_index)
        threshold = jnp.where(active & imin, 0.0, threshold)
        trigger = active & (dnext < threshold)
        knee_idx = jnp.where(trigger, threshold_index, knee_idx)
        found = found | trigger
        return (found, knee_idx, threshold, threshold_index, stopped), None

    idx = jnp.arange(n, dtype=jnp.int32)
    init = (
        jnp.asarray(False),
        jnp.asarray(fallback, dtype=jnp.int32),
        jnp.asarray(0.0, dtype=d.dtype),
        jnp.asarray(fallback, dtype=jnp.int32),
        jnp.asarray(False),
    )
    (found, knee_idx, *_), _ = jax.lax.scan(
        step, init, (idx, d, d_next, is_max, is_min, x_n)
    )
    return jnp.where(found, knee_idx, fallback).astype(jnp.int32)
