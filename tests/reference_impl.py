"""Independent NumPy golden implementations of the reference pipeline math.

Written from the algorithm definitions (formulas in SURVEY.md / the paper
trail), using plain float64 NumPy.  These are the truth the TPU ops are
compared against at tight tolerances; they intentionally mirror the
*semantics* (NaN handling, clamps, division-by-zero patterns) of
OI-SAT-GMI, not its code.
"""

from __future__ import annotations

import warnings

import numpy as np

from oisat_tpu.ops.knee import kneedle_index_np


def oi_numpy(xa, y, sa, so, regularization_on=True):
    """Scalar-gain OI update (reference optimal_interpolation.py:6-52)."""
    xa = np.asarray(xa, np.float64)
    y = np.array(y, np.float64, copy=True)
    sa = np.asarray(sa, np.float64)
    so = np.asarray(so, np.float64)
    y[y < 0] = 0.0
    regs = np.arange(0.1, 10.0, 0.1) if regularization_on else np.array([1.0])
    curve = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for r in regs:
            k = sa * r / (sa * r + so)
            sb = (1.0 - k) * sa * r
            ak = 1.0 - sb / (sa * r)
            curve.append(np.nanmean(ak.ravel()))
    curve = np.array(curve)
    idx = kneedle_index_np(regs, curve, fallback=0) if regularization_on else 0
    r = regs[idx]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        k = sa * r / (sa * r + so)
        sb = (1.0 - k) * sa * r
        ak = 1.0 - sb / (sa * r)
    inc = k * (y - xa)
    return xa + inc, ak, inc, np.sqrt(sb), idx, curve


def error_average_numpy(err2_stack):
    """sqrt( nansum(err^2) / N^2 ) per cell (reference averaging.py:11-24)."""
    e = np.array(err2_stack, np.float64, copy=True)
    e[np.isinf(e)] = np.nan
    valid = ~np.isnan(e)
    n = valid.sum(axis=0)
    s = np.where(valid, e, 0.0).sum(axis=0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        out = np.where(n > 0, s / n.astype(np.float64) ** 2, np.nan)
    return np.sqrt(out)
