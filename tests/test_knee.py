import numpy as np
import jax.numpy as jnp
import pytest

from oisat_tpu.ops.knee import kneedle_index, kneedle_index_np


def curves():
    x = np.arange(0.1, 10.0, 0.1)
    out = []
    # Kalman-gain-like concave increasing curves (the real OI shape)
    for a in [0.05, 0.3, 1.0, 5.0, 20.0]:
        out.append((x, x / (x + a)))
    # noisy concave curve
    rng = np.random.default_rng(0)
    out.append((x, x / (x + 1.0) + 0.01 * rng.standard_normal(x.size)))
    # straight line (no knee: difference curve ~ 0)
    out.append((x, 2.0 * x + 1.0))
    # convex increasing (wrong curvature for 'concave' detection)
    out.append((x, x**2))
    # plateaus
    out.append((x, np.minimum(x, 3.0)))
    return out


@pytest.mark.parametrize("i", range(len(curves())))
def test_jax_matches_numpy(i):
    x, y = curves()[i]
    np_idx = kneedle_index_np(x, y)
    jx_idx = int(kneedle_index(jnp.asarray(x), jnp.asarray(y)))
    assert np_idx == jx_idx


def test_knee_location_sane():
    # for y = x/(x+a) the knee must sit in the bend region: curvature max at
    # small x for small a
    x = np.arange(0.1, 10.0, 0.1)
    idx_small = kneedle_index_np(x, x / (x + 0.3))
    idx_large = kneedle_index_np(x, x / (x + 5.0))
    assert 0 < idx_small < idx_large < x.size - 1


def test_fallback_on_nan_curve():
    x = np.arange(0.1, 10.0, 0.1)
    y = np.full_like(x, np.nan)
    assert kneedle_index_np(x, y) == 0
    assert int(kneedle_index(jnp.asarray(x), jnp.asarray(y))) == 0


def test_fallback_constant_curve():
    x = np.arange(0.1, 10.0, 0.1)
    y = np.ones_like(x)
    with np.errstate(invalid="ignore"):
        np_idx = kneedle_index_np(x, y)
    assert np_idx == 0
    assert int(kneedle_index(jnp.asarray(x), jnp.asarray(y))) == 0


def test_fuzz_jax_matches_numpy():
    """50 random monotone-ish curves: the lax.scan state machine must track
    the NumPy implementation exactly (knee index or shared fallback)."""
    rng = np.random.default_rng(42)
    x = np.arange(0.1, 10.0, 0.1)
    for i in range(50):
        kind = i % 5
        if kind == 0:  # concave increasing, random curvature
            a = rng.uniform(0.01, 30.0)
            y = x / (x + a)
        elif kind == 1:  # noisy concave
            y = x / (x + rng.uniform(0.1, 5.0)) + rng.normal(0, 0.02, x.size)
        elif kind == 2:  # piecewise with plateaus
            y = np.minimum(x * rng.uniform(0.5, 2.0), rng.uniform(1, 8))
        elif kind == 3:  # random walk, sorted (monotone, irregular)
            y = np.sort(np.cumsum(rng.normal(0.1, 1.0, x.size)))
        else:  # oscillating difference curve
            y = x / (x + 1.0) + 0.05 * np.sin(x * rng.uniform(1, 6))
        np_idx = kneedle_index_np(x, y)
        jx_idx = int(kneedle_index(jnp.asarray(x), jnp.asarray(y)))
        assert np_idx == jx_idx, (i, kind, np_idx, jx_idx)
