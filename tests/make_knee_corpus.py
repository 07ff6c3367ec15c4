"""Generate the frozen knee corpus: ``tests/golden/knee_corpus.json``.

Run: ``python tests/make_knee_corpus.py``  (from the repo root)

Each entry is a (curve, expected reference knee index) pair.  Expected
indices come from :mod:`tests.kneed_spec` — the standalone transcription of
kneed's published algorithm — and, for the strictly-concave analytic
families, are *additionally* verified here against the closed-form Kneedle
prediction (the knee of a strictly concave curve whose difference curve
``d = y_n - x_n`` has a unique maximum and decreases monotonically after it
is exactly ``argmax(d)``, provided the total drop exceeds the sensitivity
offset ``S * mean(diff(x_n))`` before the curve ends — Satopaa et al. 2011,
§III.A).  Any disagreement between the transcription and the analytic rule
aborts generation, so the corpus cannot silently encode a transcription
bug for the shapes the OI actually produces.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tests.kneed_spec import knee_index_reference  # noqa: E402

REG_GRID = np.arange(0.1, 10.0, 0.1)  # the OI scan grid (99 points)


def _analytic_concave_knee(x, y):
    """argmax of the difference curve, with the preconditions asserted."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    x_n = (x - x.min()) / (x.max() - x.min())
    y_n = (y - y.min()) / (y.max() - y.min())
    d = y_n - x_n
    k = int(np.argmax(d))
    assert 0 < k < x.size - 1, "interior maximum required"
    assert np.all(np.diff(d[k:]) < 0), "d must strictly decrease after max"
    assert np.all(np.diff(d[: k + 1]) > 0), "d must strictly increase before max"
    offset = np.abs(np.diff(x_n).mean())  # S = 1
    assert d[k] - d[-1] > offset, "drop must exceed the sensitivity offset"
    return k


def build_corpus():
    entries = []

    def add(name, x, y, expected=None, analytic=False, note=""):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        got = knee_index_reference(x, y)
        if analytic:
            want = _analytic_concave_knee(x, y)
            assert got == want, f"{name}: spec walk {got} != analytic {want}"
        if expected is not None:
            assert got == expected, f"{name}: spec walk {got} != derived {expected}"
        entries.append({
            "name": name,
            "x": x.tolist(),
            "y": [None if not np.isfinite(v) else v for v in y.tolist()],
            "expected_index": got,
            "derivation": note,
        })

    x = REG_GRID
    x_n = (x - x.min()) / (x.max() - x.min())

    # ---- OI-shaped saturation curves (K = r/(r+a)): the real workload ----
    for a in [0.05, 0.1, 0.3, 0.5, 1.0, 2.0, 5.0, 10.0, 20.0, 50.0]:
        add(f"saturation_a{a}", x, x / (x + a), analytic=a <= 20.0,
            note="mean-AK-vs-r shape; analytic knee = argmax(y_n - x_n) "
                 "for strictly concave curves" if a <= 20.0 else
                 "shallow curve; spec-walk only (analytic preconditions "
                 "not met: drop below offset region)")

    # ---- other strictly concave families, analytic argmax rule ----------
    for p in [0.2, 0.3, 0.5, 0.7]:
        add(f"power_p{p}", x, x_n**p, analytic=True,
            note="y = x_n^p; unique difference-curve max at "
                 "x_n = p^(1/(1-p))")
    for k in [1.0, 5.0, 20.0]:
        add(f"log_k{k}", x, np.log1p(k * x_n), analytic=True,
            note="y = log(1 + k x_n)")
    for k in [3.0, 10.0]:
        add(f"exp_sat_k{k}", x, 1.0 - np.exp(-k * x_n), analytic=True,
            note="y = 1 - exp(-k x_n)")

    # ---- hand-derived piecewise-linear cases -----------------------------
    # ramp to 1 at index b then flat: d rises linearly to index b, falls
    # linearly after; unique max at b; first drop below T = d[b]-offset
    # happens while still past b -> knee = b (derivation in VERDICT r1 #4).
    for n, b in [(11, 3), (11, 5), (21, 6), (99, 24)]:
        xx = np.linspace(0.0, 1.0, n)
        yy = np.minimum(xx / xx[b], 1.0)
        add(f"ramp_flat_n{n}_b{b}", xx, yy, expected=b,
            note=f"piecewise-linear ramp ending at index {b}: difference "
                 "curve has its unique maximum there and decreases "
                 "strictly after; drop (1 - x_n[b]) > offset (1/(n-1))")

    # plateau at the top of y (ties in y, not in d): y = [0, .5, 1, 1, ...]
    xx = np.linspace(0.0, 1.0, 11)
    yy = np.array([0.0, 0.5, 1, 1, 1, 1, 1, 1, 1, 1, 1.0])
    # d = y - x_n = [0,.4,.8,.7,...,0]; unique max at 2; T=.8-.1; d[3]=.7<.7
    # false (strict), d[4]=.6<.7 at i=3 -> knee stays at the max index 2
    add("plateau_top", xx, yy, expected=2,
        note="d=[0,.4,.8,.7,...]; max at 2, T=0.7, trigger at i=3 "
             "(d[4]=0.6<0.7), knee = last max = 2")

    # minimum-reset double hump: d = [0,.5,.45,.55,.2,...,0]
    # i=1 max (T=.4), d[2]=.45 not < .4; i=2 min -> threshold=0;
    # i=3 max (T=.45), d[4]=.2<.45 -> knee=3
    xx = np.linspace(0.0, 1.0, 11)
    d = np.array([0.0, 0.5, 0.45, 0.55, 0.2, 0.15, 0.12, 0.09, 0.06, 0.03, 0.0])
    yy = d + xx  # y_n == y (already 0..1 with min/max at the ends)
    assert yy.min() == yy[0] == 0.0 and yy.max() == yy[-1] == 1.0
    add("min_reset_double_hump", xx, yy, expected=3,
        note="first hump survives its threshold, local min resets to 0, "
             "second hump (i=3) triggers at d[4]")

    # hump that never triggers before the end -> fallback 0
    d = np.array([0.0, 0.05, 0.08, 0.09, 0.085, 0.08, 0.075, 0.07, 0.065,
                  0.06, 0.0])
    yy = d + xx
    yy = (yy - yy.min()) / (yy.max() - yy.min())
    add("no_trigger_shallow", xx, yy,
        note="drop after the max never exceeds the S offset before "
             "x_n reaches 1; kneed returns None -> reference index 0")

    # ---- degenerate / edge cases -----------------------------------------
    add("two_point", np.array([0.1, 0.2]), np.array([0.0, 1.0]), expected=0,
        note="d=[0,0]; endpoint max at 0 (clipped >=), immediate min resets "
             "threshold to 0, d[1]=0 not < 0, x_n==1 stops -> None -> 0")
    add("three_point_linear", np.array([1.0, 2.0, 3.0]),
        np.array([1.0, 2.0, 3.0]), expected=0,
        note="d identically 0: thresholds 0, never triggered -> None -> 0")
    add("all_equal", x, np.ones_like(x), expected=0,
        note="y_n = 0/0 = NaN; argrelextrema finds no maxima -> None -> 0")
    add("linear", x, 2.0 * x + 1.0, expected=0,
        note="d identically 0 -> no strict drop -> None -> 0")
    add("all_nan", x, np.full_like(x, np.nan), expected=0,
        note="NaN curve (empty analysis domain): no maxima -> None -> 0")
    add("convex", x, x_n**2,
        note="wrong curvature for curve='concave': d <= 0 with endpoint "
             "maxima only; spec walk decides")
    add("decreasing", x, 1.0 / (x + 0.5),
        note="direction mismatch (curve decreasing, direction="
             "'increasing' as the reference hard-codes): spec walk decides")

    # ---- noisy concave (frozen seeds; expected = spec walk) --------------
    rng = np.random.default_rng(2024)
    for s in range(5):
        y = x / (x + 0.5 + s * 0.5) + 0.01 * rng.standard_normal(x.size)
        add(f"noisy_concave_s{s}", x, y,
            note="saturation + 1% noise, frozen seed; expected from the "
                 "kneed spec transcription (noise creates extra extrema "
                 "the state machine must walk through)")

    # difference-curve plateau (exact ties in d): every plateau point is
    # both a >= max and a <= min under argrelextrema's clipped comparisons
    xx = np.linspace(0.0, 1.0, 13)
    d = np.array([0.0, 0.3, 0.3, 0.3, 0.25, 0.2, 0.15, 0.12, 0.09, 0.06,
                  0.04, 0.02, 0.0])
    yy = d + xx
    add("difference_plateau_ties", xx, yy,
        note="d has an exact 3-point plateau at its max: indices 1-3 are "
             "all maxima AND 1-2 are minima (>= and <= ties); the min "
             "reset zeroes the threshold inside the plateau; spec walk "
             "decides the outcome")

    return entries


def main():
    out = os.path.join(os.path.dirname(__file__), "golden", "knee_corpus.json")
    entries = build_corpus()
    with open(out, "w") as f:
        json.dump({"S": 1.0, "curve": "concave", "direction": "increasing",
                   "online": False, "n": len(entries), "entries": entries},
                  f, indent=1)
    print(f"wrote {len(entries)} corpus entries -> {out}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
