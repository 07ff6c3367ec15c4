"""Device-side (JAX) numeric operators.

Every function in this package is pure, jittable, dtype-polymorphic and
NaN-propagating: missing data is encoded as NaN exactly like the NumPy
reference pipeline, and reductions are the nan-aware variants, so sharded /
jitted execution yields the same fields the reference produces.
"""
