"""OI-SAT-TPU: a TPU-native optimal-interpolation data-assimilation framework.

Re-implementation (from scratch, TPU-first) of the capabilities of the
OI-SAT-GMI reference pipeline: optimal interpolation between satellite
trace-gas retrievals (OMI, TROPOMI, TEMPO, OMPS, MOPITT, GOSAT, SSMIS) and
chemical-transport-model fields (GMI / HiGMI / ECCOH / CMAQ / FREE).

Design split:
  * host (CPU/Python): file discovery, netCDF/HDF decode, config, reporting,
    regrid *weight construction* (triangulation / KD queries).
  * device (TPU/JAX): every numeric kernel — regrid *apply* (gather +
    weighted sum), vertical observation operators (AMF recal, AK convolution,
    PWV), temporal averaging, and the OI analysis itself — as jitted,
    shardable functions; hot paths as Pallas kernels.

The reference exports a single symbol ``oisatgmi`` (reference
oisatgmi/__init__.py:1); we keep that API, plus the full ops library.
"""

__version__ = "0.1.0"

__all__ = ["oisatgmi", "__version__"]


def __getattr__(name):
    # Lazy import: keep `import oisat_tpu` cheap (no jax/h5py import cost)
    if name == "oisatgmi":
        from oisat_tpu.driver import oisatgmi

        return oisatgmi
    raise AttributeError(f"module 'oisat_tpu' has no attribute {name!r}")
