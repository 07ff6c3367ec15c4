"""Typed data containers (pytrees) for satellite granules and CTM fields.

Mirrors the reference's dataclasses (reference oisatgmi/config.py:7-73) with
the same *field names* so the driver/tools surface is drop-in compatible,
but as JAX-registered pytrees whose array leaves live on device and whose
metadata (timestamps, sensor names, flags) is static aux data.

Conventions
-----------
* Missing data is NaN (the reference's convention throughout).
* Vertical axes are level-major: profile fields are ``(L, H, W)``.
* ``time`` is a ``datetime.datetime`` (host metadata, not traced).
* Granule stacks for temporal averaging are built by stacking leaves on a
  new leading axis (``stack_granules``).
"""

from __future__ import annotations

import dataclasses
import datetime
from typing import Any, List, Optional

import jax
import numpy as np

Array = Any  # np.ndarray | jax.Array | [] placeholder (reference uses [])


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


@dataclasses.dataclass
class satellite_amf:
    """Two-step-retrieval granule (NO2/HCHO/O3 sensors); reference config.py:7-24."""

    vcd: Array = None
    amf: Array = None
    time: Optional[datetime.datetime] = None
    tropopause: Array = None
    latitude_center: Array = None
    longitude_center: Array = None
    latitude_corner: Array = None
    longitude_corner: Array = None
    uncertainty: Array = None
    quality_flag: Array = None
    pressure_mid: Array = None
    scattering_weights: Array = None
    ctm_upscaled_needed: bool = False
    ctm_vcd: Array = None
    ctm_time_at_sat: Any = None
    old_amf: Array = None
    new_amf: Array = None


_register(
    satellite_amf,
    data_fields=[
        "vcd", "amf", "tropopause", "latitude_center", "longitude_center",
        "latitude_corner", "longitude_corner", "uncertainty", "quality_flag",
        "pressure_mid", "scattering_weights", "ctm_vcd", "old_amf", "new_amf",
    ],
    meta_fields=["time", "ctm_upscaled_needed", "ctm_time_at_sat"],
)


@dataclasses.dataclass
class satellite_opt:
    """Optimal-estimation granule (MOPITT CO / GOSAT XCH4); reference config.py:27-50."""

    vcd: Array = None
    time: Optional[datetime.datetime] = None
    profile: Array = None
    tropopause: Array = None
    latitude_center: Array = None
    longitude_center: Array = None
    latitude_corner: Array = None
    longitude_corner: Array = None
    uncertainty: Array = None
    quality_flag: Array = None
    pressure_mid: Array = None
    averaging_kernels: Array = None
    ctm_upscaled_needed: bool = False
    ctm_vcd: Array = None
    ctm_xcol: Array = None
    ctm_time_at_sat: Any = None
    aprior_column: Array = None
    apriori_profile: Array = None
    surface_pressure: Array = None
    apriori_surface: Array = None
    x_col: Array = None
    pressure_weight: Array = None
    sensor: str = ""


_register(
    satellite_opt,
    data_fields=[
        "vcd", "profile", "tropopause", "latitude_center", "longitude_center",
        "latitude_corner", "longitude_corner", "uncertainty", "quality_flag",
        "pressure_mid", "averaging_kernels", "ctm_vcd", "ctm_xcol",
        "aprior_column", "apriori_profile", "surface_pressure",
        "apriori_surface", "x_col", "pressure_weight",
    ],
    meta_fields=["time", "ctm_upscaled_needed", "ctm_time_at_sat", "sensor"],
)


@dataclasses.dataclass
class satellite_ssmis:
    """SSMIS water-vapor granule; reference config.py:53-61."""

    vcd: Array = None
    uncertainty: Array = None
    time: Optional[datetime.datetime] = None
    latitude_center: Array = None
    longitude_center: Array = None
    ctm_upscaled_needed: bool = False
    ctm_vcd: Array = None
    sensor: str = "SSMIS"


_register(
    satellite_ssmis,
    data_fields=["vcd", "uncertainty", "latitude_center", "longitude_center", "ctm_vcd"],
    meta_fields=["time", "ctm_upscaled_needed", "sensor"],
)


@dataclasses.dataclass
class ctm_model:
    """CTM field container; reference config.py:64-73.

    ``gas_profile``/``pressure_mid``/``delta_p`` are ``(T, L, H, W)`` for
    sub-monthly models and ``(L, H, W)`` once averaged.
    """

    latitude: Array = None
    longitude: Array = None
    time: List[datetime.datetime] = dataclasses.field(default_factory=list)
    gas_profile: Array = None
    pressure_mid: Array = None
    tempeature_mid: Array = None  # (sic) — reference field name, kept for parity
    delta_p: Array = None
    ctmtype: str = ""
    averaged: bool = False


_register(
    ctm_model,
    data_fields=["latitude", "longitude", "gas_profile", "pressure_mid", "tempeature_mid", "delta_p"],
    meta_fields=["time", "ctmtype", "averaged"],
)


def stack_granules(granules, field_names):
    """Stack ``field`` across granules (skipping None) -> dict of (G, ...) arrays."""
    out = {}
    for name in field_names:
        out[name] = np.stack([np.asarray(getattr(g, name)) for g in granules if g is not None])
    return out
