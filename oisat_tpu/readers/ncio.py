"""netCDF/HDF5 access helpers built on h5py (netCDF4-python is unavailable).

netCDF4 files are HDF5 files, so h5py reads the same products the reference
reads with netCDF4.Dataset (reference oisatgmi/reader.py:20-93).  Semantics
mirrored: automatic scale_factor/add_offset application and fill-value
masking (netCDF4's auto-maskandscale); masked entries become NaN for float
output (the reference's downstream NaN convention).
"""

from __future__ import annotations

import os

import numpy as np

import h5py

__all__ = [
    "read_nc",
    "read_nc_raw",
    "read_group_nc",
    "get_nc_attrs",
    "remove_empty_files",
]


def read_nc_raw(filename, var):
    """Read one variable RAW — no scale_factor/add_offset/fill handling
    (the reference's ``_read_ssmi``, reader.py:28-34: plain h5py counts).
    SSMIS needs this: its flag values 250-254 and the manual x0.3 scaling
    are defined on the raw counts; auto-scaling first would corrupt both."""
    import h5py as _h5py

    with _h5py.File(filename, "r") as f:
        return np.squeeze(np.array(f[var]))


def _apply_maskandscale(ds, raw):
    out = np.asarray(raw)
    fill = None
    if "_FillValue" in ds.attrs:
        fill = np.asarray(ds.attrs["_FillValue"]).ravel()[0]
    scale = np.asarray(ds.attrs.get("scale_factor", 1.0)).ravel()[0]
    offset = np.asarray(ds.attrs.get("add_offset", 0.0)).ravel()[0]
    if np.issubdtype(out.dtype, np.floating) or scale != 1.0 or offset != 0.0:
        mask = None
        if fill is not None:
            mask = out == fill
        out = out.astype(np.float64) * scale + offset
        if mask is not None:
            out[mask] = np.nan
    return out


def read_nc(filename, var, group=None):
    """Read one variable (squeezed), group-aware (reference reader.py:20-26, :70-86).

    ``group`` may be None, a string path, or a list of nested group names.
    """
    with h5py.File(filename, "r") as f:
        node = f
        if group:
            if isinstance(group, str):
                group = group.split("/")
            for g in group:
                node = node[g]
        ds = node[var]
        out = _apply_maskandscale(ds, ds[...])
    return np.squeeze(out)


def read_group_nc(filename, group, var):
    """Reference ``_read_group_nc`` signature (reader.py:70-86)."""
    return read_nc(filename, var, group=group)


def get_nc_attrs(filename, var=None, group=None):
    """Attribute dict of a variable or group (reference reader.py:36-67)."""
    with h5py.File(filename, "r") as f:
        node = f
        if group:
            if isinstance(group, str):
                group = group.split("/")
            for g in group:
                node = node[g]
        if var is not None:
            node = node[var]
        out = {}
        for k, v in node.attrs.items():
            if isinstance(v, bytes):
                v = v.decode("utf-8", "replace")
            out[k] = v
    return out


def remove_empty_files(filelist: list, min_bytes: int = 100) -> list:
    """Drop tiny/corrupt files (reference reader.py:88-93, but without the
    mutate-while-iterating bug that skips the element after each removal)."""
    return [f for f in filelist if os.path.getsize(f) >= min_bytes]
