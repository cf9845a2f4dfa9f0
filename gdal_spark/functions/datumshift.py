"""Horizontal datum-shift grid application (NTv2 / NADCON).

The 3/7-parameter geocentric Helmert path lives in functions/crs.py
(ProjCRS ``+towgs84``); this module supplies the grid half: bilinear
interpolation of lat/lon shift grids — the PROJ ``hgridshift`` step
the reference reaches through OGRCoordinateTransformation
(ogr/ogrct.cpp:1788, proj_create_crs_to_crs picks the NADCON/NTv2
grid operation when one covers the area).  Grids parse via
raster/shiftgrids.py (ntv2_decode / loslas_decode) and register here
by name; ``ProjCRS("+proj=... +nadgrids=<name>")`` applies them in its
to_wgs84/from_wgs84 pipeline (nadgrids takes precedence over towgs84,
matching PROJ operation ranking).

Sign conventions (NTv2, frmts/raw/ntv2dataset.cpp): shift values are
arc-seconds with longitude positive WEST.  Forward (source datum ->
target, e.g. NAD27 -> NAD83/WGS84):

    lat' = lat + dlat/3600        lon' = lon - dlon/3600

The inverse direction iterates the forward lookup (PROJ applies 4
fixed-point iterations; the field varies slowly so this converges to
well under the grid accuracy).  Points outside the grid pass through
unshifted, like GDAL's pass-through-with-warning behavior.
"""

from __future__ import annotations

import numpy as np

__all__ = ["register_grid", "get_grid", "grid_shift", "interp_shift"]

_REGISTRY: dict[str, tuple[np.ndarray, tuple]] = {}


def register_grid(name: str, arr: np.ndarray, gt) -> None:
    """arr: (h, w, >=2) float bands [lat_shift, lon_shift, ...] in
    arc-seconds; gt: 6-tuple in degrees (node centers at pixel
    centers, north-up), exactly what ntv2_decode returns."""
    a = np.asarray(arr, np.float64)
    if a.ndim != 3 or a.shape[2] < 2 or a.shape[0] < 2 or a.shape[1] < 2:
        raise ValueError("shift grid must be (h>=2, w>=2, >=2 bands)")
    _REGISTRY[name] = (a, tuple(float(g) for g in gt))


def get_grid(name: str) -> tuple[np.ndarray, tuple]:
    return _REGISTRY[name]


def interp_shift(name: str, lon, lat):
    """Bilinear (dlat, dlon, inside) at geodetic positions.  Outside
    points report inside=False and must not be shifted."""
    arr, gt = _REGISTRY[name]
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    h, w = arr.shape[:2]
    px = (lon - gt[0]) / gt[1] - 0.5
    py = (lat - gt[3]) / gt[5] - 0.5
    inside = (px >= 0.0) & (px <= w - 1.0) & (py >= 0.0) & (py <= h - 1.0)
    pxc = np.clip(px, 0.0, w - 1.0)
    pyc = np.clip(py, 0.0, h - 1.0)
    x0 = np.minimum(np.floor(pxc).astype(np.int64), w - 2)
    y0 = np.minimum(np.floor(pyc).astype(np.int64), h - 2)
    fx = (pxc - x0)[..., None]
    fy = (pyc - y0)[..., None]
    v = (arr[y0, x0] * (1 - fx) * (1 - fy)
         + arr[y0, x0 + 1] * fx * (1 - fy)
         + arr[y0 + 1, x0] * (1 - fx) * fy
         + arr[y0 + 1, x0 + 1] * fx * fy)
    return v[..., 0], v[..., 1], inside


def grid_shift(lon, lat, name: str, inverse: bool = False):
    """Apply (or invert) the named grid shift; returns (lon', lat')."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    if not inverse:
        dlat, dlon, ok = interp_shift(name, lon, lat)
        return (np.where(ok, lon - dlon / 3600.0, lon),
                np.where(ok, lat + dlat / 3600.0, lat))
    # fixed-point: find source coords whose forward shift lands on the
    # target (PROJ hgridshift inverse)
    lon_s = lon.copy()
    lat_s = lat.copy()
    for _ in range(4):
        dlat, dlon, ok = interp_shift(name, lon_s, lat_s)
        lon_s = np.where(ok, lon + dlon / 3600.0, lon)
        lat_s = np.where(ok, lat - dlat / 3600.0, lat)
    return lon_s, lat_s
