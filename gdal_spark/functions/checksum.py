"""numpy port of GDALChecksumImage — the engine's golden-output oracle.

Semantics from alg/gdalchecksum.cpp:48-235 (re-derived, not copied):
row-major over the band, each value contributes
``int_round(v) % primes[i % 11]`` with primes [7,11,13,17,19,23,29,31,37,
41,43], the running sum masked to 16 bits. `i` is the flat row-major value
index. C truncated `%` semantics (sign follows dividend). Float inputs
convert via v+0.5 then floor with INT32 clamping (GDALCopyWords behavior).

The canonical sanity value: GDAL's 20x20 byte.tif band checksums to 4672
(autotest/gcore/tiff_read.py:45) — our tests assert the same property on
our own fixtures via an independent scalar reimplementation.
"""

from __future__ import annotations

import numpy as np

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _to_int(band: np.ndarray) -> np.ndarray:
    if np.issubdtype(band.dtype, np.floating):
        v = band.astype(np.float64) + 0.5
        finite = np.isfinite(v)
        v = np.clip(np.where(finite, v, 0.0), -2147483647.0, 2147483647.0)
        iv = np.floor(v).astype(np.int64)
        # non-finite -> INT_MIN, alg/gdalchecksum.cpp IntFromDouble
        return np.where(finite, iv, np.int64(-2147483648))
    return band.astype(np.int64)


def checksum(band: np.ndarray) -> int:
    """16-bit checksum of a single 2-D band (or flat array). Complex bands
    interleave (real, imag) per value — alg/gdalchecksum.cpp
    nValsPerIter=2, each component advancing the prime index."""
    band = np.asarray(band)
    if np.issubdtype(band.dtype, np.complexfloating):
        flat = band.ravel()
        inter = np.empty(flat.size * 2, dtype=np.float64)
        inter[0::2] = flat.real
        inter[1::2] = flat.imag
        band = inter
    vals = _to_int(np.asarray(band)).ravel()
    idx = np.arange(vals.size, dtype=np.int64) % 11
    p = PRIMES[idx]
    # C-style truncated modulo: sign follows the dividend
    rem = np.abs(vals) % p
    rem = np.where(vals < 0, -rem, rem)
    return int(rem.sum() & 0xFFFF)


def checksum_image(arr: np.ndarray) -> list[int]:
    """Per-band checksums of an HxWxC array (C bands)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        return [checksum(a)]
    return [checksum(a[:, :, b]) for b in range(a.shape[2])]
