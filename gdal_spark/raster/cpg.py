"""CPG — Convair PolGASP polarimetric SAR data.

Re-expresses frmts/raw/cpgdataset.cpp's enabled read paths:

* type 1 ("sso" / "polgasp" filesets): four big-endian CFloat32 rasters
  hh/hv/vv/vh found by substituting the polarization token in the
  filename (AdjustFilename, cpgdataset.cpp:229);
* type 2 (``*SIRC.img``/``.hdr``): a single 10-byte-per-pixel SIR-C
  compressed cross-product file decoded per scanline with
  scale = sqrt((byte2/254 + 1.5) * 2^byte1) / 127 and the four complex
  channels at byte pairs (3,4) (5,6) (7,8) (9,10)
  (SIRC_QSLCRasterBand::IReadBlock, cpgdataset.cpp:1257 — note the
  reference labels bands hh/hv/vv/vh while decoding SHH/SHV/SVH/SVV;
  the quirk is preserved);
* header parsing: number_lines/number_samples with the keyword sanity
  gates, UTM georeferencing when all 7 ``reference ...`` +
  sample-size keys are present, and the 16-point slant-range ->
  ground-range pseudo-geocoding GCP grid when the 5 geo params
  (altitude near_srd sample_size sample_size_az transposed) are found
  (cpgdataset.cpp:700).

The type-3 Stokes-matrix path is ``#ifdef notdef`` (disabled) in the
reference and is not ported.
"""

from __future__ import annotations

import math
import os
import re

import numpy as np

__all__ = ["cpg_open", "CPGDataset"]

_POLS = ("hh", "hv", "vv", "vh")


def _adjust(path: str, pol: str, ext: str) -> str | None:
    """AdjustFilename: swap the polarization token and extension."""
    base = path
    if len(pol) == 2:
        m = re.search(r"hh|hv|vv|vh", base)
        if not m:
            return None
        base = base[:m.start()] + pol + base[m.end():]
    root, _ = os.path.splitext(base)
    out = root + "." + ext
    return out if os.path.exists(out) else None


class CPGDataset:
    def __init__(self, path: str):
        name = os.path.basename(path)
        lower = name.lower()
        self.is_sirc = lower.endswith(("sirc.hdr", "sirc.img"))
        if self.is_sirc:
            hdr = _adjust(path, "", "hdr")
            if hdr is None or _adjust(path, "", "img") is None:
                raise ValueError("incomplete SIRC fileset")
        else:
            if "sso" not in lower and "polgasp" not in lower:
                raise ValueError("not a CPG fileset")
            hdr = _adjust(path, "hh", "hdr")
            if hdr is None:
                raise ValueError("no hh header")
            for pol in _POLS:
                if _adjust(path, pol, "img") is None or \
                        _adjust(path, pol, "hdr") is None:
                    raise ValueError(f"missing {pol} file")
        self.path = path
        self._parse_header(hdr)
        if self.is_sirc:
            self.img_files = [_adjust(path, "", "img")]
        else:
            self.img_files = [_adjust(path, pol, "img") for pol in _POLS]
        self.band_count = 4
        self.dtype = np.complex64
        self.metadata = {"MATRIX_REPRESENTATION": "SCATTERING"}
        self.band_metadata = [
            {"POLARIMETRIC_INTERP": pol} for pol in _POLS
        ]

    def _parse_header(self, hdr_path: str):
        lines = open(hdr_path, encoding="latin-1",
                     errors="replace").read().splitlines()
        nlines = nsamples = 0
        geo = {}
        utm = {}
        for line in lines:
            tok = line.split()
            if len(tok) < 2:
                continue
            key = tok[0].lower()
            if key == "reference" and len(tok) >= 3:
                sub = tok[1].lower()
                if sub == "north":
                    utm["north"] = float(tok[2])
                elif sub == "east":
                    utm["east"] = float(tok[2])
                elif sub == "projection" and len(tok) >= 5 and \
                        tok[2].upper() == "UTM" and tok[3].lower() == "zone":
                    utm["zone"] = int(tok[4])
                elif sub == "corner" and \
                        tok[2].lower().startswith("upper_left"):
                    utm["corner"] = True
            elif key == "number_lines":
                nlines = int(tok[1])
            elif key == "number_samples":
                nsamples = int(tok[1])
            elif key == "header_offset" and int(tok[1]) != 0:
                raise ValueError("unsupported header_offset")
            elif key == "number_channels" and int(tok[1]) not in (1, 10):
                raise ValueError("unsupported number_channels")
            elif key == "datatype" and int(tok[1]) != 1:
                raise ValueError("unsupported datatype")
            elif key == "number_format" and \
                    tok[1].lower() not in ("float32", "int8"):
                raise ValueError("unsupported number_format")
            elif key in ("altitude", "near_srd", "sample_size",
                         "sample_size_az"):
                geo[key] = float(tok[1])
                if key in ("sample_size", "sample_size_az"):
                    utm[key] = float(tok[1])
            elif key == "transposed":
                geo[key] = int(tok[1])
                utm[key] = int(tok[1])
        if nlines <= 0 or nsamples <= 0:
            raise ValueError("no valid number_lines/number_samples")
        self.width, self.height = nsamples, nlines

        self.geotransform = None
        self.utm_zone = None
        self.gcps = []
        if len(utm) == 7:
            north, east = utm["north"], utm["east"]
            ssz, ssz_az = utm["sample_size"], utm["sample_size_az"]
            if utm["transposed"] == 1:
                center = north - nsamples * ssz / 2.0
                self.geotransform = (east, 0.0, ssz_az, north, -ssz, 0.0)
            else:
                center = north - nlines * ssz / 2.0
                self.geotransform = (east, ssz_az, 0.0, north, 0.0, -ssz)
            self.utm_zone = (utm["zone"], "N" if center >= 0 else "S")
        elif len(geo) == 5:
            alt, srd = geo["altitude"], geo["near_srd"]
            ssz, ssz_az = geo["sample_size"], geo["sample_size_az"]
            for n in range(16):
                if geo["transposed"] == 1:
                    px = (0.0 if n < 4 else nsamples / 3.0 if n < 8
                          else 2.0 * nsamples / 3.0 if n < 12
                          else float(nsamples))
                    ln = nlines * (n % 4) / 3.0
                    t = srd + ssz * ln
                    gy = -math.sqrt(max(t * t - alt * alt, 0.0))
                    gx = px * ssz_az
                else:
                    ln = (0.0 if n < 4 else nlines / 3.0 if n < 8
                          else 2.0 * nlines / 3.0 if n < 12
                          else float(nlines))
                    px = nsamples * ((n % 4) / 3.0)
                    t = srd + ssz * px
                    gx = math.sqrt(max(t * t - alt * alt, 0.0))
                    gy = (nlines - ln) * ssz_az
                self.gcps.append(
                    {"id": str(n + 1), "pixel": px, "line": ln,
                     "x": gx, "y": gy, "z": 0.0})

    # -- pixel access ---------------------------------------------------
    def read_band(self, band: int) -> np.ndarray:
        """1-based band -> (H, W) complex64."""
        if self.is_sirc:
            return self._read_sirc(band)
        raw = np.fromfile(self.img_files[band - 1], dtype=">f4")
        raw = raw[: self.height * self.width * 2].reshape(
            self.height, self.width, 2)
        return (raw[..., 0] + 1j * raw[..., 1]).astype(np.complex64)

    def _read_sirc(self, band: int) -> np.ndarray:
        data = np.fromfile(self.img_files[0], dtype=np.int8)
        n = self.height * self.width
        px = data[: n * 10].reshape(n, 10).astype(np.float64)
        # scale = sqrt((b2/254 + 1.5) * 2^b1) / 127  (bytes 1-based)
        scale = np.sqrt((px[:, 1] / 254.0 + 1.5)
                        * np.exp2(px[:, 0])) / 127.0
        re_i = 2 * band       # 1-based pabyIn[3],[5],[7],[9] -> 0-based
        im_i = 2 * band + 1
        out = (px[:, re_i] * scale + 1j * px[:, im_i] * scale)
        return out.reshape(self.height, self.width).astype(np.complex64)


def cpg_open(path: str) -> CPGDataset:
    return CPGDataset(path)
