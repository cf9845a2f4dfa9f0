"""ENVISAT (ESA ERS/Envisat PDS) reader
(frmts/envisat/EnvisatFile.c + envisatdataset.cpp — re-derived, no
code copied).

An Envisat product is text headers + binary measurement records:

  MPH: fixed 1247 bytes of KEY=value lines ("PRODUCT=\"...\"",
  SPH_SIZE=+0000001234<bytes>, NUM_DSD, DSD_SIZE...). Values keep
  their quotes stripped and trailing <units> removed.
  SPH: SPH_SIZE - NUM_DSD*DSD_SIZE bytes of the same grammar,
  followed by NUM_DSD dataset descriptors of DSD_SIZE bytes each
  (DS_NAME/DS_TYPE/FILENAME/DS_OFFSET/DS_SIZE/NUM_DSR/DSR_SIZE).

Band model (envisatdataset.cpp:900-1130): the first type-'M'
(measurement) DSD fixes raster height = NUM_DSR and width =
SPH LINE_LENGTH; the SPH DATA_TYPE/SAMPLE_TYPE pair picks the dtype
(FLT32[+COMPLEX], UWORD, SWORD[+COMPLEX]); ATS_TOA_1 products have
no line length and use (dsr_size - 20) / 2 Int16 pixels; with no
DATA_TYPE the width decides UInt16 vs UInt8. Every 'M' DSD with the
same record count becomes a band; per-record prefix bytes =
dsr_size - pixel_bytes * width; samples are big-endian.
"""

from __future__ import annotations

import numpy as np

__all__ = ["EnvisatFile", "envisat_open"]

MPH_SIZE = 1247


def _parse_kv(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in text.split("\n"):
        if "=" not in line:
            continue
        key, value = line.split("=", 1)
        key = key.strip()
        if not key:
            continue
        value = value.strip()
        if value.startswith('"'):
            value = value.strip('"').rstrip()
        else:
            # strip trailing <units>
            if value.endswith(">") and "<" in value:
                value = value[:value.rindex("<")]
        out[key] = value.strip()
    return out


class EnvisatFile:
    def __init__(self, data: bytes):
        if not data.startswith(b"PRODUCT="):
            raise ValueError("not an Envisat product (PRODUCT= missing)")
        self.data = data
        self.mph = _parse_kv(data[:MPH_SIZE].decode("latin-1", "replace"))
        sph_size = int(self.mph.get("SPH_SIZE", "0"))
        if sph_size <= 0:
            raise ValueError("Envisat: SPH_SIZE not set, or zero")
        num_dsd = int(self.mph.get("NUM_DSD", "0"))
        dsd_size = int(self.mph.get("DSD_SIZE", "0"))
        sph_text_len = sph_size - num_dsd * dsd_size
        self.sph = _parse_kv(
            data[MPH_SIZE:MPH_SIZE + sph_text_len].decode(
                "latin-1", "replace"))
        self.dsds: list[dict] = []
        base = MPH_SIZE + sph_text_len
        for i in range(num_dsd):
            txt = data[base + i * dsd_size:base + (i + 1) * dsd_size]
            kv = _parse_kv(txt.decode("latin-1", "replace"))
            if not kv.get("DS_NAME"):
                continue
            self.dsds.append({
                "name": kv.get("DS_NAME", ""),
                "type": kv.get("DS_TYPE", ""),
                "filename": kv.get("FILENAME", ""),
                "offset": int(kv.get("DS_OFFSET", "0") or 0),
                "size": int(kv.get("DS_SIZE", "0") or 0),
                "num_dsr": int(kv.get("NUM_DSR", "0") or 0),
                "dsr_size": int(kv.get("DSR_SIZE", "0") or 0),
            })
        self._setup_bands()

    # -- metadata ----------------------------------------------------------
    def metadata(self) -> dict[str, str]:
        skip = {"TOT_SIZE", "SPH_SIZE", "NUM_DSD", "DSD_SIZE",
                "NUM_DATA_SETS"}
        md = {f"MPH_{k}": v for k, v in self.mph.items() if k not in skip}
        md.update({f"SPH_{k}": v for k, v in self.sph.items()
                   if k not in skip})
        return md

    # -- bands -------------------------------------------------------------
    def _setup_bands(self) -> None:
        meas = [d for d in self.dsds if d["type"] == "M"]
        if not meas:
            raise ValueError("Envisat: unable to find measurement dataset")
        ref = meas[0]
        num_dsr, dsr_size = ref["num_dsr"], ref["dsr_size"]
        product = self.mph.get("PRODUCT", "")
        data_type = self.sph.get("DATA_TYPE", "")
        sample_type = self.sph.get("SAMPLE_TYPE", "")
        width = int(self.sph.get("LINE_LENGTH", "0") or 0)

        complex_ = sample_type.upper().startswith("COMPLEX")
        if data_type == "FLT32":
            dt = ">c8" if complex_ else ">f4"
        elif data_type == "UWORD":
            dt = ">u2"
        elif data_type == "SWORD":
            dt = "two-i2" if complex_ else ">i2"
        elif product.startswith("ATS_TOA_1"):
            dt = ">i2"
            width = (dsr_size - 20) // 2
        elif width == 0:
            dt = "u1"
            width = dsr_size
        else:
            dt = ">u2" if dsr_size >= 2 * width else "u1"
        if dt == "two-i2":
            itemsize = 4
        else:
            itemsize = np.dtype(dt).itemsize
        prefix = dsr_size - itemsize * width
        if width < 1 or num_dsr < 1:
            raise ValueError("Envisat: unable to determine organization")

        self.width = width
        self.height = num_dsr
        self.dtype = dt
        self.prefix_bytes = prefix
        self.bands: list[dict] = []
        for d in self.dsds:
            if d["type"] != "M" or d["num_dsr"] != num_dsr:
                continue
            if d["dsr_size"] == dsr_size:
                self.bands.append({"name": d["name"], "dsd": d})

    def read_band(self, index: int) -> np.ndarray:
        """0-based band -> (H, W) array (complex64 for COMPLEX pairs)."""
        band = self.bands[index]
        d = band["dsd"]
        dt = self.dtype
        rows = []
        for y in range(self.height):
            off = d["offset"] + y * d["dsr_size"] + self.prefix_bytes
            if dt == "two-i2":
                iq = np.frombuffer(self.data, ">i2", 2 * self.width, off
                                   ).astype(np.float32)
                rows.append((iq[0::2] + 1j * iq[1::2]).astype(np.complex64))
            else:
                rows.append(np.frombuffer(self.data, dt, self.width, off))
        return np.vstack(rows)


def envisat_open(data: bytes) -> EnvisatFile:
    return EnvisatFile(data)
