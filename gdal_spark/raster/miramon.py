"""MiraMon raster (IMG + I.rel) driver.

Re-expresses frmts/miramon/: the I.rel INI metadata (REL4 /
VersMetaDades>=4 gates of miramon_common mm_gdal_functions.c
MMCheck_REL_FILE), the img->I.rel association walk of
miramon_rel.cpp (same-stem I.rel, else scan the folder's *I.rel for
one whose ATTRIBUTE_DATA band NomFitxer references the img), the
band list from [ATTRIBUTE_DATA] IndexsNomsCamps/NomCamp_N with the
section-then-dataset key lookup chain ([ATTRIBUTE_DATA:<band>] ->
[ATTRIBUTE_DATA], [ATTRIBUTE_DATA:<band>:EXTENT] -> [EXTENT],
[ATTRIBUTE_DATA:<band>] columns/rows -> [OVERVIEW:ASPECTES_TECNICS]),
the TipusCompressio data-type ladder (bit / byte / integer / uinteger
/ long / real / double, each with a -RLE variant), the MiraMon RLE
row codec of miramon_band.cpp UncompressRow (counter 0 = literal run)
with the "IMG x.y" trailing row-offset index sections of
PositionAtStartOfRowOffsetsInFile, LSB-first bit expansion, and the
band-compatibility subdataset grouping of miramon_dataset.cpp
BandInTheSameDataset.

Spark shape: each band file is independent bytes; the RLE row index
makes per-row windows seekable, so a scene fans out per (band,
row-chunk) without decoding predecessor rows.
"""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["miramon_open", "MiraMonDataset", "MiraMonBand"]

_DTYPES = {
    "bit": ("bit", np.dtype(np.uint8)),
    "byte": ("raw", np.dtype(np.uint8)),
    "integer": ("raw", np.dtype("<i2")),
    "uinteger": ("raw", np.dtype("<u2")),
    "long": ("raw", np.dtype("<i4")),
    "real": ("raw", np.dtype("<f4")),
    "double": ("raw", np.dtype("<f8")),
    "byte-RLE": ("rle", np.dtype(np.uint8)),
    "integer-RLE": ("rle", np.dtype("<i2")),
    "uinteger-RLE": ("rle", np.dtype("<u2")),
    "long-RLE": ("rle", np.dtype("<i4")),
    "real-RLE": ("rle", np.dtype("<f4")),
    "double-RLE": ("rle", np.dtype("<f8")),
}


class MMRel:
    """Case-insensitive INI view of an I.rel file (latin-1)."""

    def __init__(self, path: str):
        self.path = path
        self.sections: dict[str, dict[str, str]] = {}
        cur = None
        with open(path, "rb") as f:
            text = f.read().decode("latin-1", "replace")
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith(";"):
                continue
            if line.startswith("[") and line.endswith("]"):
                cur = self.sections.setdefault(line[1:-1].lower(), {})
            elif "=" in line and cur is not None:
                k, v = line.split("=", 1)
                cur[k.strip().lower()] = v.strip()

    def get(self, section: str, key: str) -> str | None:
        return self.sections.get(section.lower(), {}).get(key.lower())

    def check_rel4(self):
        """MMCheck_REL_FILE: [VERSIO] Vers>=4 and VersMetaDades>=4."""
        vers = self.get("VERSIO", "Vers")
        if vers is None or int(vers or 0) < 4:
            raise ValueError(f'The file "{self.path}" must be REL4.')
        vmd = self.get("VERSIO", "VersMetaDades")
        if vmd is None or int(vmd or 0) < 4:
            raise ValueError(f'The file "{self.path}" must have '
                             "VersMetaDades>=4")


def _rel_band_files(rel: MMRel) -> list[str]:
    names = rel.get("ATTRIBUTE_DATA", "IndexsNomsCamps")
    if not names:
        return []
    out = []
    stem = os.path.basename(rel.path)
    default = (stem[: -len("I.rel")] + ".img") if stem.endswith("I.rel") else ""
    for idx in names.split(","):
        band = rel.get("ATTRIBUTE_DATA", f"NomCamp_{idx.strip()}")
        if band:
            f = rel.get(f"ATTRIBUTE_DATA:{band}", "NomFitxer")
            out.append(f or default)
    return out


def _find_rel_for_img(img_path: str) -> str:
    """miramon_rel.cpp: FileName.img -> FileNameI.rel, else scan the
    folder's *I.rel files for one referencing this img."""
    stem, ext = os.path.splitext(img_path)
    if ext.lower() != ".img":
        raise ValueError(f"{img_path} not recognized as being in a "
                         "supported file format")
    cand = stem + "I.rel"
    base = os.path.basename(img_path)
    if os.path.exists(cand):
        rel = MMRel(cand)
        files = _rel_band_files(rel)
        if any(f == base for f in files) or not files:
            return cand
    folder = os.path.dirname(os.path.abspath(img_path))
    for name in sorted(os.listdir(folder)):
        if not name.endswith("I.rel"):
            continue
        p = os.path.join(folder, name)
        try:
            rel = MMRel(p)
        except OSError:
            continue
        if base in _rel_band_files(rel):
            return p
    raise ValueError(f"{img_path} not recognized as being in a "
                     "supported file format")


class MiraMonBand:
    def __init__(self, rel: MMRel, band_name: str):
        self.rel = rel
        self.name = band_name
        sec = f"ATTRIBUTE_DATA:{band_name}"
        self._sec = sec
        rel_dir = os.path.dirname(os.path.abspath(rel.path))
        fname = rel.get(sec, "NomFitxer")
        if not fname:
            # default: strip the trailing "I" of the rel stem + .img
            stem = os.path.basename(rel.path)
            if stem.endswith("I.rel"):
                fname = stem[: -len("I.rel")] + ".img"
            else:
                raise ValueError("Failed to open MiraMon band file ``")
        self.img_path = os.path.join(rel_dir, fname)
        self.raw_name = fname

        def chain(key):
            v = rel.get(sec, key)
            return v if v not in (None,) else None

        cols = chain("columns") or rel.get("OVERVIEW:ASPECTES_TECNICS",
                                           "columns")
        rows = chain("rows") or rel.get("OVERVIEW:ASPECTES_TECNICS", "rows")
        if not cols:
            raise ValueError(
                "MMRBand::MMRBand : No number of columns documented"
            )
        if not rows:
            raise ValueError("MMRBand::MMRBand : No number of rows documented")
        self.width, self.height = int(cols), int(rows)
        if self.width <= 0 or self.height <= 0:
            raise ValueError("MMRBand::MMRBand : (nWidth <= 0 || nHeight <= 0)")
        comp = chain("TipusCompressio") or rel.get("ATTRIBUTE_DATA",
                                                   "TipusCompressio")
        if not comp:
            raise ValueError("MiraMonRaster: no nDataType documented")
        if comp not in _DTYPES:
            raise ValueError(f"MiraMonRaster: data type unhandled ({comp})")
        self.comp_type = comp
        self.kind, self.dtype = _DTYPES[comp]
        # the reference opens the band file only after the dimension and
        # data-type gates have passed (MMRBand ctor order)
        if not os.path.exists(self.img_path):
            raise ValueError(
                f"Failed to open MiraMon band file `{self.img_path}'"
            )

        # nodata: band section first, else dataset section; empty = unset
        nodata = rel.get(sec, "NODATA")
        if nodata is None:
            nodata = rel.get("ATTRIBUTE_DATA", "NODATA")
        self.nodata = float(nodata) if nodata else None

        mn, mx = rel.get(sec, "min"), rel.get(sec, "max")
        self.minimum = float(mn) if mn not in (None, "") else None
        self.maximum = float(mx) if mx not in (None, "") else None

        # bounding box: [sec:EXTENT] else [EXTENT]; default 0..cols/rows
        ext_sec = f"{sec}:EXTENT"
        def ext(key, dflt):
            v = rel.get(ext_sec, key)
            if v is None:
                v = rel.get("EXTENT", key)
            return float(v) if v not in (None, "") else dflt

        self.bbox = (
            ext("MinX", 0.0), ext("MaxX", float(self.width)),
            ext("MinY", 0.0), ext("MaxY", float(self.height)),
        )
        # symbolization / grouping keys (BandInTheSameDataset)
        self.palette = (rel.get(f"COLOR_TEXT:{band_name}", "Color_Paleta")
                        or rel.get("COLOR_TEXT", "Color_Paleta") or "")
        self.tractament = (chain("TractamentVariable")
                           or rel.get("ATTRIBUTE_DATA", "TractamentVariable")
                           or "")
        self.rat = rel.get(sec, "IndexsJoinTaula") or ""
        self.descriptor = rel.get(sec, "descriptor") or ""

    @property
    def geotransform(self) -> tuple:
        minx, maxx, miny, maxy = self.bbox
        return (minx, (maxx - minx) / self.width, 0.0,
                maxy, 0.0, -(maxy - miny) / self.height)

    @property
    def dtype_name(self) -> str:
        return {"u1": "Byte", "i2": "Int16", "u2": "UInt16", "i4": "Int32",
                "f4": "Float32", "f8": "Float64"}[self.dtype.str[1:]]

    # -- decoding -----------------------------------------------------
    def read(self) -> np.ndarray:
        data = open(self.img_path, "rb").read()
        w, h = self.width, self.height
        if self.kind == "bit":
            stride = (w + 7) // 8
            rows = np.frombuffer(data, np.uint8, stride * h).reshape(h, stride)
            bits = np.unpackbits(rows, axis=1, bitorder="little")
            return bits[:, :w]
        if self.kind == "raw":
            n = w * h
            return np.frombuffer(data, self.dtype, n).reshape(h, w)
        return self._read_rle(data)

    def _row_index(self, data: bytes) -> list[int] | None:
        """PositionAtStartOfRowOffsetsInFile: walk trailing IMG x.y
        sections for the row-offsets section (type 2)."""
        if len(data) < 32 + self.height + 32:
            return None
        tail = data[-32:]
        if tail[:16] != b"\x00" * 16:
            return None
        magic = tail[16:24]
        if magic[:4] != b"IMG " or magic[5:6] != b".":
            return None
        hdr_off = struct.unpack("<Q", tail[24:32])[0]
        seen = set()
        while True:
            if hdr_off + 24 > len(data):
                return None
            if data[hdr_off : hdr_off + 4] != b"IMG ":
                return None
            sec_type = struct.unpack("<i", data[hdr_off + 8 : hdr_off + 12])[0]
            if sec_type == 2:
                break
            nxt = struct.unpack(
                "<Q", data[hdr_off + 24 : hdr_off + 32]
            )[0]
            if nxt == 0 or nxt in seen:
                return None
            seen.add(nxt)
            hdr_off = nxt
        off_size = struct.unpack("<i", data[hdr_off + 12 : hdr_off + 16])[0]
        if off_size not in (1, 2, 4, 8):
            return None
        p = hdr_off + 16 + 16
        fmt = {1: "<B", 2: "<H", 4: "<I", 8: "<Q"}[off_size]
        out = []
        for _ in range(self.height):
            out.append(struct.unpack(fmt, data[p : p + off_size])[0])
            p += off_size
        return out

    def _decode_rle_row(self, data: bytes, pos: int, out_row: np.ndarray
                        ) -> int:
        """UncompressRow: counter 0 -> literal run, else repeat run.
        Returns the position after the row."""
        w = self.width
        size = self.dtype.itemsize
        acc = 0
        while acc < w:
            counter = data[pos]
            pos += 1
            if counter == 0:
                counter = data[pos]
                pos += 1
                if acc + counter > w:
                    raise ValueError("MiraMon RLE row overflow")
                vals = np.frombuffer(data, self.dtype, counter, pos)
                out_row[acc : acc + counter] = vals
                pos += counter * size
                acc += counter
            else:
                if acc + counter > w:
                    raise ValueError("MiraMon RLE row overflow")
                val = np.frombuffer(data, self.dtype, 1, pos)[0]
                out_row[acc : acc + counter] = val
                pos += size
                acc += counter
        return pos

    def _read_rle(self, data: bytes) -> np.ndarray:
        out = np.zeros((self.height, self.width), self.dtype)
        index = self._row_index(data)
        if index is not None:
            for r, off in enumerate(index):
                self._decode_rle_row(data, off, out[r])
        else:
            pos = 0
            for r in range(self.height):
                pos = self._decode_rle_row(data, pos, out[r])
        return out

    # grouping key (miramon_dataset.cpp BandInTheSameDataset)
    def group_key(self):
        is_categorical = self.tractament.lower().startswith("categoric")
        # the reference compares the uncompressed data type, so byte and
        # byte-RLE bands group together (GeteMMNCDataType)
        nc_type = self.comp_type.replace("-RLE", "")
        return (
            self.width, self.height, nc_type, self.bbox,
            self.palette.lower(), self.tractament.lower(),
            is_categorical,
            self.maximum if is_categorical else None,
            self.rat.lower(),
            self.nodata is not None, self.nodata,
        )


class MiraMonDataset:
    def __init__(self, rel_path: str, band_filter: list[str] | None = None):
        rel = MMRel(rel_path)
        rel.check_rel4()
        self.rel = rel
        names = rel.get("ATTRIBUTE_DATA", "IndexsNomsCamps")
        if not names:  # missing or empty value both fail the gate
            raise ValueError(
                "ATTRIBUTE_DATA-IndexsNomsCamps section-key should exist"
            )
        band_names = []
        for idx in names.split(","):
            idx = idx.strip()
            if not idx:
                continue
            b = rel.get("ATTRIBUTE_DATA", f"NomCamp_{idx}")
            if b:
                band_names.append(b)
        bands = [MiraMonBand(rel, b) for b in band_names]
        if band_filter is not None:
            bands = [b for b in bands
                     if os.path.basename(b.raw_name) in band_filter]
        if not bands:
            raise ValueError(
                f"Unable to open {rel_path}, it has zero usable bands."
            )
        self.all_bands = bands

        # assign to subdatasets by compatibility, in band order
        groups: list[list[MiraMonBand]] = []
        for b in bands:
            for g in groups:
                if g[0].group_key() == b.group_key():
                    g.append(b)
                    break
            else:
                groups.append([b])
        if len(groups) == 1 or band_filter is not None:
            self.bands = bands
            self.subdatasets = []
        else:
            self.bands = []
            self.subdatasets = []
            for i, g in enumerate(groups, 1):
                name = f'MiraMonRaster:"{rel.path}"' + "".join(
                    f',"{b.raw_name}"' for b in g
                )
                desc = f'Subdataset {i}: "{g[0].name}"' + "".join(
                    f',"{b.name}"' for b in g[1:]
                )
                self.subdatasets.append((name, desc))

    @property
    def width(self):
        return (self.bands[0].width if self.bands
                else int(self.rel.get("OVERVIEW:ASPECTES_TECNICS", "columns")))

    @property
    def height(self):
        return (self.bands[0].height if self.bands
                else int(self.rel.get("OVERVIEW:ASPECTES_TECNICS", "rows")))

    @property
    def geotransform(self):
        if self.bands:
            return self.bands[0].geotransform
        return None


def miramon_open(path: str) -> MiraMonDataset:
    """Open an I.rel, a .img, or a MiraMonRaster:"rel","img",... name."""
    if path.startswith("MiraMonRaster:"):
        parts = [p.strip().strip('"') for p in
                 path[len("MiraMonRaster:"):].split(",")]
        rel_path, imgs = parts[0], parts[1:]
        if not rel_path.endswith("I.rel"):
            raise ValueError(f"{path} not recognized as being in a "
                             "supported file format")
        return MiraMonDataset(rel_path,
                              band_filter=[os.path.basename(i) for i in imgs])
    if path.endswith("I.rel"):
        return MiraMonDataset(path)
    if path.lower().endswith(".rel"):
        raise ValueError(f"{path} not recognized as being in a "
                         "supported file format")
    rel_path = _find_rel_for_img(path)
    return MiraMonDataset(rel_path)
