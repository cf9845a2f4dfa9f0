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


# first entries of the reference's predefined thematic palette
# (miramon_palettes.h m_ThematicPalette); automatic categorical palettes
# are truncated to band max + 1, so the head of the table suffices
_THEMATIC_PALETTE = [
    (0, 0, 255), (0, 255, 255), (0, 255, 0), (255, 255, 0), (255, 0, 0),
    (255, 0, 255), (191, 191, 191), (0, 128, 255), (128, 0, 255),
    (0, 255, 128), (128, 255, 0), (255, 128, 0), (255, 0, 128),
    (128, 255, 255), (128, 128, 255), (128, 255, 128), (255, 128, 255),
    (255, 128, 128), (255, 255, 128), (128, 128, 128), (0, 0, 128),
    (0, 128, 128), (0, 128, 0), (128, 128, 0), (128, 0, 0), (128, 0, 128),
    (64, 64, 64), (0, 0, 191), (128, 128, 191), (0, 191, 191), (0, 191, 0),
    (191, 191, 0), (191, 0, 0), (191, 0, 191), (0, 128, 191),
]


def _palette_from_dbf(path: str):
    """DBF palette: CLAUSIMBOL/R_COLOR/G_COLOR/B_COLOR numeric fields;
    a blank CLAUSIMBOL marks the nodata row; (-1,-1,-1) rows render
    transparent (AssignColorFromDBF)."""
    data = open(path, "rb").read()
    nrec = struct.unpack("<I", data[4:8])[0]
    hdr_len, rec_len = struct.unpack("<HH", data[8:12])
    fields = []
    pos = 32
    acc = 1  # deletion-flag byte
    while pos < hdr_len - 1 and data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fields.append((name.upper(), ftype, acc, flen))
        acc += flen
        pos += 32
    idx = {name: (off, flen, ftype)
           for name, ftype, off, flen in fields}
    for req in ("CLAUSIMBOL", "R_COLOR", "G_COLOR", "B_COLOR"):
        if req not in idx or idx[req][2] != "N" or idx[req][1] == 0:
            raise ValueError(f"Invalid color table: {path}")
    if nrec < 0 or nrec > 65536:
        raise ValueError(f"Invalid color table: {path}")
    colors = []
    nodata_index = None
    for i in range(nrec):
        rec = data[hdr_len + i * rec_len : hdr_len + (i + 1) * rec_len]
        if len(rec) < rec_len:
            raise ValueError(f"Invalid color table: {path}")

        def fval(name):
            off, flen, _ = idx[name]
            return rec[off : off + flen].decode("ascii", "replace")

        if fval("CLAUSIMBOL").replace(" ", "") == "":
            nodata_index = i
        r = float(fval("R_COLOR") or 0)
        g = float(fval("G_COLOR") or 0)
        b = float(fval("B_COLOR") or 0)
        if (r, g, b) == (-1.0, -1.0, -1.0):
            colors.append((0, 0, 0, 0))  # transparent nodata colour
        else:
            colors.append((int(r), int(g), int(b), 255))
    return colors, nodata_index


def _palette_from_pal(path: str, size: int):
    """PAL/P25/P65 text palettes: `index R G B` lines, default-colour
    padded to the format's fixed size."""
    colors = []
    with open(path, "rb") as f:
        for line in f.read().decode("latin-1", "replace").splitlines():
            line = line.strip()
            if not line:
                continue
            toks = line.split()
            if len(toks) != 4:
                raise ValueError(f"Invalid color table: {path}")
            if len(colors) >= size:
                raise ValueError(f"Invalid color table: {path}")
            colors.append((int(float(toks[1])), int(float(toks[2])),
                           int(float(toks[3])), 255))
    while len(colors) < size:
        colors.append((0, 0, 0, 127))
    return colors


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

    # -- colour tables (miramon_palettes.cpp / miramon_rasterband.cpp) --
    def _visu_min_max(self):
        """COLOR_TEXT Color_ValorColor_0 / _n_1, falling back to the
        band min/max (MMRBand::UpdateMinMaxVisuValuesFromREL)."""
        def ct(key):
            v = self.rel.get(f"COLOR_TEXT:{self.name}", key)
            if v is None:
                v = self.rel.get("COLOR_TEXT", key)
            return v

        vmin, vmax = ct("Color_ValorColor_0"), ct("Color_ValorColor_n_1")
        vmin = float(vmin) if vmin not in (None, "") else self.minimum
        vmax = float(vmax) if vmax not in (None, "") else self.maximum
        return vmin, vmax

    def _ct_key(self, key):
        v = self.rel.get(f"COLOR_TEXT:{self.name}", key)
        if v is None:
            v = self.rel.get("COLOR_TEXT", key)
        return v

    def color_table(self) -> dict[int, tuple] | None:
        """GDAL color table as {index: (r, g, b, a)}, or None when the
        reference would return no table."""
        try:
            return self._color_table_inner()
        except (ValueError, OSError, KeyError, IndexError):
            return None

    def _color_table_inner(self):
        is_byte = self.comp_type.replace("-RLE", "") in ("byte", "bit")
        is_uint = self.comp_type.replace("-RLE", "") == "uinteger"
        n_possible_int = 256 if is_byte else 65536 if is_uint else None

        # constant colour (AssignUniformColorTable)
        if self._ct_key("Color_Const") == "1":
            smb = (self._ct_key("Color_Smb") or "").replace(" ", "")
            if not (smb.startswith("(") and smb.endswith(")")):
                return None
            rgb = [int(v) for v in smb[1:-1].split(",")]
            if len(rgb) != 3:
                return None
            vmin, vmax = self._visu_min_max()
            max_index = 0.0
            if self.nodata is not None and self.nodata >= 0:
                max_index = self.nodata + 1
            if vmax is not None and vmax >= 0:
                max_index = max(max_index, vmax + 1)
            if max_index:
                n = int(max_index)
            elif n_possible_int:
                n = n_possible_int
            else:
                return None
            out = {}
            for i in range(n):
                if self.nodata is not None and i == self.nodata:
                    out[i] = (0, 0, 0, 0)
                else:
                    out[i] = (rgb[0], rgb[1], rgb[2], 255)
            return out

        paleta = self._ct_key("Color_Paleta") or ""
        tract = self._ct_key("Color_TractamentVariable") or ""
        if tract:
            categorical = tract == "Categoric"
        else:
            categorical = self.tractament.lower().startswith("categoric")
        scaling = {"AssigDirecta": "direct", "lineal": "linear",
                   "DespOrigen": "displacement", "log_10": "log",
                   "IntervalsUsuari": "intervals"}.get(
            self._ct_key("Color_EscalatColor") or "",
            "direct" if categorical else "linear")

        automatic = paleta in ("", "<Automatic>")
        palette_nodata_index = None
        if automatic:
            if self._ct_key("Color_N_SimbolsALaTaula"):
                return None  # colors declared but no color source
            if not categorical:
                return None
            colors = [c + (255,) if len(c) == 3 else c
                      for c in _THEMATIC_PALETTE]
        else:
            ext = paleta.rsplit(".", 1)[-1].lower() if "." in paleta else ""
            path = os.path.join(os.path.dirname(os.path.abspath(self.rel.path)),
                                paleta)
            if ext == "dbf":
                colors, palette_nodata_index = _palette_from_dbf(path)
            elif ext in ("pal", "p25", "p65"):
                size = {"pal": 64, "p25": 256, "p65": 65536}[ext]
                colors = _palette_from_pal(path, size)
            else:
                return None
            if palette_nodata_index is not None and palette_nodata_index \
                    == len(colors) - 1:
                pass  # trailing nodata row: usable colors = len - 1

        n_colors = len(colors)
        if n_colors == 0:
            return None

        if categorical:
            if scaling != "direct":
                return None
            if n_possible_int is None:
                n_possible = n_colors
            elif automatic and self.maximum is not None:
                n_possible = int(self.maximum) + 1
                if n_possible <= 0 or n_possible >= 65536:
                    return None
            else:
                n_possible = n_possible_int
            out = {}
            for i in range(n_possible):
                if i < n_colors:
                    out[i] = colors[i]
                else:
                    out[i] = (0, 0, 0, 127)  # default colour
            return out

        # continuous mode (FromPaletteToColorTableContinuousMode)
        if scaling not in ("linear", "direct"):
            return None
        if is_byte and scaling in ("linear", "direct"):
            pass
        elif is_uint and scaling == "direct":
            pass
        else:
            return None
        vmin, vmax = self._visu_min_max()
        if vmin is None or vmax is None:
            return None
        n_possible = n_possible_int
        # usable colours exclude a real nodata palette row; a palette
        # without one gets a virtual nodata index == usable count
        has_pal_nodata = palette_nodata_index is not None
        usable = n_colors - 1 if has_pal_nodata else n_colors
        if usable < 1:
            return None
        if not has_pal_nodata:
            palette_nodata_index = usable
        first_valid = 1 if has_pal_nodata and palette_nodata_index == 0 else 0
        nodata_ct_index = 0
        if not is_byte or scaling != "direct":
            if self.nodata is not None and palette_nodata_index == usable:
                nodata_ct_index = n_possible - 1
        slope = (usable - 1) / (vmax - vmin) if vmax != vmin else 1.0
        intercept = -slope * vmin
        out = {}
        for i in range(n_possible):
            if self.nodata is not None and i == nodata_ct_index:
                out[i] = (colors[palette_nodata_index] if has_pal_nodata
                          else (255, 255, 255, 255))
            elif i < int(vmin):
                out[i] = colors[0]
            elif i <= int(vmax):
                if is_byte or scaling == "direct":
                    out[i] = colors[min(first_valid, n_colors - 1)]
                    first_valid += 1
                else:
                    idx = int(slope * i + intercept)
                    out[i] = colors[min(idx, n_colors - 1)]
            else:
                out[i] = colors[usable - 1]
        return out

    # -- raster attribute table (miramon_rasterband.cpp) ----------------
    def _load_palette(self):
        """Palette internals shared by the RAT builders: (colors,
        has_nodata, nodata_index, scaling, categorical, constant_rgb)."""
        constant_rgb = None
        if self._ct_key("Color_Const") == "1":
            smb = (self._ct_key("Color_Smb") or "").replace(" ", "")
            if smb.startswith("(") and smb.endswith(")"):
                rgb = [int(v) for v in smb[1:-1].split(",")]
                if len(rgb) == 3:
                    constant_rgb = tuple(rgb)
        paleta = self._ct_key("Color_Paleta") or ""
        tract = self._ct_key("Color_TractamentVariable") or ""
        categorical = (tract == "Categoric" if tract
                       else self.tractament.lower().startswith("categoric"))
        scaling = {"AssigDirecta": "direct", "lineal": "linear",
                   "DespOrigen": "displacement", "log_10": "log",
                   "IntervalsUsuari": "intervals"}.get(
            self._ct_key("Color_EscalatColor") or "",
            "direct" if categorical else "linear")
        colors, nodata_idx = [], None
        if constant_rgb is None and paleta not in ("", "<Automatic>"):
            ext = paleta.rsplit(".", 1)[-1].lower() if "." in paleta else ""
            path = os.path.join(
                os.path.dirname(os.path.abspath(self.rel.path)), paleta
            )
            if ext == "dbf":
                colors, nodata_idx = _palette_from_dbf(path)
            elif ext in ("pal", "p25", "p65"):
                size = {"pal": 64, "p25": 256, "p65": 65536}[ext]
                colors = _palette_from_pal(path, size)
        return colors, nodata_idx, scaling, categorical, constant_rgb

    def _rat_source(self):
        """UpdateRATInfo + GetRATName: (dbf_path, key_field) or None."""
        idx_join = self.rel.get(self._sec, "IndexsJoinTaula")
        if not idx_join:
            return None
        tok = idx_join.split(",")[0].strip()
        tbl = self.rel.get(self._sec, f"JoinTaula_{tok}")
        if not tbl:
            return None
        short = self.rel.get(f"TAULA_{tbl}", "NomFitxer")
        if not short:
            return None
        assoc = self.rel.get(f"TAULA_{tbl}", "AssociatRel")
        rel_dir = os.path.dirname(os.path.abspath(self.rel.path))
        ext = short.rsplit(".", 1)[-1].lower() if "." in short else ""
        if ext == "rel":
            rat_rel = MMRel(os.path.join(rel_dir, short))
            dbf = rat_rel.get("TAULA_PRINCIPAL", "NomFitxer")
            assoc = rat_rel.get("TAULA_PRINCIPAL", "AssociatRel")
            if not dbf or not assoc:
                return None
            tract = rat_rel.get(f"TAULA_PRINCIPAL:{assoc}",
                                "TractamentVariable")
            if tract != "Categoric":
                return None
            return os.path.join(rel_dir, dbf), assoc
        if ext == "dbf":
            if not assoc:
                return None
            return os.path.join(rel_dir, short), assoc
        return None

    def default_rat(self):
        """GDAL GetDefaultRAT: {"columns": [...], "rows": [[...], ...]}
        or None when the reference returns no attribute table."""
        try:
            return self._default_rat_inner()
        except (ValueError, OSError, KeyError, IndexError, ZeroDivisionError):
            return None

    def _default_rat_inner(self):
        src = self._rat_source()
        if src is None:
            if self.color_table() is not None:
                # colours already exposed through the colour table
                pass
            return self._rat_from_palette()
        dbf_path, key_field = src
        from gdal_spark.sources.miramon_vector import read_extended_dbf

        fields, records = read_extended_dbf(dbf_path, raw_logical=True)
        names = [f["name"] for f in fields]
        if key_field not in names:
            return None
        key_idx = names.index(key_field)
        columns = [key_field] + [n for i, n in enumerate(names)
                                 if i != key_idx]
        # rows are indexed by the integer category value itself
        # (CreateRATFromDBF: SetRowCount(cat+1); SetValue(cat, ...))
        by_cat = {}
        for r in records:
            try:
                cat = int(r[key_field])
            except (TypeError, ValueError):
                return None
            by_cat[cat] = [r[key_field]] + [
                r[n] for i, n in enumerate(names) if i != key_idx
            ]
        if not by_cat:
            return None
        nrows = max(by_cat) + 1
        rows = [by_cat.get(i, [None] * len(columns)) for i in range(nrows)]
        return {"columns": columns, "rows": rows, "thematic": True}

    def _rat_from_palette(self):
        """FromPaletteToAttributeTable: constant / direct / linear."""
        colors, nodata_idx, scaling, categorical, constant_rgb = \
            self._load_palette()
        if scaling not in ("linear", "direct"):
            return None
        vmin, vmax = self._visu_min_max()
        if constant_rgb is not None:
            if vmin is None or vmax is None:
                return None
            rows = []
            if self.nodata is not None:
                rows.append([self.nodata, self.nodata, 0, 0, 0])
            rows.append([vmin, vmax, *constant_rgb])
            return {"columns": ["MIN", "MAX", "Red", "Green", "Blue"],
                    "rows": rows, "thematic": True}
        n_incl = len(colors)
        if n_incl == 0:
            return None
        has_nodata = nodata_idx is not None
        n_colors = n_incl - 1 if has_nodata else n_incl
        if n_colors <= 0:
            return None
        if nodata_idx is None:
            nodata_idx = n_colors

        def rgb(i):
            c = colors[min(i, n_incl - 1)]
            return [c[0], c[1], c[2]]

        if scaling == "direct":
            rows = []
            if self.nodata is not None and has_nodata:
                rows.append([self.nodata, *rgb(nodata_idx)])
            for i in range(n_colors):
                if i == nodata_idx:
                    continue
                rows.append([i, *rgb(i)])
            return {"columns": ["MIN_MAX", "Red", "Green", "Blue"],
                    "rows": rows, "thematic": True}

        # linear
        if vmin is None or vmax is None:
            return None
        is_int = self.dtype.kind in "iu"
        import math

        rows = []
        if self.nodata is not None and has_nodata:
            rows.append([self.nodata, self.nodata, *rgb(nodata_idx)])
        interval = (vmax - vmin) / (n_colors + 1)
        nodata_skip = (n_incl if self.nodata is not None
                       and nodata_idx == n_colors else 0)
        first = True
        i = 0
        for i in range(n_colors - 1):
            if self.nodata is not None and has_nodata and i == nodata_skip:
                continue
            mn = vmin + interval * i
            if not first and is_int:
                mn = math.ceil(mn)
            first = False
            mx = vmin + interval * (i + 1)
            if is_int:
                mx = math.ceil(mx)
            rows.append([mn, mx, *rgb(i)])
        i = n_colors - 1
        mn = vmin + interval * (n_colors - 1)
        if is_int:
            mn = math.ceil(mn)
        rows.append([mn, vmax, *rgb(i - 1)])
        rows.append([vmax, vmax, *rgb(i - 1)])
        return {"columns": ["MIN", "MAX", "Red", "Green", "Blue"],
                "rows": rows, "thematic": False}

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
