"""Sentinel-2 SAFE product driver (L1C / L2A, old + safe-compact styles).

Re-expresses frmts/sentinel2/sentinel2dataset.cpp's open path:

* product-level metadata harvesting (General_Info Product_Info /
  L2A_Product_Info direct text children, DATATAKE_n_* expansion,
  Special_Values, QUANTIFICATION_VALUE + the L2A quantification-value
  list with _UNIT suffixes, REFERENCE_BAND index -> band-name lookup,
  Quality_Indicators_Info cloud/degraded/quality-flag/Image_Content_QI
  keys, FOOTPRINT from Global_Footprint EXT_POS_LIST lat/lon swap)
  -- sentinel2dataset.cpp:1104 (SENTINEL2GetUserProductMetadata);
* the SUBDATASETS listing (``SENTINEL2_L1C:<xml>:<res>m:EPSG_<code>``
  plus PREVIEW / TCI entries, descriptions ``Bands ... with NNm
  resolution, UTM ZZN``) -- sentinel2dataset.cpp:3095;
* subdataset resolution: the two-digit band-code set sorted lexically
  with the 02/03/04 -> 04/03/02 RGB swap -- sentinel2dataset.cpp:2104;
* tile mosaics: per-granule Tile_Geocoding (Size NROWS/NCOLS +
  Geoposition ULX/ULY/XDIM/YDIM per resolution) unioned into the
  subdataset extent with per-tile DstRect placements (the VRT
  SimpleSource layout the reference emits);
* per-band metadata (BANDNAME/BANDWIDTH/WAVELENGTH + units,
  SOLAR_IRRADIANCE by bandId), IMAGERY CENTRAL_WAVELENGTH_UM/FWHM_UM,
  colour interpretation from the asBandDesc table
  (sentinel2dataset.cpp:65), NBITS=12 UInt16 reflectance bands,
  Byte TCI/PREVIEW bands, the L2A SCL category table.

Only label/metadata structure is materialized here (the JP2 payloads
in the reference's own test fixtures are stubs); the mosaic placement
maths, band tables and metadata dictionaries are asserted against the
reference autotest expectations (autotest/gdrivers/sentinel2.py).
"""

from __future__ import annotations

import glob
import os
import re
import xml.etree.ElementTree as ET

__all__ = ["sentinel2_open", "Sentinel2Product", "Sentinel2SubDataset"]

# asBandDesc (sentinel2dataset.cpp:65); list index == bandId used by
# Solar_Irradiance_List / PHYSICAL_GAINS / REFERENCE_BAND.
_BANDS = [
    # code, name, res, wavelength(nm), bandwidth(nm), colour interp
    ("01", "B1", 60, 443, 20, "Coastal"),
    ("02", "B2", 10, 490, 65, "Blue"),
    ("03", "B3", 10, 560, 35, "Green"),
    ("04", "B4", 10, 665, 30, "Red"),
    ("05", "B5", 20, 705, 15, "RedEdge"),
    ("06", "B6", 20, 740, 15, "RedEdge"),
    ("07", "B7", 20, 783, 20, "RedEdge"),
    ("08", "B8", 10, 842, 115, "NIR"),
    ("8A", "B8A", 20, 865, 20, "NIR"),
    ("09", "B9", 60, 945, 20, "NIR"),
    ("10", "B10", 60, 1375, 30, "OtherIR"),
    ("11", "B11", 20, 1610, 90, "SWIR"),
    ("12", "B12", 20, 2190, 180, "SWIR"),
]
_BAND_BY_CODE = {b[0]: b for b in _BANDS}
_BAND_BY_CODE["08A"] = _BAND_BY_CODE["8A"]   # L1C padded form
_BAND_BY_NAME = {b[1]: b for b in _BANDS}


def _norm_code(code: str) -> str:
    """L1C band-code normalization (SENTINEL2GetResolutionSet): strip
    the B, zero-pad when the numeric part is < 10 — so 'B8A' -> '08A'
    and sorts between 07 and 11.  (L2A old-style keeps the raw file
    suffix, where '8A' sorts after '12'.)"""
    if code.startswith("B"):
        code = code[1:]
    num = ""
    for ch in code:
        if ch.isdigit():
            num += ch
        else:
            break
    if num and int(num) < 10 and not code.startswith("0"):
        code = "0" + code
    return code

# L2A SCL classification (sentinel2dataset.cpp SCL category table)
SCL_CATEGORIES = [
    "NODATA", "SATURATED_DEFECTIVE", "DARK_FEATURE_SHADOW",
    "CLOUD_SHADOW", "VEGETATION", "BARE_SOIL_DESERT", "WATER",
    "CLOUD_LOW_PROBA", "CLOUD_MEDIUM_PROBA", "CLOUD_HIGH_PROBA",
    "THIN_CIRRUS", "SNOW_ICE",
]

_L2A_SPECIAL_BANDS = ("AOT", "CLD", "SCL", "SNW", "WVP")


def _strip(tag):
    return tag.rsplit("}", 1)[-1]


def _children(el, name):
    return [c for c in el if _strip(c.tag) == name]


def _find(el, name):
    for c in el.iter():
        if _strip(c.tag) == name:
            return c
    return None


def _text(el, name, default=None):
    c = _find(el, name)
    return c.text.strip() if c is not None and c.text else default


def _utm_desc(epsg: int) -> str:
    if 32601 <= epsg <= 32660:
        return "UTM %dN" % (epsg - 32600)
    if 32701 <= epsg <= 32760:
        return "UTM %dS" % (epsg - 32700)
    return "EPSG:%d" % epsg


def _band_label(code: str) -> str:
    """'04' -> 'B4', '8A' -> 'B8A', 'AOT' -> 'AOT'
    (SENTINEL2GetBandListForResolution, sentinel2dataset.cpp:1405)."""
    stripped = code.lstrip("0") or code
    if stripped[:1].isdigit():
        return "B" + stripped
    return code


def _order_bands(codes) -> list:
    """Sorted set order, with the leading 02,03,04 swapped to
    04,03,02 so RGB come first (sentinel2dataset.cpp:2104)."""
    out = sorted(set(codes))
    if len(out) >= 3 and out[0] == "02" and out[1] == "03" and out[2] == "04":
        out[0], out[2] = "04", "02"
    return out


class _Granule:
    """One tile: its directory, MTD XML, geocoding, image files."""

    def __init__(self, safe_dir, granule_dir):
        self.dir = granule_dir
        self.images = {}        # band code -> jp2 path
        self.preview = None     # PVI jp2 path (old-style products)
        xmls = sorted(glob.glob(os.path.join(granule_dir, "*.xml")))
        if not xmls:
            raise ValueError(f"no granule MTD in {granule_dir}")
        self.mtd_path = xmls[0]
        root = ET.parse(self.mtd_path).getroot()
        code = _text(root, "HORIZONTAL_CS_CODE", "")
        m = re.match(r"EPSG:(\d+)$", code or "")
        if not m:
            raise ValueError(f"bad HORIZONTAL_CS_CODE in {self.mtd_path}")
        self.epsg = int(m.group(1))
        geo = _find(root, "Tile_Geocoding")
        self.geocoding = {}     # res -> (nrows, ncols, ulx, uly, xdim, ydim)
        sizes, pos = {}, {}
        for s in _children(geo, "Size"):
            sizes[int(s.get("resolution"))] = (
                int(_text(s, "NROWS")), int(_text(s, "NCOLS")))
        for p in _children(geo, "Geoposition"):
            pos[int(p.get("resolution"))] = (
                float(_text(p, "ULX")), float(_text(p, "ULY")),
                float(_text(p, "XDIM")), float(_text(p, "YDIM")))
        for res in sizes:
            if res in pos:
                self.geocoding[res] = sizes[res] + pos[res]

    def extent(self, res):
        """(minx, maxy, maxx, miny) of this tile at `res` (falls back
        to any available resolution's grid for PREVIEW/TCI)."""
        g = self.geocoding.get(res)
        if g is None:
            g = self.geocoding[min(self.geocoding)]
        nrows, ncols, ulx, uly, xdim, ydim = g
        return ulx, uly, ulx + ncols * abs(xdim), uly - nrows * abs(ydim)


class Sentinel2Product:
    """An opened product-level MTD XML (main dataset)."""

    def __init__(self, path):
        self.path = path
        root = ET.parse(path).getroot()
        tag = _strip(root.tag)
        if tag == "Level-1C_User_Product":
            self.level = "L1C"
        elif tag == "Level-2A_User_Product":
            self.level = "L2A"
        else:
            raise ValueError(f"unsupported Sentinel-2 product root {tag}")
        self.root = root
        safe_dir = os.path.dirname(os.path.abspath(path))
        self.safe_dir = safe_dir

        pinfo = (_find(root, "Product_Info")
                 or _find(root, "L2A_Product_Info"))
        if pinfo is None:
            raise ValueError("no Product_Info")
        self._pinfo = pinfo

        # --- granules + band->file maps -------------------------------
        self.granules: list[_Granule] = []
        self.is_compact = False
        self.res_bands: dict[int, set] = {}   # res -> set of band codes
        org = (_find(pinfo, "Product_Organisation")
               or _find(pinfo, "L2A_Product_Organisation"))
        if org is None:
            raise ValueError("no Product_Organisation")
        for gl in _children(org, "Granule_List"):
            for gran_el in list(gl):
                name = _strip(gran_el.tag)
                if name == "Granules":
                    self._add_old_granule(gran_el)
                elif name == "Granule":
                    self.is_compact = True
                    self._add_compact_granule(gran_el)
        if not self.granules:
            raise ValueError("no granules")

        if self.level == "L1C" and not self.is_compact:
            # resolutions from Query_Options Band_List
            # (SENTINEL2GetResolutionSet)
            bl = _find(pinfo, "Band_List")
            for bn in (_children(bl, "BAND_NAME") if bl is not None else []):
                desc = _BAND_BY_NAME.get((bn.text or "").strip())
                if desc:
                    self.res_bands.setdefault(desc[2], set()).add(
                        _norm_code(desc[1]))

        self.epsg_codes = sorted({g.epsg for g in self.granules})
        self.metadata = self._product_metadata(with_footprint=True)

    # -- granule parsing ----------------------------------------------
    def _add_old_granule(self, gran_el):
        gid = gran_el.get("granuleIdentifier")
        gdir = os.path.join(self.safe_dir, "GRANULE", gid)
        g = _Granule(self.safe_dir, gdir)
        tile = re.sub(r"_N[\d.]+$", "", gid)   # strip processing baseline
        for img in list(gran_el):
            t = _strip(img.tag)
            iid = (img.text or "").strip()
            if not iid:
                continue
            if t == "IMAGE_ID":                       # L1C old style
                code = _norm_code(iid.rsplit("_", 1)[-1])
                g.images[code] = os.path.join(
                    gdir, "IMG_DATA", iid + ".jp2")
            elif t == "IMAGE_ID_2A":                  # L2A old style
                mb = re.search(r"_B(\w\w)_(\d+)m$", iid)
                ms = re.search(r"_(%s)_" % "|".join(_L2A_SPECIAL_BANDS), iid)
                mr = re.search(r"_(\d+)m$", iid)
                if not mr:
                    continue
                res = int(mr.group(1))
                if mb:
                    code = mb.group(1)
                elif ms:
                    code = ms.group(1)
                else:
                    continue
                path = self._probe_l2a_image(gdir, iid, res)
                if path:
                    g.images[code] = path
                    self.res_bands.setdefault(res, set()).add(code)
        # old-style preview image: granuleId with MSI->PVI under QI_DATA
        pvi = tile.replace("_MSI_", "_PVI_") + ".jp2"
        ppath = os.path.join(gdir, "QI_DATA", pvi)
        if os.path.exists(ppath):
            g.preview = ppath
        self.granules.append(g)

    @staticmethod
    def _probe_l2a_image(gdir, iid, res):
        """L2A tile location varies by band kind (TL_IMG_DATA /
        TL_IMG_DATA_Rxxm / TL_QI_DATA, sentinel2dataset.cpp:85)."""
        for sub in (os.path.join("IMG_DATA", "R%dm" % res), "IMG_DATA",
                    "QI_DATA"):
            p = os.path.join(gdir, sub, iid + ".jp2")
            if os.path.exists(p):
                return p
        return None

    def _add_compact_granule(self, gran_el):
        files = [(_strip(c.tag), (c.text or "").strip())
                 for c in list(gran_el)]
        files = [f for t, f in files if t == "IMAGE_FILE" and f]
        if not files:
            return
        gdir = os.path.join(self.safe_dir,
                            *files[0].split("/")[:2])
        g = _Granule(self.safe_dir, gdir)
        for f in files:
            base = f.rsplit("/", 1)[-1]
            m = re.search(r"_(B\w\w|TCI|AOT|WVP|SCL)(?:_(\d+)m)?$", base)
            if not m:
                continue
            code = m.group(1)
            res = int(m.group(2)) if m.group(2) else None
            if code == "TCI":
                g.preview = os.path.join(self.safe_dir, f + ".jp2")
                continue
            if code.startswith("B"):
                code = _norm_code(code)
            g.images[code] = os.path.join(self.safe_dir, f + ".jp2")
            if res is None:
                desc = _BAND_BY_CODE.get(code)
                res = desc[2] if desc else None
            if res is not None:
                self.res_bands.setdefault(res, set()).add(code)
        self.granules.append(g)

    # -- product metadata ---------------------------------------------
    def _product_metadata(self, with_footprint):
        md = {}
        root, pinfo = self.root, self._pinfo
        dt_counter = 1
        for c in list(pinfo):
            name = _strip(c.tag)
            if name == "Datatake":
                prefix = "DATATAKE_%d_" % dt_counter
                dt_counter += 1
                did = c.get("datatakeIdentifier")
                if did:
                    md[prefix + "ID"] = did
                for c2 in list(c):
                    if c2.text and c2.text.strip() and len(c2) == 0:
                        md[prefix + _strip(c2.tag)] = c2.text.strip()
            elif c.text and c.text.strip() and len(c) == 0:
                md[name] = c.text.strip()

        ic = (_find(root, "Product_Image_Characteristics")
              or _find(root, "L2A_Product_Image_Characteristics"))
        self.solar_irradiance = {}
        self.quantification = None
        if ic is not None:
            for sv in _children(ic, "Special_Values"):
                text = _text(sv, "SPECIAL_VALUE_TEXT")
                idx = _text(sv, "SPECIAL_VALUE_INDEX")
                if text and idx:
                    md["SPECIAL_VALUE_" + text] = idx
            qv = None
            for c in ic.iter():
                if _strip(c.tag) == "QUANTIFICATION_VALUE":
                    qv = c
                    break
            if qv is not None and qv.text:
                md["QUANTIFICATION_VALUE"] = qv.text.strip()
                self.quantification = qv.text.strip()
            rc = _find(ic, "Reflectance_Conversion")
            if rc is not None:
                u = _text(rc, "U")
                if u:
                    md["REFLECTANCE_CONVERSION_U"] = u
                sil = _find(rc, "Solar_Irradiance_List")
                for si in (sil if sil is not None else []):
                    if _strip(si.tag) != "SOLAR_IRRADIANCE":
                        continue
                    try:
                        idx = int(si.get("bandId"))
                    except (TypeError, ValueError):
                        continue
                    if 0 <= idx < len(_BANDS) and si.text:
                        self.solar_irradiance[_BANDS[idx][1]] = \
                            si.text.strip()
            qvl = (_find(ic, "L1C_L2A_Quantification_Values_List")
                   or _find(ic, "Quantification_Values_List"))
            for c in (qvl if qvl is not None else []):
                name = _strip(c.tag)
                if c.text and c.text.strip():
                    md[name] = c.text.strip()
                    unit = c.get("unit")
                    if unit:
                        md[name + "_UNIT"] = unit
            ref = _text(ic, "REFERENCE_BAND")
            if ref is not None:
                try:
                    idx = int(ref)
                    if 0 <= idx < len(_BANDS):
                        md["REFERENCE_BAND"] = _BANDS[idx][1]
                except ValueError:
                    pass

        qii = _find(root, "Quality_Indicators_Info")
        if qii is not None:
            cc = _text(qii, "Cloud_Coverage_Assessment")
            if cc is not None:
                md["CLOUD_COVERAGE_ASSESSMENT"] = cc
            tqa = _find(qii, "Technical_Quality_Assessment")
            if tqa is not None:
                for key in ("DEGRADED_ANC_DATA_PERCENTAGE",
                            "DEGRADED_MSI_DATA_PERCENTAGE"):
                    v = _text(tqa, key)
                    if v is not None:
                        md[key] = v
            qi = _find(qii, "Quality_Inspections")
            for c in (qi if qi is not None else []):
                name = _strip(c.tag)
                if len(c) >= 2:
                    # MSIL2A "quality_check" style: <quality_check
                    # checkType=...>PASSED</...> pairs
                    kids = list(c)
                    if kids[0].text and kids[1].text:
                        md[kids[0].text.strip()] = kids[1].text.strip()
                    continue
                if c.text and c.text.strip():
                    md[name] = c.text.strip()
            icq = _find(qii, "Image_Content_QI")
            if icq is None:
                l2aq = _find(root, "L2A_Quality_Indicators_Info")
                if l2aq is not None:
                    icq = _find(l2aq, "Image_Content_QI")
            for c in (icq if icq is not None else []):
                if c.text and c.text.strip() and len(c) == 0:
                    md[_strip(c.tag)] = c.text.strip()

        if with_footprint:
            fp = _find(root, "Global_Footprint")
            if fp is not None:
                pos = (_text(fp, "EXT_POS_LIST") or "").split()
                if len(pos) >= 4 and len(pos) % 2 == 0:
                    pts = ["%s %s" % (pos[i + 1], pos[i])
                           for i in range(0, len(pos), 2)]
                    if pts[0] != pts[-1]:
                        pts.append(pts[0])
                    md["FOOTPRINT"] = "POLYGON((%s))" % ", ".join(pts)
        return md

    # -- subdataset listing -------------------------------------------
    @property
    def subdatasets(self):
        """GDAL-style SUBDATASETS metadata dict."""
        out = {}
        prefix = "SENTINEL2_" + self.level
        i = 1
        for res in sorted(self.res_bands):
            names = ", ".join(_band_label(c)
                              for c in sorted(self.res_bands[res]))
            for epsg in self.epsg_codes:
                out["SUBDATASET_%d_NAME" % i] = \
                    "%s:%s:%dm:EPSG_%d" % (prefix, self.path, res, epsg)
                out["SUBDATASET_%d_DESC" % i] = \
                    "Bands %s with %dm resolution, %s" % (
                        names, res, _utm_desc(epsg))
                i += 1
        label = ("True color image" if self.is_compact
                 else "RGB preview")
        spec = "TCI" if self.is_compact else "PREVIEW"
        for epsg in self.epsg_codes:
            out["SUBDATASET_%d_NAME" % i] = \
                "%s:%s:%s:EPSG_%d" % (prefix, self.path, spec, epsg)
            out["SUBDATASET_%d_DESC" % i] = \
                "%s, %s" % (label, _utm_desc(epsg))
            i += 1
        return out

    def open_subdataset(self, res_spec, epsg, alpha=False):
        return Sentinel2SubDataset(self, res_spec, epsg, alpha=alpha)


class _Band:
    def __init__(self, code, product, byte=False):
        self.code = code
        self.byte = byte
        self.dtype = "uint8" if byte else "uint16"
        self.nbits = 8 if byte else 12
        self.categories = SCL_CATEGORIES if code == "SCL" else None
        desc = _BAND_BY_CODE.get(code)
        if desc is not None and byte:
            # TCI / PREVIEW: Byte RGB bands keep the interp only
            self.name = desc[1]
            self.color_interp = desc[5]
            self.metadata = {"BANDNAME": desc[1]}
            self.imagery = {}
        elif desc is not None:
            _, name, _, wavelength, bandwidth, interp = desc
            self.name = name
            self.color_interp = interp
            self.metadata = {
                "BANDNAME": name,
                "BANDWIDTH": str(bandwidth),
                "BANDWIDTH_UNIT": "nm",
                "WAVELENGTH": str(wavelength),
                "WAVELENGTH_UNIT": "nm",
            }
            si = product.solar_irradiance.get(name)
            if si is not None:
                self.metadata["SOLAR_IRRADIANCE"] = si
                self.metadata["SOLAR_IRRADIANCE_UNIT"] = "W/m2/um"
            self.imagery = {
                "CENTRAL_WAVELENGTH_UM": "%.3f" % (wavelength / 1000.0),
                "FWHM_UM": "%.3f" % (bandwidth / 1000.0),
            }
        else:
            self.name = code
            self.color_interp = "Undefined"
            self.metadata = {"BANDNAME": code}
            self.imagery = {}


class Sentinel2SubDataset:
    """One SENTINEL2_LxX:<xml>:<res>:<epsg> mosaic."""

    def __init__(self, product, res_spec, epsg, alpha=False):
        self.product = product
        self.is_preview = res_spec in ("PREVIEW", "TCI")
        if self.is_preview:
            if (res_spec == "TCI") != product.is_compact:
                raise ValueError(f"invalid subdataset {res_spec}")
            self.resolution = 320 if res_spec == "PREVIEW" else \
                min(product.res_bands)
        else:
            m = re.match(r"^(\d+)m$", res_spec)
            if not m:
                raise ValueError(f"bad resolution spec {res_spec!r}")
            self.resolution = int(m.group(1))
            if self.resolution not in product.res_bands:
                raise ValueError(f"no bands at {res_spec}")
        if epsg not in product.epsg_codes:
            raise ValueError(f"no granule with EPSG:{epsg}")
        self.epsg = epsg
        self.metadata = product._product_metadata(with_footprint=False)

        grans = [g for g in product.granules if g.epsg == epsg]
        res = self.resolution
        step = float(res)
        # extent is in metres, so any resolution's grid yields the same
        # union (g.extent falls back for PREVIEW's synthetic 320m)
        exts = [g.extent(res) for g in grans]
        minx = min(e[0] for e in exts)
        maxy = max(e[1] for e in exts)
        maxx = max(e[2] for e in exts)
        miny = min(e[3] for e in exts)
        self.width = int(round((maxx - minx) / step))
        self.height = int(round((maxy - miny) / step))
        self.geotransform = (minx, step, 0.0, maxy, 0.0, -step)

        # band list
        if self.is_preview:
            codes = ["04", "03", "02"]
            self.bands = [_Band(c, product, byte=True) for c in codes]
        else:
            codes = _order_bands(product.res_bands[res])
            self.bands = [_Band(c, product) for c in codes]
        self.alpha = bool(alpha)
        if alpha:
            b = _Band("ALPHA", product, byte=False)
            b.color_interp = "Alpha"
            b.metadata = {}
            self.bands.append(b)

        # per-band tile placements (the VRT SimpleSource layout)
        self.sources = []       # (band_index1, file, src_rect, dst_rect)
        for bi, band in enumerate(self.bands, start=1):
            if band.color_interp == "Alpha":
                continue
            for g in grans:
                if self.is_preview:
                    f = g.preview
                    if f is None:
                        continue
                    e = g.extent(min(g.geocoding))
                    w = int(round((e[2] - e[0]) / step))
                    h = int(round((e[1] - e[3]) / step))
                else:
                    f = g.images.get(band.code)
                    if f is None:
                        continue
                    gg = g.geocoding.get(res)
                    if gg is None:
                        continue
                    e = g.extent(res)
                    nrows, ncols = gg[0], gg[1]
                    w, h = ncols, nrows
                xoff = int(round((e[0] - minx) / step))
                yoff = int(round((maxy - e[1]) / step))
                self.sources.append(
                    (bi, f, (0, 0, w, h), (xoff, yoff, w, h)))

    @property
    def band_count(self):
        return len(self.bands)

    @property
    def file_list(self):
        out = [self.product.path]
        grans = [g for g in self.product.granules if g.epsg == self.epsg]
        out.extend(g.mtd_path for g in grans)
        seen = []
        for _, f, _, _ in self.sources:
            if f not in seen:
                seen.append(f)
        out.extend(seen)
        return out

    def placement_vrt(self) -> str:
        """The SimpleSource XML fragment the reference emits for band 1
        (used as a golden against the autotest expectations)."""
        parts = []
        for bi, f, src, dst in self.sources:
            if bi != 1:
                continue
            parts.append(
                "<SimpleSource>\n"
                '      <SourceFilename relativeToVRT="0">%s'
                "</SourceFilename>\n"
                "      <SourceBand>1</SourceBand>\n"
                '      <SrcRect xOff="%d" yOff="%d" xSize="%d" ySize="%d"'
                " />\n"
                '      <DstRect xOff="%d" yOff="%d" xSize="%d" ySize="%d"'
                " />\n"
                "    </SimpleSource>" % ((f,) + src + dst))
        return "\n    ".join(parts)


def sentinel2_open(path, alpha=False):
    """Open a product MTD XML -> Sentinel2Product, or a
    ``SENTINEL2_L1C:<xml>:<res>:EPSG_<code>`` subdataset name ->
    Sentinel2SubDataset."""
    m = re.match(r"^SENTINEL2_(L1B|L1C|L2A):(.*)$", path)
    if m:
        level, rest = m.group(1), m.group(2)
        m2 = re.match(r"^(.+):(\d+m|PREVIEW|TCI):EPSG_(\d+)$", rest)
        if not m2:
            raise ValueError(f"malformed subdataset name {path!r}")
        xml_path, res_spec, epsg = m2.group(1), m2.group(2), \
            int(m2.group(3))
        if not os.path.exists(xml_path):
            raise ValueError(f"no such file {xml_path}")
        prod = Sentinel2Product(xml_path)
        if prod.level != level:
            raise ValueError(
                f"product level {prod.level} != requested {level}")
        return prod.open_subdataset(res_spec, epsg, alpha=alpha)
    return Sentinel2Product(path)
