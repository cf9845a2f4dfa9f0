"""MRF (Meta Raster Format) reader.

Re-expresses the reference's frmts/mrf driver (marfa_dataset.cpp,
mrf_band.cpp) read path: a dataset is three files —

  * .mrf  — XML metadata: <Raster><Size x y c>, <PageSize>,
    <Compression>, optional <DataValues NoData=...>, <GeoTags>
    (BoundingBox + Projection), <Rsets> for overviews
  * .idx  — the tile index: one 16-byte BIG-ENDIAN record per page,
    (uint64 offset, uint64 size) into the data file, pages row-major
    x-then-y (then band for BAND interleave, then overview levels);
    an all-zero record is an empty page (fill with NoData)
  * data  — pages back to back, extension keyed by compression
    (mrf_util.cpp): .til NONE, .ppg PNG, .pjg JPEG, .pzp DEFLATE,
    .lrc LERC, .ptf TIF

Each page decodes independently through the engine's codec registry
(PNG/JPEG/TIFF decoders, zlib, LERC v1+v2 from raster/lerc.py) — at
scale one Spark task per page, the same shape as the COG tile scan.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np

__all__ = ["mrf_parse_meta", "mrf_read", "MRF_DATA_EXT"]

MRF_DATA_EXT = {
    "NONE": ".til", "PNG": ".ppg", "PPNG": ".ppg", "JPEG": ".pjg",
    "DEFLATE": ".pzp", "LERC": ".lrc", "TIF": ".ptf", "ZSTD": ".pzs",
    "QB3": ".pq3",
}

_DTYPES = {
    "Byte": np.uint8, "UInt8": np.uint8, "Int8": np.int8,
    "Int16": np.int16, "UInt16": np.uint16, "Int32": np.int32,
    "UInt32": np.uint32, "Float32": np.float32, "Float64": np.float64,
    "Int64": np.int64, "UInt64": np.uint64,
}


def _attr(tag: str, name: str, default=None):
    m = re.search(rf'{name}="([^"]*)"', tag)
    return m.group(1) if m else default


def mrf_parse_meta(xml: bytes | str) -> dict:
    txt = xml.decode() if isinstance(xml, (bytes, bytearray)) else xml
    if "<MRF_META" not in txt:
        raise ValueError("not an MRF metadata file")
    size_m = re.search(r"<Size\s+([^/>]*)/?>", txt)
    page_m = re.search(r"<PageSize\s+([^/>]*)/?>", txt)
    if not size_m:
        raise ValueError("MRF: missing <Size>")
    meta = {
        "w": int(_attr(size_m.group(1), "x")),
        "h": int(_attr(size_m.group(1), "y")),
        "bands": int(_attr(size_m.group(1), "c", "1")),
        "page_w": 512, "page_h": 512, "page_c": 1,
        "compression": "PNG", "dtype": np.uint8, "nodata": None,  # PNG is the MRF default (mrf_util.cpp)
        "interleave": "BAND",
    }
    if page_m:
        meta["page_w"] = int(_attr(page_m.group(1), "x", "512"))
        meta["page_h"] = int(_attr(page_m.group(1), "y", "512"))
        meta["page_c"] = int(_attr(page_m.group(1), "c", "1"))
    cm = re.search(r"<Compression>([^<]*)</Compression>", txt)
    if cm:
        meta["compression"] = cm.group(1).strip().upper()
    dm = re.search(r"<DataType>([^<]*)</DataType>", txt)
    if dm:
        meta["dtype"] = _DTYPES[dm.group(1).strip()]
    nd = re.search(r'<DataValues[^>]*NoData="([^"]*)"', txt)
    if nd:
        meta["nodata"] = float(nd.group(1))
    bb = re.search(r"<BoundingBox\s+([^/>]*)/?>", txt)
    if bb:
        meta["bbox"] = tuple(
            float(_attr(bb.group(1), k)) for k in ("minx", "miny", "maxx", "maxy")
        )
    pj = re.search(r"<Projection>([^<]*)</Projection>", txt)
    if pj:
        meta["projection"] = pj.group(1)
    return meta


def _decode_page(raw: bytes, meta: dict) -> np.ndarray:
    comp = meta["compression"]
    pw, ph, pc = meta["page_w"], meta["page_h"], meta["page_c"]
    dt = meta["dtype"]
    if comp == "NONE":
        arr = np.frombuffer(raw, dtype=dt, count=ph * pw * pc)
        return arr.reshape(ph, pw) if pc == 1 else arr.reshape(ph, pw, pc)
    if comp == "DEFLATE":
        arr = np.frombuffer(zlib.decompress(raw), dtype=dt)
        return arr.reshape(ph, pw) if pc == 1 else arr.reshape(ph, pw, pc)
    if comp == "LERC":
        from gdal_spark.raster.lerc import lerc_strip_decode

        arr, mask, _ = lerc_strip_decode(raw)
        if arr.dtype != dt:
            if np.issubdtype(dt, np.integer) and arr.dtype.kind == "f":
                arr = np.rint(arr).astype(dt)  # LERC1 stores quantized floats
            else:
                arr = arr.astype(dt)
        if meta["nodata"] is not None and not mask.all():
            arr = arr.copy()
            arr[~mask] = dt(meta["nodata"])
        return arr
    if comp in ("PNG", "PPNG"):
        from gdal_spark.functions.codecs import png_decode

        return png_decode(raw)
    if comp == "JPEG":
        from gdal_spark.functions.jpeg import jpeg_decode

        arr = jpeg_decode(raw)
        if pc == 1 and arr.ndim == 3:
            arr = arr[:, :, 0]  # grayscale page decoded via the RGB path
        return arr
    if comp == "TIF":
        from gdal_spark.functions.tiff import tiff_decode

        arr = tiff_decode(raw)
        return arr[0] if isinstance(arr, tuple) else arr
    raise ValueError(f"MRF: no decoder for compression {comp} here")


def mrf_read(mrf_path: str) -> tuple[np.ndarray, dict]:
    """Read the base level of an MRF dataset -> (array, meta)."""
    xml = open(mrf_path, "rb").read()
    meta = mrf_parse_meta(xml)
    stem = mrf_path[:-4] if mrf_path.endswith(".mrf") else mrf_path
    idx = open(stem + ".idx", "rb").read()
    ext = MRF_DATA_EXT.get(meta["compression"])
    if ext is None:
        raise ValueError(f"MRF: unknown compression {meta['compression']}")
    data = open(stem + ext, "rb").read()

    w, h, bands = meta["w"], meta["h"], meta["bands"]
    pw, ph, pc = meta["page_w"], meta["page_h"], meta["page_c"]
    tx = (w + pw - 1) // pw
    ty = (h + ph - 1) // ph
    n_bands_pages = 1 if pc == bands else bands
    dt = meta["dtype"]
    fill = meta["nodata"] if meta["nodata"] is not None else 0
    if bands == 1 or pc == bands:
        out = np.full((h, w) if bands == 1 else (h, w, bands), fill, dtype=dt)
    else:
        out = np.full((h, w, bands), fill, dtype=dt)

    rec = 0
    for b in range(n_bands_pages):
        for iy in range(ty):
            for ix in range(tx):
                off, size = struct.unpack_from(">QQ", idx, 16 * rec)
                rec += 1
                if size == 0:
                    continue
                page = _decode_page(data[off : off + size], meta)
                page2 = np.squeeze(page)
                y0, x0 = iy * ph, ix * pw
                hh = min(ph, h - y0)
                ww = min(pw, w - x0)
                if bands == 1:
                    out[y0 : y0 + hh, x0 : x0 + ww] = page2[:hh, :ww]
                elif pc == bands:  # pixel interleave: page carries all bands
                    out[y0 : y0 + hh, x0 : x0 + ww, :] = page2[:hh, :ww, :]
                else:  # band interleave: one page per band
                    out[y0 : y0 + hh, x0 : x0 + ww, b] = page2[:hh, :ww]
    return out, meta
