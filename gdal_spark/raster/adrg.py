"""ADRG (ARC Digitized Raster Graphics) driver
(frmts/adrg/adrgdataset.cpp, on the engine's ISO8211 reader).

Format facts transcribed (decode re-derived):
  GEN records        RTY 'GIN' records carry DSI (NAM), GEN (SCA/ZNA/
                     ARV/BRV/LSO/PSO) and SPR (NFL/NFC/PNC=PNL=128,
                     BAD = IMG file name, TIF tile-index flag, TIM)
  lat/lon strings    +dddmmss.ss / +ddmmss.ss  :332-368
  geotransform       ZNA 9/18 polar arc-system formula with
                     111319.4907933 m/deg and 40075016.68558/ARV pixel
                     size; else (LSO, 360/ARV, PSO, -360/BRV)  :762-816
  IMG data offset    skip the ISO8211 header up to the 'IMG' field data
  tiles              128x128, band-sequential within each tile; TIM
                     tile index (0 = empty tile)  :150-195
"""

from __future__ import annotations

import math

import numpy as np

from gdal_spark.sources.iso8211 import parse_ddf

__all__ = ["adrg_datasets", "adrg_decode", "adrg_thf_gens"]


def _lon_from_string(s: str) -> float:
    sign = 1 if s[0] == "+" else -1
    return sign * (float(s[1:4]) + float(s[4:6]) / 60
                   + float(s[6:11]) / 3600)


def _lat_from_string(s: str) -> float:
    sign = 1 if s[0] == "+" else -1
    return sign * (float(s[1:3]) + float(s[3:5]) / 60
                   + float(s[5:10]) / 3600)


def _img_data_offset(img: bytes) -> int:
    """Skip the IMG file's ISO8211 header: find FT + 'IMG' tag, then
    skip 4+3 bytes and any padding spaces (:700-735)."""
    i = 0
    n = len(img)
    while i < n:
        if img[i] == 0x1E and img[i + 1:i + 4] == b"IMG":
            j = i + 4 + 3 + 3  # FT consumed separately in the reference
            # reference: offset += 3 (tag) + 4, skip 3, then pad spaces
            j = i + 1 + 3 + 4 + 3
            while j < n and img[j] == 0x20:
                j += 1
            return j + 1
        i += 1
    raise ValueError("no IMG field in ADRG .IMG file")


def adrg_datasets(gen: bytes) -> list[dict]:
    """-> one dict per GIN record: NAM, SCA, ZNA, gt, NFL/NFC, BAD,
    tile_index (or None)."""
    mod = parse_ddf(gen)
    out = []
    for rec in mod.records:
        rty = (rec.get("001") or {}).get("RTY") if \
            isinstance(rec.get("001"), dict) else None
        if rty != "GIN" or "GEN" not in rec or "SPR" not in rec:
            continue
        g = rec["GEN"]
        spr = rec["SPR"]
        if spr.get("PNC") != 128 or spr.get("PNL") != 128:
            continue
        arv = g["ARV"]
        brv = g.get("BRV", 0)
        lso = _lon_from_string(g["LSO"])
        pso = _lat_from_string(g["PSO"])
        zna = g.get("ZNA", 1)
        if zna == 9:  # north polar arc system
            gt = (111319.4907933 * (90.0 - pso) * math.sin(
                lso * math.pi / 180.0), 40075016.68558 / arv, 0.0,
                -111319.4907933 * (90.0 - pso) * math.cos(
                    lso * math.pi / 180.0), 0.0, -40075016.68558 / arv)
        elif zna == 18:  # south polar
            gt = (111319.4907933 * (90.0 + pso) * math.sin(
                lso * math.pi / 180.0), 40075016.68558 / arv, 0.0,
                111319.4907933 * (90.0 + pso) * math.cos(
                    lso * math.pi / 180.0), 0.0, -40075016.68558 / arv)
        else:
            gt = (lso, 360.0 / arv, 0.0, pso, 0.0, -360.0 / brv)
        tile_index = None
        if str(spr.get("TIF", "")).startswith("Y") and "TIM" in rec:
            tim = rec["TIM"]
            rows = tim if isinstance(tim, list) else [tim]
            tile_index = []
            for row in rows:
                for item in (row if isinstance(row, list) else [row]):
                    if isinstance(item, dict) and "TSI" in item:
                        tile_index.append(int(item["TSI"] or 0))
        bad = str(spr.get("BAD", "")).split(" ")[0]
        out.append({
            "nam": (rec.get("DSI") or {}).get("NAM", ""),
            "sca": g.get("SCA"), "zna": zna, "gt": gt,
            "nfl": spr["NFL"], "nfc": spr["NFC"], "bad": bad,
            "tile_index": tile_index,
        })
    return out


def adrg_decode(gen: bytes, img: bytes, nam: str | None = None
                ) -> tuple[np.ndarray, dict]:
    """-> (HxWx3 uint8 RGB, meta). ``nam`` selects a subdataset when
    the GEN carries several image records."""
    dsets = adrg_datasets(gen)
    if not dsets:
        raise ValueError("no GIN image record in ADRG .GEN")
    ds = dsets[0]
    if nam is not None:
        for cand in dsets:
            if cand["nam"] == nam or cand["bad"].startswith(nam):
                ds = cand
                break
    off = _img_data_offset(img)
    nfl, nfc = ds["nfl"], ds["nfc"]
    arr = np.zeros((nfl * 128, nfc * 128, 3), np.uint8)
    for by in range(nfl):
        for bx in range(nfc):
            block = by * nfc + bx
            if ds["tile_index"] is not None:
                tsi = ds["tile_index"][block] \
                    if block < len(ds["tile_index"]) else 0
                if tsi <= 0:
                    continue
                base = off + (tsi - 1) * 128 * 128 * 3
            else:
                base = off + block * 128 * 128 * 3
            for b in range(3):
                start = base + b * 128 * 128
                tile = np.frombuffer(img, np.uint8, 128 * 128, start)
                arr[by * 128:(by + 1) * 128,
                    bx * 128:(bx + 1) * 128, b] = tile.reshape(128, 128)
    meta = {"gt": ds["gt"], "nodata": 0.0,
            "metadata": {"ADRG_SCA": str(ds["sca"]),
                         "ADRG_ZNA": str(ds["zna"]),
                         "ADRG_NAM": ds["nam"]}}
    if ds["zna"] in (9, 18):
        meta["projection"] = "ARC_System_Zone_%02d" % ds["zna"]
    return arr, meta


def adrg_thf_gens(thf: bytes) -> list[str]:
    """Transmittal header: collect the referenced .GEN file names."""
    mod = parse_ddf(thf)
    names = []

    def scan(v):
        if isinstance(v, str):
            for tok in v.replace("\x1f", " ").split():
                t = tok.strip().rstrip("\x1e")
                if t.upper().endswith(".GEN") and t not in names:
                    names.append(t)
        elif isinstance(v, dict):
            for x in v.values():
                scan(x)
        elif isinstance(v, list):
            for x in v:
                scan(x)

    for rec in mod.records:
        for tag, v in rec.items():
            if tag != "__raw__":
                scan(v)
    # fall back to a raw scan (THF VFF fields are plain text)
    if not names:
        import re
        for m in re.finditer(rb"[A-Z0-9]{8}\.GEN", thf):
            t = m.group(0).decode()
            if t not in names:
                names.append(t)
    # SRP transmittals carry dataset names in FDR.NAM instead of file
    # names: derive <NAM>01.GEN (s57filecollector-style)
    if not names:
        for rec in mod.records:
            fdr = rec.get("FDR")
            if isinstance(fdr, dict) and fdr.get("NAM"):
                names.append(str(fdr["NAM"]).strip() + "01.GEN")
    return names
