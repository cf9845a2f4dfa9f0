"""ASRP/USRP (Standard/UTM Raster Product) driver
(frmts/adrg/srpdataset.cpp, on the engine's ISO8211 reader).

Format facts transcribed (decode re-derived):
  GEN records        RTY 'GIN': DSI (PRT=ASRP|USRP, NAM), GEN (SCA,
                     ZNA, PSP, ARV/BRV or LOD/LAD, LSO/PSO), SPR
                     (NFL/NFC, PNC=PNL=128, PCB 0/4/8 run-length
                     coding, PVB=8, BAD, TIF + TIM tile index)
  geotransform       USRP: (LSO, LOD, 0, PSO, 0, -LAD) meters in UTM
                     zone ZNA; ASRP: arc-system degrees with the ADRG
                     polar formulas (PSO/LSO in seconds)  :384-440
  tile data          128x128 single band; PCB=0 raw; PCB=8 RLE
                     (count byte + value byte); PCB=4 nibble counts
                     with the half-byte row-alignment rule  :227-305
  .QAL colours       COL field rows (CCD index, NSR/NSG/NSB) and QUV
                     EDN/CDV07/CDV24/QSS metadata  :682-780
"""

from __future__ import annotations

import math

import numpy as np

from gdal_spark.raster.adrg import _img_data_offset
from gdal_spark.sources.iso8211 import parse_ddf

__all__ = ["srp_datasets", "srp_decode", "srp_qal"]


def srp_datasets(gen: bytes) -> list[dict]:
    mod = parse_ddf(gen)
    out = []
    for rec in mod.records:
        rty = (rec.get("001") or {}).get("RTY") \
            if isinstance(rec.get("001"), dict) else None
        if rty != "GIN" or "GEN" not in rec or "SPR" not in rec:
            continue
        g = rec["GEN"]
        spr = rec["SPR"]
        if spr.get("PNC") != 128 or spr.get("PNL") != 128:
            continue
        dsi = rec.get("DSI") or {}
        product = str(dsi.get("PRT", "")).strip()
        zna = g.get("ZNA") or 0
        lso = float(g.get("LSO") or 0.0)
        pso = float(g.get("PSO") or 0.0)
        if product == "USRP":
            gt = (lso, float(g.get("LOD") or 0.0), 0.0,
                  pso, 0.0, -float(g.get("LAD") or 0.0))
        else:  # ASRP (seconds-based arc system)
            arv = g.get("ARV") or 1
            brv = g.get("BRV") or 1
            if zna == 9:
                gt = (111319.4907933 * (90.0 - pso / 3600.0)
                      * math.sin(lso * math.pi / 648000.0),
                      40075016.68558 / arv, 0.0,
                      -111319.4907933 * (90.0 - pso / 3600.0)
                      * math.cos(lso * math.pi / 648000.0),
                      0.0, -40075016.68558 / arv)
            elif zna == 18:
                gt = (111319.4907933 * (90.0 + pso / 3600.0)
                      * math.sin(lso * math.pi / 648000.0),
                      40075016.68558 / arv, 0.0,
                      111319.4907933 * (90.0 + pso / 3600.0)
                      * math.cos(lso * math.pi / 648000.0),
                      0.0, -40075016.68558 / arv)
            else:
                gt = (lso / 3600.0, 360.0 / arv, 0.0,
                      pso / 3600.0, 0.0, -360.0 / brv)
        tile_index = None
        if str(spr.get("TIF", "")).startswith("Y") and "TIM" in rec:
            tim = rec["TIM"]
            rows = tim if isinstance(tim, list) else [tim]
            tile_index = []
            for row in rows:
                for item in (row if isinstance(row, list) else [row]):
                    if isinstance(item, dict) and "TSI" in item:
                        tile_index.append(int(item["TSI"] or 0))
        out.append({
            "product": product, "nam": dsi.get("NAM", ""), "gt": gt,
            "sca": g.get("SCA"), "zna": zna, "psp": g.get("PSP"),
            "nfl": spr["NFL"], "nfc": spr["NFC"],
            "pcb": spr.get("PCB", 0), "pvb": spr.get("PVB", 8),
            "bad": str(spr.get("BAD", "")).split(" ")[0],
            "tile_index": tile_index,
        })
    return out


def _decode_rle(buf: bytes, pcb: int) -> np.ndarray:
    out = np.zeros(128 * 128, np.uint8)
    i_src = 0
    i_pixel = 0
    half_used = False
    n = len(buf)
    while i_pixel < 128 * 128 and i_src + 2 <= n:
        if pcb == 8:
            count = buf[i_src]
            value = buf[i_src + 1]
            i_src += 2
        else:  # pcb == 4
            if (i_pixel % 128) == 0 and half_used:
                i_src += 1
                half_used = False
                continue
            if half_used:
                count = buf[i_src] & 0xF
                value = buf[i_src + 1]
                i_src += 2
                half_used = False
            else:
                count = buf[i_src] >> 4
                value = ((buf[i_src] & 0xF) << 4) + (buf[i_src + 1] >> 4)
                half_used = True
                i_src += 1
        if i_pixel + count > 128 * 128:
            raise ValueError("SRP RLE overrun")
        out[i_pixel:i_pixel + count] = value
        i_pixel += count
    return out.reshape(128, 128)


def srp_decode(gen: bytes, img: bytes, qal: bytes | None = None,
               nam: str | None = None) -> tuple[np.ndarray, dict]:
    dsets = srp_datasets(gen)
    if not dsets:
        raise ValueError("no GIN record in SRP .GEN")
    ds = dsets[0]
    if nam is not None:
        for cand in dsets:
            if cand["nam"] == nam or cand["bad"].startswith(nam):
                ds = cand
                break
    off = _img_data_offset(img)
    nfl, nfc = ds["nfl"], ds["nfc"]
    pcb = ds["pcb"]
    arr = np.zeros((nfl * 128, nfc * 128), np.uint8)
    for by in range(nfl):
        for bx in range(nfc):
            block = by * nfc + bx
            if ds["tile_index"] is not None:
                tsi = ds["tile_index"][block] \
                    if block < len(ds["tile_index"]) else 0
                if tsi <= 0:
                    continue
                base = off + (tsi - 1) * (128 * 128 if pcb == 0 else 1)
            else:
                base = off + block * 128 * 128
            if pcb == 0:
                tile = np.frombuffer(img, np.uint8, 128 * 128,
                                     base).reshape(128, 128)
            else:
                tile = _decode_rle(img[base:base + 128 * 128 * 2], pcb)
            arr[by * 128:(by + 1) * 128, bx * 128:(bx + 1) * 128] = tile
    meta: dict = {"gt": ds["gt"], "metadata": {
        "SRP_NAM": str(ds["nam"]), "SRP_PRODUCT": ds["product"],
        "SRP_SCA": str(ds["sca"]), "SRP_ZNA": str(ds["zna"]),
        "SRP_PSP": "%.1f" % float(ds["psp"] or 0.0),
    }}
    if ds["product"] == "USRP" and ds["zna"]:
        meta["epsg"] = (32600 if ds["zna"] > 0 else 32700) + abs(ds["zna"])
    if qal is not None:
        ct, qmd = srp_qal(qal)
        if ct:
            meta["color_table"] = ct
        meta["metadata"].update(qmd)
    return arr, meta


def srp_qal(qal: bytes) -> tuple[list[tuple], dict]:
    """.QAL companion: colour table rows + QUV quality metadata."""
    mod = parse_ddf(qal)
    colors: dict[int, tuple] = {}
    md: dict = {}
    for rec in mod.records:
        col = rec.get("COL")
        if col is not None:
            rows = col if isinstance(col, list) else [col]
            for row in rows:
                for item in (row if isinstance(row, list) else [row]):
                    if isinstance(item, dict) and "CCD" in item:
                        colors[int(item["CCD"])] = (
                            int(item.get("NSR") or 0),
                            int(item.get("NSG") or 0),
                            int(item.get("NSB") or 0), 255)
        quv = rec.get("QUV")
        if isinstance(quv, dict):
            if quv.get("EDN") is not None:
                # GetIntSubfield semantics: blank or junk renders as 0
                try:
                    md["SRP_EDN"] = str(int(str(quv["EDN"]).strip()))
                except ValueError:
                    md["SRP_EDN"] = "0"
            for src, dst in (("CDV07", "SRP_CREATIONDATE"),
                             ("DAT1", "SRP_CREATIONDATE"),
                             ("CDV24", "SRP_REVISIONDATE"),
                             ("DAT2", "SRP_REVISIONDATE")):
                v = quv.get(src)
                if v and dst not in md:
                    v = str(v).strip()
                    if src.startswith("DAT") and len(v) >= 12:
                        v = v[4:12]
                    md[dst] = v
        qsr = rec.get("QSR")
        if isinstance(qsr, dict) and qsr.get("QSS"):
            md["SRP_CLASSIFICATION"] = str(qsr["QSS"]).strip()
    ct = [colors.get(i, (0, 0, 0, 255)) for i in
          range(max(colors) + 1)] if colors else []
    return ct, md
