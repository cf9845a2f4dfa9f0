"""Arc/Info E00 interchange (AVCE00) driver
(ogr/ogrsf_frmts/avc + avc_e00read.c semantics — re-derived).

Facts:
  - sections: EXP header, ARC (id, UserID, fnode, tnode, lpoly, rpoly,
    npts + coordinate pairs two per line, -1 terminator), LAB (id,
    polyid, x, y + box line), CNT, PAL (narcs + bbox line, then
    (arcid, fnode, adjpoly) triplets two per line; the first record is
    the universe polygon and is not a feature), PRJ, TOL, IFO
  - IFO tables: header (name, flags, nfields x2, record length,
    record count), field definitions (16-char name, size, offset,
    output width.dec, type code 20 char / 30 fixed int / 40 single /
    50 binary int / 60 binary float), records printed fixed-width
    (type 60: 14 chars for 4-byte, 24 for 8-byte; type 50: 11 chars
    for 4-byte, 6 for 2-byte; char types: their size), wrapped at
    80 columns
  - layers join their attribute table (.PAT for LAB/PAL by polygon
    index incl. the universe polygon, .AAT for ARC by arc index)
  - compressed E00 (partial/full) is rejected like the reference
"""

from __future__ import annotations

import re

__all__ = ["e00_read", "read_avce00"]


def _floats(line: str) -> list[float]:
    return [float(t) for t in line.split()]


def _print_width(ftype: int, size: int) -> int:
    if ftype == 60:
        return 24 if size == 8 else 14
    if ftype == 50:
        return 6 if size == 2 else 11
    if ftype == 40:
        return 14
    if ftype == 30:
        return size
    return size  # 20 = char


def _parse_ifo(lines: list[str], i: int) -> tuple[dict, int]:
    tables: dict = {}
    n = len(lines)
    while i < n:
        header = lines[i]
        if header.startswith("EOI") or header.startswith("EOS"):
            i += 1
            break
        if len(header) < 30 or header[:1] == " ":
            i += 1
            continue
        name = header[:32].strip().split(" ")[0]
        nums = re.findall(r"-?\d+", header[32:])
        if len(nums) < 4:
            i += 1
            continue
        nfields = int(nums[0])
        nrecords = int(nums[-1])
        i += 1
        fields = []
        for _ in range(nfields):
            fl = lines[i]
            fname = fl[:16].strip()
            toks = re.findall(r"-?\d+", fl[16:])
            size = int(toks[0])
            ftype = int(toks[6]) if len(toks) > 6 else 20
            fields.append((fname, size, ftype))
            i += 1
        widths = [_print_width(t, s) for _, s, t in fields]
        total = sum(widths)
        lines_per_rec = (total + 79) // 80
        records = []
        for _ in range(nrecords):
            buf = ""
            for _ in range(lines_per_rec):
                buf += lines[i].ljust(80)
                i += 1
            rec = {}
            pos = 0
            for (fname, size, ftype), w in zip(fields, widths):
                raw = buf[pos:pos + w]
                pos += w
                if ftype in (50, 30):
                    try:
                        rec[fname] = int(raw)
                    except ValueError:
                        rec[fname] = None
                elif ftype in (60, 40):
                    try:
                        rec[fname] = float(raw)
                    except ValueError:
                        rec[fname] = None
                else:
                    rec[fname] = raw.strip()
            records.append(rec)
        tables[name] = {"fields": [f[0] for f in fields],
                        "records": records}
    return tables, i


def assemble_layers(arcs, labs, pals, cnts, tables) -> dict:
    """Shared E00/AVCBin feature assembly (both coverages carry the
    same ARC/LAB/PAL/CNT model; the binary twin in sources/avcbin.py
    reuses this)."""
    arc_by_id = {a["id"]: a for a in arcs}

    def table_for(suffix: str):
        for name, t in tables.items():
            if name.upper().endswith(suffix):
                return t
        return None

    layers: dict = {}
    if arcs:
        aat = table_for(".AAT")
        feats = []
        for idx, a in enumerate(arcs):
            f = {"UserID": str(a["UserID"]),
                 "FNODE": a["FNODE"], "TNODE": a["TNODE"],
                 "LPOLY": a["LPOLY"], "RPOLY": a["RPOLY"],
                 "wkt": "LINESTRING (%s)" % ",".join(
                     "%.10g %.10g" % p for p in a["pts"])}
            if aat and idx < len(aat["records"]):
                f.update(aat["records"][idx])
            feats.append(f)
        layers["ARC"] = feats
    if labs:
        pat = table_for(".PAT") if not pals else None
        feats = []
        for idx, lab in enumerate(labs):
            f = {"ValueId": lab["ValueId"], "PolyId": lab["PolyId"],
                 "wkt": "POINT (%.10g %.10g)" % (lab["x"], lab["y"])}
            if pat and idx < len(pat["records"]):
                f.update(pat["records"][idx])
            feats.append(f)
        layers["LAB"] = feats
    if pals:
        pat = table_for(".PAT")
        feats = []
        for idx, pal in enumerate(pals):
            if idx == 0:
                continue  # universe polygon
            pts: list[tuple] = []
            for arcid, _, _ in pal["arcs"]:
                arc = arc_by_id.get(abs(arcid))
                if arc is None:
                    continue
                seg = arc["pts"] if arcid > 0 else arc["pts"][::-1]
                pts.extend(seg[1:] if pts and pts[-1] == seg[0] else seg)
            f = {"ArcIds": [a for a, _, _ in pal["arcs"]]}
            if pts:
                if pts[0] != pts[-1]:
                    pts.append(pts[0])
                f["wkt"] = "POLYGON ((%s))" % ",".join(
                    "%.10g %.10g" % p for p in pts)
            # PAT record idx+1 skips the universe polygon's row 1
            if pat and idx + 1 <= len(pat["records"]):
                f.update(pat["records"][idx])
            feats.append(f)
        layers["PAL"] = feats
    if cnts:
        layers["CNT"] = [
            dict(c, wkt="POINT (%.10g %.10g)" % (c["x"], c["y"]))
            for c in cnts]
    return layers


def e00_read(data: bytes | str) -> dict:
    text = data.decode("latin-1") if isinstance(data, bytes) else data
    lines = text.splitlines()
    if not lines or not lines[0].startswith("EXP"):
        raise ValueError("not an E00 file")
    if lines[0].split()[1] not in ("0",):
        raise ValueError("compressed E00 is not supported")

    arcs: list[dict] = []
    labs: list[dict] = []
    pals: list[dict] = []
    cnts: list[dict] = []
    prj: list[str] = []
    tables: dict = {}

    i = 1
    n = len(lines)
    while i < n:
        line = lines[i]
        tag = line[:3]
        if tag == "ARC":
            i += 1
            while i < n:
                hdr = [int(t) for t in lines[i].split()[:7]]
                i += 1
                if hdr[0] == -1:
                    break
                npts = hdr[6]
                pts = []
                while len(pts) < npts:
                    vals = _floats(lines[i])
                    i += 1
                    for j in range(0, len(vals) - 1, 2):
                        pts.append((vals[j], vals[j + 1]))
                arcs.append({"id": hdr[0], "UserID": hdr[1],
                             "FNODE": hdr[2], "TNODE": hdr[3],
                             "LPOLY": hdr[4], "RPOLY": hdr[5],
                             "pts": pts[:npts]})
        elif tag == "LAB":
            i += 1
            while i < n:
                toks = lines[i].split()
                i += 1
                if int(toks[0]) == -1:
                    break
                labs.append({"ValueId": int(toks[0]),
                             "PolyId": int(toks[1]),
                             "x": float(toks[2]), "y": float(toks[3])})
                i += 1  # box line
        elif tag == "CNT":
            i += 1
            while i < n:
                toks = lines[i].split()
                i += 1
                if int(toks[0]) == -1:
                    break
                nlabels = int(toks[0])
                cnts.append({"x": float(toks[1]), "y": float(toks[2]),
                             "nlabels": nlabels})
                # label ids follow, 8 per line
                seen = 0
                while seen < nlabels:
                    seen += len(lines[i].split())
                    i += 1
        elif tag == "PAL":
            i += 1
            while i < n:
                toks = lines[i].split()
                i += 1
                narcs = int(toks[0])
                if narcs == -1:
                    break
                trip = []
                while len(trip) < narcs * 3:
                    trip.extend(int(t) for t in lines[i].split())
                    i += 1
                pals.append({
                    "narcs": narcs,
                    "arcs": [(trip[k], trip[k + 1], trip[k + 2])
                             for k in range(0, narcs * 3, 3)],
                })
        elif tag == "PRJ":
            i += 1
            while i < n and not lines[i].startswith("EOP"):
                prj.append(lines[i])
                i += 1
        elif tag == "IFO":
            tables, i = _parse_ifo(lines, i + 1)
        else:
            i += 1

    layers = assemble_layers(arcs, labs, pals, cnts, tables)
    return {"layers": layers, "prj": "\n".join(prj), "tables": tables}


def read_avce00(spark, path: str):
    with open(path, "rb") as fh:
        cov = e00_read(fh.read())
    rows = []
    for name, feats in cov["layers"].items():
        for f in feats:
            rows.append((name, f.get("wkt"),
                         {k: (",".join(str(x) for x in v)
                              if isinstance(v, list) else str(v))
                          for k, v in f.items()
                          if k != "wkt" and v is not None}))
    return spark.createDataFrame(
        rows, "layer string, wkt string, fields map<string,string>")
