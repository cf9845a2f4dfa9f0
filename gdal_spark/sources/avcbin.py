"""Arc/Info binary coverage (AVCBin) reader
(ogr/ogrsf_frmts/avc/avc_bin.cpp — re-derived, no code copied),
the binary twin of the E00 reader in sources/avce00.py.

A V7 coverage is a directory of big-endian .adf files plus a shared
../info/ database:

  geometry files (arc.adf, lab.adf, pal.adf, cnt.adf): 100-byte header
  (signature 9993/9994, precision word — out-of-range means double
  precision — record size, length in 16-bit words at +24), then
  records. ARC: id, record size (words), user id, fnode/tnode,
  lpoly/rpoly, vertex count, x/y floats or doubles. LAB: value id,
  poly id, 3 coordinate pairs. PAL: poly id, record size, MBR,
  arc count, (arc id, fnode, adjacent poly) triplets. CNT: record
  size?, centroid + label ids.
  info/arc.dir: 380-byte entries (32-char table name, 8-char arcNNNN
  info file, numFields/recSize int16s, deleted flag, record count,
  "XX" external marker). arcNNNN.nit holds 160-byte field
  descriptors (name, size, offset, fmt width/prec, type, index);
  arcNNNN.dat holds the records, or — when external — an 80-char
  path to the real data file inside the coverage directory.
  Field types: 10 date / 20 char / 30 fixint / 40 fixnum (ASCII),
  50 binary int (2/4), 60 binary float (4/8).

Feature assembly (layers ARC/LAB/PAL/CNT with .AAT/.PAT joins and
universe-polygon skipping) is shared with the E00 reader, so both
paths produce identical features for the same coverage.
"""

from __future__ import annotations

import struct

from gdal_spark.sources.avce00 import assemble_layers

__all__ = ["avcbin_read"]


class _R:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def i2(self):
        (v,) = struct.unpack_from(">h", self.data, self.pos)
        self.pos += 2
        return v

    def i4(self):
        (v,) = struct.unpack_from(">i", self.data, self.pos)
        self.pos += 4
        return v

    def f4(self):
        (v,) = struct.unpack_from(">f", self.data, self.pos)
        self.pos += 4
        return v

    def f8(self):
        (v,) = struct.unpack_from(">d", self.data, self.pos)
        self.pos += 8
        return v

    def s(self, n: int) -> str:
        raw = self.data[self.pos:self.pos + n]
        self.pos += n
        return raw.split(b"\x00")[0].decode("latin-1")

    def eof(self) -> bool:
        return self.pos >= len(self.data)


def _geom_header(data: bytes):
    r = _R(data)
    sig = r.i4()
    prec = r.i4()
    r.i4()  # record size
    r.pos += 12
    length = r.i4()
    double = prec < 0 or prec > 1000
    return sig, double, 2 * length, 100


def _read_arcs(data: bytes) -> list[dict]:
    _, dbl, size, pos = _geom_header(data)
    r = _R(data, pos)
    rd = r.f8 if dbl else r.f4
    out = []
    end = min(len(data), max(size, pos))
    while r.pos + 28 <= end:
        arc_id = r.i4()
        rec_words = r.i4()
        start = r.pos
        user = r.i4()
        fnode = r.i4()
        tnode = r.i4()
        lpoly = r.i4()
        rpoly = r.i4()
        nv = r.i4()
        if nv < 0 or r.pos + nv * (16 if dbl else 8) > len(data):
            break
        pts = [(rd(), rd()) for _ in range(nv)]
        out.append({"id": arc_id, "UserID": user, "FNODE": fnode,
                    "TNODE": tnode, "LPOLY": lpoly, "RPOLY": rpoly,
                    "pts": pts})
        r.pos = start + 2 * rec_words
    return out


def _read_labs(data: bytes) -> list[dict]:
    _, dbl, size, pos = _geom_header(data)
    r = _R(data, pos)
    rd = r.f8 if dbl else r.f4
    step = 8 + 6 * (8 if dbl else 4)
    out = []
    end = min(len(data), max(size, pos))
    while r.pos + step <= end:
        value = r.i4()
        poly = r.i4()
        x, y = rd(), rd()
        for _ in range(4):
            rd()
        out.append({"ValueId": value, "PolyId": poly, "x": x, "y": y})
    return out


def _read_pals(data: bytes) -> list[dict]:
    _, dbl, size, pos = _geom_header(data)
    r = _R(data, pos)
    rd = r.f8 if dbl else r.f4
    out = []
    end = min(len(data), max(size, pos))
    while r.pos + 8 <= end:
        r.i4()  # poly id
        rec_words = r.i4()
        start = r.pos
        for _ in range(4):
            rd()  # MBR
        narcs = r.i4()
        if narcs < 0 or r.pos + narcs * 12 > len(data):
            break
        arcs = [(r.i4(), r.i4(), r.i4()) for _ in range(narcs)]
        out.append({"narcs": narcs, "arcs": arcs})
        r.pos = start + 2 * rec_words
    return out


def _read_cnts(data: bytes) -> list[dict]:
    _, dbl, size, pos = _geom_header(data)
    r = _R(data, pos)
    rd = r.f8 if dbl else r.f4
    out = []
    end = min(len(data), max(size, pos))
    while r.pos + 8 <= end:
        r.i4()  # cnt id
        rec_words = r.i4()
        start = r.pos
        x, y = rd(), rd()
        nlabels = r.i4()
        if nlabels < 0:
            break
        for _ in range(nlabels):
            r.i4()
        out.append({"x": x, "y": y, "nlabels": nlabels})
        r.pos = start + 2 * rec_words
    return out


def _read_info_tables(files: dict, cover_name: str) -> dict:
    """info/arc.dir -> matching tables with decoded records."""
    dirdata = files.get("info/arc.dir")
    if dirdata is None:
        return {}
    tables: dict = {}
    prefix = cover_name.upper() + "."
    for off in range(0, len(dirdata) - 379, 380):
        r = _R(dirdata, off)
        tname = r.s(32).strip()
        info_file = r.s(8).strip()
        nfields = r.i2()
        rec_size = r.i2()
        r.pos += 18
        r.i2()  # deleted flag
        nrecords = r.i4()
        r.pos += 10
        external = _R(dirdata, off + 32 + 8 + 4 + 18 + 2 + 4 + 10).s(2)
        if not tname.upper().startswith(prefix):
            continue
        info_file = info_file.lower()
        nit = files.get(f"info/{info_file}.nit")
        if nit is None:
            continue
        fields = []
        nr = _R(nit)
        while len(fields) < nfields and nr.pos + 144 <= len(nit):
            fname = nr.s(16).strip()
            fsize = nr.i2()
            nr.i2()          # v2
            nr.i2()          # offset
            nr.i2()          # v4
            nr.i2()          # v5
            fmtw = nr.i2()
            fmtp = nr.i2()
            ftype = nr.i2()
            nr.pos += 10     # nType2 + v10..v13
            nr.s(16)         # alt name
            nr.pos += 56
            index = nr.i2()
            nr.pos += 28
            if index > 0:
                fields.append((fname, ftype, fsize, fmtw, fmtp))
        dat = files.get(f"info/{info_file}.dat")
        if dat is None:
            continue
        if external == "XX":
            path = dat[:80].decode("latin-1").strip().strip("\x00").strip()
            # external path like "../<cover>/pat.adf" or an IGDS path;
            # resolve by basename inside the coverage dir
            base = path.replace("\\", "/").rsplit("/", 1)[-1].lower()
            dat = files.get(f"cover/{base}")
            if dat is None:
                continue
        rows = []
        for rec_i in range(nrecords):
            start = rec_i * rec_size
            if start + rec_size > len(dat):
                break
            rr = _R(dat, start)
            row = {}
            for fname, ftype, fsize, fmtw, fmtp in fields:
                t = ftype * 10
                if t in (10, 20, 30, 40):
                    txt = rr.s(fsize).strip()
                    if t == 30:
                        row[fname] = int(txt or 0)
                    elif t == 40:
                        row[fname] = float(txt or 0)
                    else:
                        row[fname] = txt
                elif t == 50:
                    row[fname] = rr.i4() if fsize == 4 else rr.i2()
                elif t == 60:
                    row[fname] = rr.f4() if fsize == 4 else rr.f8()
                else:
                    rr.pos += fsize
            rows.append(row)
        tables[tname] = {
            "fields": [f[0] for f in fields],
            "records": rows,
        }
    return tables


def avcbin_read(files: dict, cover_name: str) -> dict:
    """files: {'cover/<name>.adf': bytes, 'info/arc.dir': bytes,
    'info/arcNNNN.nit|.dat': bytes}. Returns the same
    {'layers', 'tables', 'prj'} shape as e00_read."""
    files = {k.lower().replace("\\", "/"): v for k, v in files.items()}
    arcs = labs = pals = cnts = None
    arcs = _read_arcs(files["cover/arc.adf"]) \
        if "cover/arc.adf" in files else []
    labs = _read_labs(files["cover/lab.adf"]) \
        if "cover/lab.adf" in files else []
    pals = _read_pals(files["cover/pal.adf"]) \
        if "cover/pal.adf" in files else []
    cnts = _read_cnts(files["cover/cnt.adf"]) \
        if "cover/cnt.adf" in files else []
    tables = _read_info_tables(files, cover_name)
    prj = files.get("cover/prj.adf", b"").decode("latin-1")
    layers = assemble_layers(arcs, labs, pals, cnts, tables)
    return {"layers": layers, "prj": prj, "tables": tables}
