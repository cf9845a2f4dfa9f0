"""HDF4 (Hierarchical Data Format v4) reader + minimal SD writer
(frmts/hdf4 in the reference delegates to libdf; this is a pure-numpy
re-derivation of the public on-disk format: the HDF 4.2 specification
DD/tag model and the netCDF-on-HDF4 SD conventions).

On-disk facts:
  magic 0x0e031301; DD blocks of (ndds u2, next u4) headers followed
  by 12-byte DDs (tag u2, ref u2, offset u4, length u4); tag 1 =
  DFTAG_NULL placeholders.
  DFTAG_NT (106): version/type/width/class bytes; type codes 3/4 char,
  5 float32, 6 float64, 20..27 (u)int8/16/32/64.
  DFTAG_SDD (701): rank u2, rank dims u4, (tag,ref) of the data NT,
  rank (tag,ref) scale NTs.
  DFTAG_SD (702): big-endian array payload.
  DFTAG_NDG (720): (tag,ref) pair list tying NT/SDD/SD together.
  DFTAG_VH (1962): interlace u2, nvert u4, ivsize u2, nfields u2,
  field types/isizes/offsets/orders arrays, length-prefixed field
  names, then name/class strings + extag/exref/version.
  DFTAG_VS (1963): packed vdata records described by the VH.
  DFTAG_VG (1965): nelt u2, tag list, ref list, name/class strings.
  Special elements: a DD whose tag has the 0x4000 bit points at a
  special header (u2 special kind: 1 linked, 2 ext, 4 comp); comp
  headers carry (version u2? — layout: u2 kind, u4 uncompressed
  length, u2 link/ref... ) — only COMP with deflate (coder 4) and
  RLE (coder 1) is handled here.

The netCDF flavor (what GDAL's HDF4 SD driver surfaces): variable
Vgroups of class "Var0.0" name the SDS whose NDG they contain and
hold "Attr0.0" attribute vdatas; top-level "Attr0.0" vdatas are
global attributes; "Dim0.0"/"UDim0.0" Vgroups name dimensions.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["Hdf4File", "hdf4_open", "hdf4_write_sds"]

MAGIC = bytes.fromhex("0e031301")

_NT_DTYPES = {
    3: "u1", 4: "S1", 5: ">f4", 6: ">f8",
    20: "i1", 21: "u1", 22: ">i2", 23: ">u2",
    24: ">i4", 25: ">u4", 26: ">i8", 27: ">u8",
}

TAG_VERSION = 30
TAG_NT = 106
TAG_SDD = 701
TAG_SD = 702
TAG_NDG = 720
TAG_VH = 1962
TAG_VS = 1963
TAG_VG = 1965


class Hdf4File:
    def __init__(self, data: bytes):
        if data[:4] != MAGIC:
            raise ValueError("not an HDF4 file")
        self.data = data
        self.dds: dict[tuple[int, int], tuple[int, int]] = {}
        pos = 4
        while True:
            ndds, nxt = struct.unpack_from(">HI", data, pos)
            for k in range(ndds):
                tag, ref, off, ln = struct.unpack_from(
                    ">HHII", data, pos + 6 + 12 * k)
                if tag not in (0, 1):
                    self.dds[(tag, ref)] = (off, ln)
            if nxt == 0:
                break
            pos = nxt
        self.version = self._version()
        self.vgroups = {ref: self._vgroup(ref)
                        for (t, ref) in self.dds if t == TAG_VG}
        self.vdatas = {ref: self._vdata(ref)
                       for (t, ref) in self.dds if t == TAG_VH}
        self.datasets = self._build_sds()
        self._apply_netcdf_conventions()

    # -- low level ---------------------------------------------------------
    def _payload(self, tag: int, ref: int) -> bytes:
        special = self.dds.get((tag | 0x4000, ref))
        if special is not None:
            return self._special(*special)
        off, ln = self.dds[(tag, ref)]
        return self.data[off:off + ln]

    def _special(self, off: int, ln: int) -> bytes:
        (kind,) = struct.unpack_from(">H", self.data, off)
        if kind == 2:  # SPECIAL_EXT — external file, not supported
            raise ValueError("HDF4: external special element")
        if kind == 1:  # SPECIAL_LINKED
            length, blk_len, num_blk, link_ref = struct.unpack_from(
                ">IIIH", self.data, off + 2)
            out = bytearray()
            ref = link_ref
            first = True
            while ref != 0 and len(out) < length:
                boff, bln = self.dds[(DFTAG_LINKED, ref)]
                blk = self.data[boff:boff + bln]
                ref = struct.unpack_from(">H", blk, 0)[0]
                n_in_blk = (num_blk if not first else 1)
                pos = 2
                for _ in range(n_in_blk):
                    (dref,) = struct.unpack_from(">H", blk, pos)
                    pos += 2
                    if dref == 0:
                        continue
                    doff, dln = self.dds[(TAG_SD, dref)]
                    out.extend(self.data[doff:doff + dln])
                first = False
            return bytes(out[:length])
        if kind == 4:  # SPECIAL_COMP
            _, length, comp_ref, model, coder = struct.unpack_from(
                ">HIHHH", self.data, off + 2)
            coff, cln = self.dds[(TAG_COMPRESSED, comp_ref)]
            payload = self.data[coff:coff + cln]
            if coder == 4:  # deflate
                return zlib.decompress(payload)[:length]
            if coder == 1:  # RLE (HDF flavor: count byte semantics)
                return _hdf_rle_decode(payload, length)
            raise ValueError(f"HDF4: unsupported compression coder {coder}")
        raise ValueError(f"HDF4: unsupported special element kind {kind}")

    def _version(self) -> str | None:
        for (t, ref), (off, ln) in self.dds.items():
            if t == TAG_VERSION:
                maj, mino, rel = struct.unpack_from(">III", self.data, off)
                txt = self.data[off + 12:off + ln].split(b"\x00")[0]
                return f"{maj}.{mino}.{rel} {txt.decode('latin-1')}"
        return None

    # -- vgroup / vdata ----------------------------------------------------
    def _vgroup(self, ref: int) -> dict:
        off, ln = self.dds[(TAG_VG, ref)]
        d = self.data
        (nelt,) = struct.unpack_from(">H", d, off)
        pos = off + 2
        tags = struct.unpack_from(f">{nelt}H", d, pos)
        pos += 2 * nelt
        refs = struct.unpack_from(f">{nelt}H", d, pos)
        pos += 2 * nelt
        (namelen,) = struct.unpack_from(">H", d, pos)
        pos += 2
        name = d[pos:pos + namelen].decode("latin-1").rstrip("\x00")
        pos += namelen
        (classlen,) = struct.unpack_from(">H", d, pos)
        pos += 2
        klass = d[pos:pos + classlen].decode("latin-1").rstrip("\x00")
        return {"ref": ref, "name": name, "class": klass,
                "members": list(zip(tags, refs))}

    def _vdata(self, ref: int) -> dict:
        off, ln = self.dds[(TAG_VH, ref)]
        d = self.data
        interlace, nvert, ivsize, nfields = struct.unpack_from(
            ">HIHH", d, off)
        pos = off + 10
        types = struct.unpack_from(f">{nfields}H", d, pos)
        pos += 2 * nfields
        isizes = struct.unpack_from(f">{nfields}H", d, pos)
        pos += 2 * nfields
        offsets = struct.unpack_from(f">{nfields}H", d, pos)
        pos += 2 * nfields
        orders = struct.unpack_from(f">{nfields}H", d, pos)
        pos += 2 * nfields
        fnames = []
        for _ in range(nfields):
            (fl,) = struct.unpack_from(">H", d, pos)
            pos += 2
            fnames.append(d[pos:pos + fl].decode("latin-1"))
            pos += fl
        (nl,) = struct.unpack_from(">H", d, pos)
        pos += 2
        name = d[pos:pos + nl].decode("latin-1").rstrip("\x00")
        pos += nl
        (cl,) = struct.unpack_from(">H", d, pos)
        pos += 2
        klass = d[pos:pos + cl].decode("latin-1").rstrip("\x00")

        payload = self._payload(TAG_VS, ref)
        fields = {}
        for i, fname in enumerate(fnames):
            dt = _NT_DTYPES.get(types[i])
            order = orders[i]
            if dt is None:
                fields[fname] = None
                continue
            vals = []
            base = np.dtype(dt)
            for v in range(nvert):
                start = v * ivsize + offsets[i]
                raw = payload[start:start + isizes[i]]
                arr = np.frombuffer(raw, base, min(order,
                                                   len(raw) // base.itemsize))
                vals.append(arr)
            if dt == "S1":
                fields[fname] = [b"".join(a.tolist()).decode("latin-1")
                                 .rstrip("\x00") for a in vals]
            else:
                fields[fname] = [a[0].item() if order == 1 and len(a)
                                 else a.tolist() for a in vals]
        return {"ref": ref, "name": name, "class": klass, "nvert": nvert,
                "field_names": fnames, "fields": fields}

    # -- scientific datasets ----------------------------------------------
    def _build_sds(self) -> list[dict]:
        out = []
        for (t, ref), (off, ln) in sorted(self.dds.items()):
            if t != TAG_NDG:
                continue
            n = ln // 4
            members = struct.unpack_from(f">{2 * n}H", self.data, off)
            pairs = list(zip(members[0::2], members[1::2]))
            sdd = next((r for tg, r in pairs if tg == TAG_SDD), None)
            sd = next((r for tg, r in pairs if tg == TAG_SD), None)
            if sdd is None or sd is None:
                continue
            doff, dln = self.dds[(TAG_SDD, sdd)]
            d = self.data
            (rank,) = struct.unpack_from(">H", d, doff)
            dims = struct.unpack_from(f">{rank}I", d, doff + 2)
            nt_tag, nt_ref = struct.unpack_from(
                ">HH", d, doff + 2 + 4 * rank)
            ntoff, _ = self.dds[(TAG_NT, nt_ref)]
            nt_type = d[ntoff + 1]
            dt = _NT_DTYPES.get(nt_type)
            if dt is None:
                continue
            payload = self._payload(TAG_SD, sd)
            arr = np.frombuffer(
                payload, dt, int(np.prod(dims))).reshape(dims)
            out.append({"ndg_ref": ref, "name": f"SDS_{ref}",
                        "dims": list(dims), "dtype": np.dtype(dt),
                        "data": arr, "attributes": {}})
        return out

    def _apply_netcdf_conventions(self) -> None:
        self.attributes: dict[str, object] = {}
        by_ndg = {ds["ndg_ref"]: ds for ds in self.datasets}
        var_vg_refs = set()
        self.dim_names: list[str] = []
        for vg in self.vgroups.values():
            if vg["class"].startswith("Var0."):
                var_vg_refs.add(vg["ref"])
                ndg = next((r for t, r in vg["members"] if t == TAG_NDG),
                           None)
                if ndg in by_ndg:
                    ds = by_ndg[ndg]
                    if vg["name"]:
                        ds["name"] = vg["name"]
                    for t, r in vg["members"]:
                        if t == TAG_VH and r in self.vdatas:
                            vd = self.vdatas[r]
                            if vd["class"].startswith("Attr0."):
                                ds["attributes"][vd["name"]] = \
                                    _attr_value(vd)
            elif vg["class"].startswith(("Dim0.", "UDim0.")):
                self.dim_names.append(vg["name"])
        in_var = {r for vg in self.vgroups.values()
                  if vg["class"].startswith("Var0.")
                  for t, r in vg["members"] if t == TAG_VH}
        for vd in self.vdatas.values():
            if vd["class"].startswith("Attr0.") and vd["ref"] not in in_var:
                self.attributes[vd["name"]] = _attr_value(vd)


def _attr_value(vd: dict):
    vals = next(iter(vd["fields"].values()), None)
    if vals is None:
        return None
    if len(vals) == 1:
        return vals[0]
    return vals


def _hdf_rle_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            cnt = n + 1
            out.extend(data[i:i + cnt])
            i += cnt
        else:  # repeat next byte n-127 times
            out.extend(data[i:i + 1] * (n - 127))
            i += 1
    return bytes(out[:expected])


DFTAG_LINKED = 61
TAG_COMPRESSED = 40


def hdf4_open(data: bytes) -> Hdf4File:
    return Hdf4File(data)


# ----------------------------------------------------------------- write

def hdf4_write_sds(datasets: list[tuple[str, np.ndarray]],
                   attributes: dict[str, str] | None = None) -> bytes:
    """Minimal netCDF-flavored HDF4 writer: one NT+SDD+SD+NDG chain and
    a Var0.0 Vgroup per dataset, plus optional global Attr0.0 vdatas.
    Round-trips through Hdf4File."""
    _NT_CODES = {"uint8": 21, "int8": 20, "int16": 22, "uint16": 23,
                 "int32": 24, "uint32": 25, "float32": 5, "float64": 6}
    body = bytearray()
    dds: list[tuple[int, int, int, int]] = []
    base = None  # patched later

    def add(tag, ref, payload: bytes):
        dds.append((tag, ref, len(body), len(payload)))
        body.extend(payload)

    ref = 1
    add(TAG_VERSION, ref, struct.pack(">III", 4, 2, 15) + b"pyhdf4\x00")
    ref += 1
    for name, arr in datasets:
        arr = np.asarray(arr)
        code = _NT_CODES[str(arr.dtype)]
        dt = _NT_DTYPES[code]
        nt_ref = ref
        add(TAG_NT, nt_ref, bytes([1, code, arr.dtype.itemsize * 8, 0]))
        ref += 1
        sdd_ref = ref
        sdd = struct.pack(f">H{arr.ndim}I", arr.ndim, *arr.shape)
        sdd += struct.pack(">HH", TAG_NT, nt_ref)
        for _ in range(arr.ndim):
            sdd += struct.pack(">HH", TAG_NT, nt_ref)
        add(TAG_SDD, sdd_ref, sdd)
        ref += 1
        sd_ref = ref
        add(TAG_SD, sd_ref, arr.astype(dt).tobytes())
        ref += 1
        ndg_ref = ref
        add(TAG_NDG, ndg_ref,
            struct.pack(">4H", TAG_SDD, sdd_ref, TAG_SD, sd_ref))
        ref += 1
        # Var0.0 vgroup naming the SDS
        vg_ref = ref
        nm = name.encode("latin-1")
        vg = struct.pack(">H", 1)
        vg += struct.pack(">H", TAG_NDG) + struct.pack(">H", ndg_ref)
        vg += struct.pack(">H", len(nm)) + nm
        vg += struct.pack(">H", 6) + b"Var0.0"
        vg += struct.pack(">HHHH", 0, 0, 5, 0)
        add(TAG_VG, vg_ref, vg)
        ref += 1
    for aname, aval in (attributes or {}).items():
        raw = str(aval).encode("latin-1")
        vs_ref = ref
        add(TAG_VS, vs_ref, raw)
        vh = struct.pack(">HIHH", 0, 1, len(raw), 1)
        vh += struct.pack(">H", 4)               # type char
        vh += struct.pack(">H", len(raw))        # isize
        vh += struct.pack(">H", 0)               # offset
        vh += struct.pack(">H", len(raw))        # order
        vh += struct.pack(">H", 6) + b"VALUES"
        nm = aname.encode("latin-1")
        vh += struct.pack(">H", len(nm)) + nm
        vh += struct.pack(">H", 6) + b"Attr0.0"[:6]
        vh += struct.pack(">HHHH", 0, 0, 5, 0)
        add(TAG_VH, vs_ref, vh)
        ref += 1

    ndds = len(dds)
    header = MAGIC + struct.pack(">HI", ndds, 0)
    base = len(header) + 12 * ndds
    dd_bytes = b"".join(
        struct.pack(">HHII", t, r, base + off, ln)
        for t, r, off, ln in dds)
    return header + dd_bytes + bytes(body)
