"""CPHD (Compensated Phase History Data, NGA SAR standard) reader
(frmts/raw/cphddataset.cpp — re-derived, no code copied).

A CPHD file is a text header "CPHD/<version>" + "KEY := value" lines
terminated by a form-feed, then (at the advertised offsets) the XML
metadata block, the PVP (per-vector parameters) block and the signal
block. The XML <Data> node describes per-channel vector/sample counts
and byte offsets; <PVP> describes the compound per-vector record
(fields with word Offset/Size and Format like "F8" or
"X=F8;Y=F8;Z=F8;"; antenna sub-nodes flatten with dotted names;
AddedPVP fields are named by their <Name>). Signal samples follow
<SignalArrayFormat> (CF8 = big-endian complex float32 pairs, CI2/CI4
complex ints). All binary data is big-endian.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["CphdFile", "cphd_open"]

_SIGNAL_FMTS = {"CF8": (">f4", np.complex64), "CI4": (">i2", np.complex64),
                "CI2": (">i1", np.complex64)}
_SCALAR_FMTS = {"F8": ">f8", "F4": ">f4", "I8": ">i8", "I4": ">i4",
                "I2": ">i2", "I1": "i1", "U8": ">u8", "U4": ">u4",
                "U2": ">u2", "U1": "u1"}


def _strip_ns(root):
    for el in root.iter():
        if "}" in el.tag:
            el.tag = el.tag.rsplit("}", 1)[-1]
    return root


def _fmt_dtype(fmt: str):
    fmt = fmt.strip()
    if "=" in fmt:
        names, fmts = [], []
        for part in fmt.split(";"):
            part = part.strip()
            if not part:
                continue
            n, f = part.split("=")
            names.append(n.strip())
            fmts.append(_SCALAR_FMTS[f.strip()])
        return np.dtype({"names": names, "formats": fmts})
    return np.dtype(_SCALAR_FMTS[fmt])


class CphdFile:
    def __init__(self, data: bytes):
        nl = data.index(b"\n")
        first = data[:nl].decode("latin-1")
        if not first.startswith("CPHD/"):
            raise ValueError("not a CPHD file")
        self.version = first[5:].strip()
        self.header: dict[str, str] = {}
        pos = nl + 1
        while pos < len(data):
            eol = data.index(b"\n", pos)
            line = data[pos:eol].decode("latin-1")
            pos = eol + 1
            if line.startswith("\f") or line == "\f":
                break
            if ":=" in line:
                k, v = line.split(":=", 1)
                self.header[k.strip()] = v.strip()

        xml_off = int(self.header.get("XML_BLOCK_BYTE_OFFSET", "0"))
        xml_size = int(self.header.get("XML_BLOCK_SIZE", "0"))
        self.xml = data[xml_off:xml_off + xml_size].decode("utf-8", "replace")
        root = _strip_ns(ET.fromstring(self.xml))

        cid = root.find("CollectionID")
        self.attributes = {
            "cphd_version": self.version,
            "classification": self.header.get("CLASSIFICATION", ""),
            "release_info": self.header.get("RELEASE_INFO", ""),
        }
        if cid is not None:
            self.attributes.update({
                "collector_name": cid.findtext("CollectorName", ""),
                "core_name": cid.findtext("CoreName", ""),
                "collect_type": cid.findtext("CollectType", ""),
                "radar_mode": cid.findtext("RadarMode/ModeType", ""),
            })
        # extra header KVPs surface lower-cased (the fixture's K := V)
        known = {"XML_BLOCK_SIZE", "XML_BLOCK_BYTE_OFFSET", "PVP_BLOCK_SIZE",
                 "PVP_BLOCK_BYTE_OFFSET", "SIGNAL_BLOCK_SIZE",
                 "SIGNAL_BLOCK_BYTE_OFFSET", "SUPPORT_BLOCK_SIZE",
                 "SUPPORT_BLOCK_BYTE_OFFSET", "CLASSIFICATION",
                 "RELEASE_INFO"}
        for k, v in self.header.items():
            if k not in known:
                self.attributes[k.lower()] = v

        dnode = root.find("Data")
        nbytes_pvp = int(dnode.findtext("NumBytesPVP", "0") or 0) \
            if dnode is not None else 0
        self.pvp_dtype = self._pvp_dtype(root.find("PVP"), nbytes_pvp)
        self._read_channels(data, root)

    # -- PVP compound ------------------------------------------------------
    def _pvp_dtype(self, pvp, nbytes_pvp: int = 0) -> np.dtype | None:
        if pvp is None:
            return None
        names, formats, offsets = [], [], []

        def add(name, node):
            off = node.findtext("Offset")
            fmt = node.findtext("Format")
            if off is None or fmt is None:
                return
            names.append(name)
            formats.append(_fmt_dtype(fmt))
            offsets.append(int(off) * 8)

        for node in pvp:
            if node.tag == "AddedPVP":
                add(node.findtext("Name", "Added"), node)
            elif node.find("Offset") is not None:
                add(node.tag, node)
            else:  # antenna-style sub-structure -> dotted names
                for sub in node:
                    if sub.find("Offset") is not None:
                        add(f"{node.tag}.{sub.tag}", sub)
        if not names:
            return None
        # per-vector stride is Data/NumBytesPVP, NOT the total block
        # size (they coincide only for single-vector files)
        size = nbytes_pvp or (
            max(o + f.itemsize for o, f in zip(offsets, formats)))
        return np.dtype({"names": names, "formats": formats,
                         "offsets": offsets, "itemsize": size})

    # -- channels ----------------------------------------------------------
    def _read_channels(self, data: bytes, root) -> None:
        dnode = root.find("Data")
        self.channels: list[dict] = []
        if dnode is None:
            return
        fmt = dnode.findtext("SignalArrayFormat", "CF8").strip()
        base, outdt = _SIGNAL_FMTS.get(fmt, _SIGNAL_FMTS["CF8"])
        nbytes_pvp = int(dnode.findtext("NumBytesPVP", "0") or 0)
        pvp_off0 = int(self.header.get("PVP_BLOCK_BYTE_OFFSET", "0"))
        sig_off0 = int(self.header.get("SIGNAL_BLOCK_BYTE_OFFSET", "0"))
        for ch in dnode.findall("Channel"):
            ident = ch.findtext("Identifier", "")
            nv = int(ch.findtext("NumVectors", "0") or 0)
            ns = int(ch.findtext("NumSamples", "0") or 0)
            sig_off = sig_off0 + int(
                ch.findtext("SignalArrayByteOffset", "0") or 0)
            pvp_off = pvp_off0 + int(
                ch.findtext("PVPArrayByteOffset", "0") or 0)
            iq = np.frombuffer(data, base, 2 * nv * ns, sig_off
                               ).astype(np.float32)
            signal = (iq[0::2] + 1j * iq[1::2]).astype(outdt).reshape(nv, ns)
            pvp = None
            if self.pvp_dtype is not None and nbytes_pvp:
                raw = data[pvp_off:pvp_off + nv * self.pvp_dtype.itemsize]
                pvp = np.frombuffer(raw, self.pvp_dtype, nv)
            self.channels.append({
                "identifier": ident, "num_vectors": nv, "num_samples": ns,
                "signal": signal, "pvp": pvp,
            })


def cphd_open(data: bytes) -> CphdFile:
    return CphdFile(data)
