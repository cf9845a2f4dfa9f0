"""ISO/IEC 8211 (DDF) reader (frmts/iso8211/ in the reference).

Pure-python re-derivation of the on-disk facts:
  - 24-byte leader: record length [0:5], leader id [6], field-area base
    address [12:17], entry map sizes [20:24] (length/position/tag)
  - directory of (tag, length, position) entries terminated by FT 0x1E
  - DDR data descriptive fields: field controls (data structure +
    data type codes), field name, UT 0x1F, array descriptor (subfield
    labels, '*' marks the repeating group), UT, format controls
  - format controls grammar: count-prefixed A(n)/I(n)/R(n)/B(n bits)
    ASCII subfields, b11/b12/b14 unsigned and b21/b24 signed
    little-endian binaries, nested (...) groups; missing (n) means
    delimited by UT/FT
  - DR records reuse the DDR layout until a record with leader R
    (reuses the previous directory)

Used by the S-57 driver (sources/s57.py); the SDTS/ADRG families share
the same container.
"""

from __future__ import annotations

import re
import struct

__all__ = ["DDFModule", "parse_ddf"]

FT = 0x1E
UT = 0x1F


def _parse_formats(fmt: str) -> list[tuple]:
    """'(A(2),I(10),2b24,B(40))' -> [('A',2),('I',10),('b24',None)x2,
    ('B',5)] with B sizes converted from bits to bytes."""
    s = fmt.strip()
    if s.startswith("("):
        s = s[1:]
    if s.endswith(")"):
        s = s[:-1]
    out: list[tuple] = []
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == ",":
            i += 1
            continue
        count = 0
        while i < n and s[i].isdigit():
            count = count * 10 + int(s[i])
            i += 1
        count = count or 1
        if i >= n:
            break
        ch = s[i]
        if ch == "(":
            depth = 1
            j = i + 1
            while j < n and depth:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            inner = _parse_formats(s[i:j])
            out.extend(inner * count)
            i = j
            continue
        if ch == "b":
            code = s[i:i + 3]
            i += 3
            out.extend([(code, None)] * count)
            continue
        if ch in "AIRBCX":
            i += 1
            width = None
            if i < n and s[i] == "(":
                j = s.index(")", i)
                width = int(s[i + 1:j])
                i = j + 1
            if ch == "B" and width is not None:
                width //= 8
            out.extend([(ch, width)] * count)
            continue
        i += 1  # unknown control, skip
    return out


_BIN = {"b11": ("<B", 1), "b12": ("<H", 2), "b14": ("<I", 4),
        "b18": ("<Q", 8), "b21": ("<b", 1), "b22": ("<h", 2),
        "b24": ("<i", 4), "b28": ("<q", 8),
        # S-100 Part 10a floating-point extensions
        "b44": ("<f", 4), "b48": ("<d", 8)}


def _read_subfield(data: bytes, pos: int, kind: str, width):
    if kind in _BIN:
        fmt, sz = _BIN[kind]
        if pos + sz > len(data):
            return None, len(data)
        return struct.unpack_from(fmt, data, pos)[0], pos + sz
    if width is not None:
        raw = data[pos:pos + width]
        pos += width
        if kind == "A":
            return raw.decode("latin-1"), pos
        if kind == "B":
            return raw, pos
        txt = raw.decode("latin-1").strip()
        if kind == "I":
            try:
                return int(txt), pos
            except ValueError:
                return None, pos
        if kind == "R":
            try:
                return float(txt), pos
            except ValueError:
                return None, pos
        return raw, pos
    # delimited by UT or FT
    end = pos
    while end < len(data) and data[end] not in (FT, UT):
        end += 1
    raw = data[pos:end]
    pos = end + 1 if end < len(data) else end
    txt = raw.decode("latin-1")
    if kind == "I":
        try:
            return int(txt.strip()), pos
        except ValueError:
            return None, pos
    if kind == "R":
        try:
            return float(txt), pos
        except ValueError:
            return None, pos
    return txt, pos


class FieldDefn:
    def __init__(self, tag: str, name: str, labels_raw: str, fmt: str,
                 struct_code: int, type_code: int):
        self.tag = tag
        self.name = name
        self.struct_code = struct_code
        self.type_code = type_code
        self.repeating = labels_raw.startswith("*")
        body = labels_raw.lstrip("*")
        # S-100 style mixed descriptor: scalar head, then '\*'-marked
        # repeating tail group (e.g. DSID 'RCNM!..!DSED\*DSTC',
        # INAS '..IUIN\*NATC!ATIX!PAIX!ATIN!ATVL')
        self.tail_labels: list[str] = []
        m = re.search(r"\\*\*", body)  # optional backslashes then '*'
        if m and not self.repeating:
            head, tail = body[:m.start()], body[m.end():]
            self.labels = head.split("!") if head else []
            self.tail_labels = tail.split("!") if tail else []
        else:
            self.labels = body.split("!") if body else []
        self.formats = _parse_formats(fmt) if fmt else []

    def _fmt(self, idx: int):
        if not self.formats:
            return ("A", None)
        return self.formats[idx % len(self.formats)]

    def decode(self, data: bytes):
        """-> list of {label: value} rows (one for non-repeating).

        Mixed S-100 descriptors (scalar head + '\\*' repeating tail)
        decode to a single dict whose tail labels hold parallel lists."""
        if data.endswith(bytes([FT])):
            data = data[:-1]
        if not self.labels and not self.tail_labels:  # elementary field
            if not self.formats:
                return data.decode("latin-1")
            v, _ = _read_subfield(data, 0, *self.formats[0])
            return v
        pos = 0
        if self.tail_labels:
            row = {}
            for i, label in enumerate(self.labels):
                v, pos = _read_subfield(data, pos, *self._fmt(i))
                row[label] = v
            for label in self.tail_labels:
                row[label] = []
            nh = len(self.labels)
            while pos < len(data):
                for j, label in enumerate(self.tail_labels):
                    v, pos = _read_subfield(data, pos, *self._fmt(nh + j))
                    row[label].append(v)
            return row
        rows = []
        while True:
            row = {}
            for i, label in enumerate(self.labels):
                v, pos = _read_subfield(data, pos, *self._fmt(i))
                row[label] = v
            rows.append(row)
            if not self.repeating or pos >= len(data):
                break
        return rows if self.repeating else rows[0]


class DDFModule:
    """A parsed DDF file: .fields (tag -> FieldDefn), .records
    (list of {tag: decoded value})."""

    def __init__(self, data: bytes):
        self.fields: dict[str, FieldDefn] = {}
        self.records: list[dict] = []
        pos = self._read_ddr(data)
        prev_dir = None
        while pos + 24 <= len(data):
            pos, prev_dir = self._read_dr(data, pos, prev_dir)

    @staticmethod
    def _leader(data: bytes, pos: int):
        rec_len = int(data[pos:pos + 5])
        leader_id = chr(data[pos + 6])
        base = int(data[pos + 12:pos + 17])
        sz_len = int(chr(data[pos + 20]))
        sz_pos = int(chr(data[pos + 21]))
        sz_tag = int(chr(data[pos + 23]))
        return rec_len, leader_id, base, sz_len, sz_pos, sz_tag

    @staticmethod
    def _directory(data, pos, base, sz_len, sz_pos, sz_tag):
        entries = []
        p = pos + 24
        end = pos + base - 1  # directory ends with FT at base-1
        step = sz_tag + sz_len + sz_pos
        while p + step <= pos + base - 1 and data[p] != FT:
            tag = data[p:p + sz_tag].decode("latin-1")
            ln = int(data[p + sz_tag:p + sz_tag + sz_len])
            off = int(data[p + sz_tag + sz_len:p + step])
            entries.append((tag, ln, off))
            p += step
        return entries

    def _read_ddr(self, data: bytes) -> int:
        rec_len, _, base, sz_len, sz_pos, sz_tag = self._leader(data, 0)
        entries = self._directory(data, 0, base, sz_len, sz_pos, sz_tag)
        for tag, ln, off in entries:
            raw = data[base + off:base + off + ln]
            if tag in ("0000", "0001"):
                continue
            struct_code = int(chr(raw[0])) if chr(raw[0]).isdigit() else 0
            type_code = int(chr(raw[1])) if chr(raw[1]).isdigit() else 0
            parts = raw[9:].split(bytes([UT]))
            name = parts[0].decode("latin-1") if parts else ""
            labels = parts[1].decode("latin-1") if len(parts) > 1 else ""
            fmt = parts[2].decode("latin-1").rstrip(chr(FT)) \
                if len(parts) > 2 else ""
            self.fields[tag] = FieldDefn(tag, name, labels, fmt,
                                         struct_code, type_code)
        return rec_len

    def _read_dr(self, data: bytes, pos: int, prev_dir):
        try:
            rec_len, leader_id, base, sz_len, sz_pos, sz_tag = \
                self._leader(data, pos)
        except ValueError:
            return len(data), prev_dir
        if leader_id == "R" and prev_dir is not None:
            entries, base_off = prev_dir
            field_start = pos  # reused leader/directory: data only
        else:
            entries = self._directory(data, pos, base, sz_len, sz_pos,
                                      sz_tag)
            base_off = base
            prev_dir = (entries, base)
        rec: dict = {}
        raw_map: dict = {}
        multi: set = set()
        for tag, ln, off in entries:
            raw = data[pos + base_off + off:pos + base_off + off + ln]
            if tag in raw_map:
                if not isinstance(raw_map[tag], list):
                    raw_map[tag] = [raw_map[tag]]
                raw_map[tag].append(raw)
            else:
                raw_map[tag] = raw
            defn = self.fields.get(tag)
            if defn is None:
                rec[tag] = raw
                continue
            val = defn.decode(raw)
            if tag in rec:  # repeated field tag in one record
                if tag in multi:
                    rec[tag].append(val)
                else:
                    rec[tag] = [rec[tag], val]
                    multi.add(tag)
            else:
                rec[tag] = val
        rec["__raw__"] = raw_map
        self.records.append(rec)
        return pos + rec_len, prev_dir


def parse_ddf(data: bytes) -> DDFModule:
    return DDFModule(data)
