"""OGR PDS3 TABLE reader (ogr/ogrsf_frmts/pds — re-derived, no code
copied): the vector side of PDS3 products, complementing the raster
reader in raster/planetary.py.

A PDS3 label's ^TABLE pointer names the data file (optionally with a
1-based record offset, or a record number for attached tables); the
TABLE object carries ROWS / COLUMNS / INTERCHANGE_FORMAT and either
inline COLUMN objects or a ^STRUCTURE .fmt file of COLUMN objects
(NAME, DATA_TYPE, START_BYTE 1-based, BYTES, optional ITEMS +
ITEM_BYTES). ASCII tables slice fixed RECORD_BYTES rows; binary
tables map to a numpy structured dtype (MSB/LSB integer flavours,
IEEE_REAL 4/8 bytes, CHARACTER).
"""

from __future__ import annotations

import re

import numpy as np

from gdal_spark.raster.planetary import odl_parse

__all__ = ["pds_table_open", "PdsTable"]


def _parse_columns(text: str) -> list[dict]:
    """COLUMN objects from a label or .fmt file."""
    cols: list[dict] = []
    cur: dict | None = None
    pending_key = None
    for raw in text.splitlines():
        line = raw.strip()
        if pending_key is not None:
            # continuation of a multi-line quoted value: swallow until
            # the closing quote
            if '"' in line:
                pending_key = None
            continue
        m = re.match(r"([A-Za-z_^][A-Za-z0-9_:^]*)\s*=\s*(.*)", line)
        if not m:
            continue
        key, value = m.group(1), m.group(2).strip()
        if value.count('"') == 1:
            pending_key = key
            continue
        value = value.strip('"').strip()
        if key == "OBJECT" and value == "COLUMN":
            cur = {}
        elif key == "END_OBJECT":
            if cur is not None and value in ("COLUMN", ""):
                cols.append(cur)
                cur = None
        elif cur is not None:
            cur[key] = value
    return cols


_BIN_TYPES = {
    "MSB_UNSIGNED_INTEGER": ">u", "MSB_INTEGER": ">i",
    "LSB_UNSIGNED_INTEGER": "<u", "LSB_INTEGER": "<i",
    "UNSIGNED_INTEGER": ">u", "INTEGER": ">i",
    "IEEE_REAL": ">f", "FLOAT": ">f", "REAL": ">f",
    "PC_REAL": "<f",
}


class PdsTable:
    def __init__(self, label_text: str, read):
        """``read(name) -> bytes`` resolves sibling files
        (case-insensitive lookups are the caller's concern)."""
        lbl = odl_parse(label_text)
        self.label = lbl
        pointer = lbl.get("^TABLE")
        if pointer is None:
            raise ValueError("PDS: no ^TABLE pointer")
        record_bytes = int(float(lbl.get("RECORD_BYTES", "0") or 0))
        rows = int(float(lbl.get("TABLE.ROWS", "0") or 0))
        fmt = str(lbl.get("TABLE.INTERCHANGE_FORMAT", "ASCII")).upper()
        row_bytes = int(float(lbl.get("TABLE.ROW_BYTES", record_bytes)
                              or record_bytes))

        offset = 0
        ptr = str(pointer).strip()
        m = re.match(r'\(\s*"?([^",)]+)"?\s*,\s*(\d+)\s*\)', ptr)
        if m:  # ("FILE", record)
            fname = m.group(1)
            offset = (int(m.group(2)) - 1) * record_bytes
        else:
            fname = ptr.strip('"')
        payload = read(fname)
        if payload is None:
            raise ValueError(f"PDS: cannot read table file {fname}")
        payload = payload[offset:]

        struct_ptr = lbl.get("TABLE.^STRUCTURE")
        if struct_ptr:
            fmt_text = read(str(struct_ptr).strip('"'))
            if fmt_text is None:
                raise ValueError("PDS: cannot read ^STRUCTURE file")
            cols = _parse_columns(fmt_text.decode("latin-1", "replace"))
        else:
            cols = _parse_columns(label_text)
        if not cols:
            raise ValueError("PDS: no COLUMN definitions")
        self.columns = cols
        self.rows = rows
        self.interchange = fmt

        # declared ROWS is the layer's feature count, but a truncated
        # data file only yields what it holds (GDAL reads lazily)
        avail = min(rows, len(payload) // row_bytes) if row_bytes else 0
        self.rows_available = avail
        raw = np.frombuffer(payload, np.uint8,
                            avail * row_bytes).reshape(avail, row_bytes)
        rows = avail
        self.fields: dict[str, np.ndarray] = {}
        for col in cols:
            name = col.get("NAME", "")
            start = int(col.get("START_BYTE", "1")) - 1
            nbytes = int(col.get("BYTES", "0"))
            items = int(col.get("ITEMS", "1") or 1)
            dtype = col.get("DATA_TYPE", "CHARACTER").upper()
            chunk = raw[:, start:start + nbytes]
            if fmt == "ASCII":
                txt = chunk.tobytes().decode("latin-1")
                vals = [txt[i * nbytes:(i + 1) * nbytes].strip()
                        for i in range(rows)]
                if "REAL" in dtype:
                    self.fields[name] = np.array(
                        [_atof(v) for v in vals])
                elif "INTEGER" in dtype:
                    self.fields[name] = np.array(
                        [_atoi(v) for v in vals], np.int64)
                else:
                    self.fields[name] = np.array(vals, object)
            else:
                prefix = _BIN_TYPES.get(dtype)
                if prefix is None:  # CHARACTER etc.
                    self.fields[name] = np.array(
                        [chunk[r].tobytes().decode("latin-1").strip()
                         for r in range(rows)], object)
                    continue
                isz = int(col.get("ITEM_BYTES", "0") or 0) or nbytes // items
                dt = np.dtype(f"{prefix}{isz}")
                vals = np.ascontiguousarray(
                    chunk[:, :items * isz]).view(dt).reshape(rows, items)
                self.fields[name] = vals[:, 0] if items == 1 else vals

    def feature(self, idx: int) -> dict:
        out = {}
        for name, vals in self.fields.items():
            v = vals[idx]
            out[name] = v.tolist() if isinstance(v, np.ndarray) else (
                v.item() if hasattr(v, "item") else v)
        return out


def _atoi(v: str) -> int:
    """atoi semantics: leading token only (overlapping fixed-width
    columns in real products rely on this)."""
    tok = v.split()[0] if v.split() else ""
    try:
        return int(tok)
    except ValueError:
        return 0


def _atof(v: str) -> float:
    tok = v.split()[0] if v.split() else ""
    try:
        return float(tok)
    except ValueError:
        return float("nan")


def pds_table_open(label_text: str, read) -> PdsTable:
    return PdsTable(label_text, read)
