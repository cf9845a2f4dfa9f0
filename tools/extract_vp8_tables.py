"""Extract the RFC 6386 VP8 constant probability/quantizer tables from
the system libwebp build's read-only data and emit them as Python
literals for gdal_spark/functions/vp8_tables.py.

The tables (default coefficient probabilities, coefficient-update
probabilities, keyframe intra-mode probabilities, quantizer lookups)
are normative constants published in RFC 6386 §11.4/§13.4/§13.5/§14.1;
any conforming implementation carries the identical bytes.  We anchor
each table inside the shared object by a distinctive row and copy the
known fixed extent, then cross-validate by decoding reference fixtures
(tests/test_vp8.py) byte-exact against libwebp itself.

Usage: python tools/extract_vp8_tables.py [libwebp.so path]
Prints the generated module to stdout.
"""

from __future__ import annotations

import sys

DEFAULT_SO = "/lib/x86_64-linux-gnu/libwebp.so.7"


def find_all(data: bytes, needle: bytes) -> list[int]:
    out, i = [], data.find(needle)
    while i != -1:
        out.append(i)
        i = data.find(needle, i + 1)
    return out


def extract(so_path: str) -> dict:
    data = open(so_path, "rb").read()
    out = {}

    # --- default coefficient probabilities [4][8][3][11] -----------------
    # anchor: type 0, band 1, ctx 0 (offset 33 from table start)
    anchor = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
    hits = find_all(data, anchor)
    assert len(hits) >= 1, "coeff probs anchor not found"
    base = hits[0] - 33
    out["COEFF_PROBS"] = list(data[base : base + 4 * 8 * 3 * 11])

    # --- coefficient-update probabilities [4][8][3][11] ------------------
    # mostly 255s; locate the unique 1056-byte window that is >=70% 255
    # and starts with 33 bytes of 255 (type 0 band 0 is all-255)
    cands = []
    start = 0
    n = 1056
    while True:
        i = data.find(b"\xff" * 33, start)
        if i == -1:
            break
        w = data[i : i + n]
        if len(w) == n and w.count(255) > 700 and min(w) > 100:
            cands.append(i)
            start = i + n
        else:
            start = i + 1
    # dedupe overlapping candidates: keep windows not contained in prior
    assert cands, "update probs window not found"
    out["UPDATE_PROBS_CANDIDATES"] = cands
    out["UPDATE_PROBS"] = list(data[cands[0] : cands[0] + n])

    # --- keyframe B-mode probabilities [10][10][9] -----------------------
    anchor = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    hits = find_all(data, anchor)
    assert len(hits) >= 1, "bmode anchor not found"
    raw = data[hits[0] : hits[0] + 900]
    # libwebp's internal B-mode enum orders (RD, VR, LD) at indices
    # 4, 5, 6 where RFC 6386 §11.2 orders (LD, RD, VR); remap both the
    # [above] and [left] axes into RFC order.
    perm = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]  # RFC index -> libwebp index
    table = []
    for a in range(10):
        for lft in range(10):
            base = (perm[a] * 10 + perm[lft]) * 9
            table.extend(raw[base : base + 9])
    out["KF_BMODE_PROBS"] = table

    # --- quantizer lookups (128 entries each) ----------------------------
    # try uint8 then uint16-LE encodings of the known prefix
    for name, prefix, tail in [
        ("DC_QLOOKUP", [4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16],
         157),
        ("AC_QLOOKUP", [4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17],
         284),
    ]:
        got = None
        u8 = bytes(prefix)
        for i in find_all(data, u8):
            w = list(data[i : i + 128])
            if len(w) == 128 and w == sorted(w) and w[-1] == tail:
                got = w
                break
        if got is None:
            import struct
            u16 = struct.pack("<%dH" % len(prefix), *prefix)
            for i in find_all(data, u16):
                w = list(struct.unpack_from("<128H", data, i))
                if w == sorted(w) and w[-1] == tail:
                    got = w
                    break
        assert got is not None, name + " not found"
        out[name] = got

    # --- category extra-bit probabilities --------------------------------
    for name, seq in [
        ("PCAT1", [159]), ("PCAT2", [165, 145]), ("PCAT3", [173, 148, 140]),
        ("PCAT4", [176, 155, 140, 135]),
        ("PCAT5", [180, 157, 141, 134, 130]),
        ("PCAT6", [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129]),
    ]:
        if len(seq) >= 3:
            assert find_all(data, bytes(seq)), name + " not found in library"
        out[name] = seq
    return out


def fmt_nested(flat: list[int], dims: tuple[int, ...], indent: int = 0):
    if len(dims) == 1:
        return "(" + ", ".join(str(v) for v in flat) + (
            ",)" if len(flat) == 1 else ")")
    sub = len(flat) // dims[0]
    pad = " " * (indent + 4)
    rows = [fmt_nested(flat[i * sub : (i + 1) * sub], dims[1:], indent + 4)
            for i in range(dims[0])]
    return "(\n" + "".join(pad + r + ",\n" for r in rows) + " " * indent + ")"


def main() -> None:
    so = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SO
    t = extract(so)
    print('"""VP8 constant tables (RFC 6386).  GENERATED by')
    print("tools/extract_vp8_tables.py from the normative constants; see")
    print("that tool and tests/test_vp8.py for provenance + validation.")
    print('"""')
    print()
    print("# [block_type][band][ctx][11] — RFC 6386 §13.5")
    print("COEFF_PROBS = " + fmt_nested(t["COEFF_PROBS"], (4, 8, 3, 11)))
    print()
    print("# [block_type][band][ctx][11] — RFC 6386 §13.4")
    print("UPDATE_PROBS = " + fmt_nested(t["UPDATE_PROBS"], (4, 8, 3, 11)))
    print()
    print("# [above][left][9] — RFC 6386 §11.4")
    print("KF_BMODE_PROBS = " + fmt_nested(t["KF_BMODE_PROBS"], (10, 10, 9)))
    print()
    print("# RFC 6386 §14.1")
    print("DC_QLOOKUP = " + fmt_nested(t["DC_QLOOKUP"], (128,)))
    print("AC_QLOOKUP = " + fmt_nested(t["AC_QLOOKUP"], (128,)))
    print()
    print("# DCT value category extra-bit probabilities — RFC 6386 §13.2")
    for k in ("PCAT1", "PCAT2", "PCAT3", "PCAT4", "PCAT5", "PCAT6"):
        print(f"{k} = {fmt_nested(t[k], (len(t[k]),))}")


if __name__ == "__main__":
    main()
