"""CCITT Group 4 (ITU T.6) bi-level codec.

Pure-python re-derivation of the two-dimensional MMR coding used by
CALS type-1 rasters and CCITTFAX4 TIFFs. The white/black run-length
tables are the public ITU T.4 constants (as tabulated in libtiff's
t4.h); the 2-D mode words are V0=1, VR1=011, VR2=000011, VR3=0000011,
VL1=010, VL2=000010, VL3=0000010, H=001, P=0001, EOFB=2x EOL.
Decode follows the standard a0/b1/b2 changing-element walk; 0 = white,
1 = black.
"""

from __future__ import annotations

import numpy as np

__all__ = ["g4_encode", "g4_decode"]

WHITE_CODES = {  # run -> (length, code)  [ITU T.4 via libtiff t4.h]
    0: (8, 0x35),
    1: (6, 0x7),
    2: (4, 0x7),
    3: (4, 0x8),
    4: (4, 0xB),
    5: (4, 0xC),
    6: (4, 0xE),
    7: (4, 0xF),
    8: (5, 0x13),
    9: (5, 0x14),
    10: (5, 0x7),
    11: (5, 0x8),
    12: (6, 0x8),
    13: (6, 0x3),
    14: (6, 0x34),
    15: (6, 0x35),
    16: (6, 0x2A),
    17: (6, 0x2B),
    18: (7, 0x27),
    19: (7, 0xC),
    20: (7, 0x8),
    21: (7, 0x17),
    22: (7, 0x3),
    23: (7, 0x4),
    24: (7, 0x28),
    25: (7, 0x2B),
    26: (7, 0x13),
    27: (7, 0x24),
    28: (7, 0x18),
    29: (8, 0x2),
    30: (8, 0x3),
    31: (8, 0x1A),
    32: (8, 0x1B),
    33: (8, 0x12),
    34: (8, 0x13),
    35: (8, 0x14),
    36: (8, 0x15),
    37: (8, 0x16),
    38: (8, 0x17),
    39: (8, 0x28),
    40: (8, 0x29),
    41: (8, 0x2A),
    42: (8, 0x2B),
    43: (8, 0x2C),
    44: (8, 0x2D),
    45: (8, 0x4),
    46: (8, 0x5),
    47: (8, 0xA),
    48: (8, 0xB),
    49: (8, 0x52),
    50: (8, 0x53),
    51: (8, 0x54),
    52: (8, 0x55),
    53: (8, 0x24),
    54: (8, 0x25),
    55: (8, 0x58),
    56: (8, 0x59),
    57: (8, 0x5A),
    58: (8, 0x5B),
    59: (8, 0x4A),
    60: (8, 0x4B),
    61: (8, 0x32),
    62: (8, 0x33),
    63: (8, 0x34),
    64: (5, 0x1B),
    128: (5, 0x12),
    192: (6, 0x17),
    256: (7, 0x37),
    320: (8, 0x36),
    384: (8, 0x37),
    448: (8, 0x64),
    512: (8, 0x65),
    576: (8, 0x68),
    640: (8, 0x67),
    704: (9, 0xCC),
    768: (9, 0xCD),
    832: (9, 0xD2),
    896: (9, 0xD3),
    960: (9, 0xD4),
    1024: (9, 0xD5),
    1088: (9, 0xD6),
    1152: (9, 0xD7),
    1216: (9, 0xD8),
    1280: (9, 0xD9),
    1344: (9, 0xDA),
    1408: (9, 0xDB),
    1472: (9, 0x98),
    1536: (9, 0x99),
    1600: (9, 0x9A),
    1664: (6, 0x18),
    1728: (9, 0x9B),
    1792: (11, 0x8),
    1856: (11, 0xC),
    1920: (11, 0xD),
    1984: (12, 0x12),
    2048: (12, 0x13),
    2112: (12, 0x14),
    2176: (12, 0x15),
    2240: (12, 0x16),
    2304: (12, 0x17),
    2368: (12, 0x1C),
    2432: (12, 0x1D),
    2496: (12, 0x1E),
    2560: (12, 0x1F),
}
BLACK_CODES = {  # run -> (length, code)  [ITU T.4 via libtiff t4.h]
    0: (10, 0x37),
    1: (3, 0x2),
    2: (2, 0x3),
    3: (2, 0x2),
    4: (3, 0x3),
    5: (4, 0x3),
    6: (4, 0x2),
    7: (5, 0x3),
    8: (6, 0x5),
    9: (6, 0x4),
    10: (7, 0x4),
    11: (7, 0x5),
    12: (7, 0x7),
    13: (8, 0x4),
    14: (8, 0x7),
    15: (9, 0x18),
    16: (10, 0x17),
    17: (10, 0x18),
    18: (10, 0x8),
    19: (11, 0x67),
    20: (11, 0x68),
    21: (11, 0x6C),
    22: (11, 0x37),
    23: (11, 0x28),
    24: (11, 0x17),
    25: (11, 0x18),
    26: (12, 0xCA),
    27: (12, 0xCB),
    28: (12, 0xCC),
    29: (12, 0xCD),
    30: (12, 0x68),
    31: (12, 0x69),
    32: (12, 0x6A),
    33: (12, 0x6B),
    34: (12, 0xD2),
    35: (12, 0xD3),
    36: (12, 0xD4),
    37: (12, 0xD5),
    38: (12, 0xD6),
    39: (12, 0xD7),
    40: (12, 0x6C),
    41: (12, 0x6D),
    42: (12, 0xDA),
    43: (12, 0xDB),
    44: (12, 0x54),
    45: (12, 0x55),
    46: (12, 0x56),
    47: (12, 0x57),
    48: (12, 0x64),
    49: (12, 0x65),
    50: (12, 0x52),
    51: (12, 0x53),
    52: (12, 0x24),
    53: (12, 0x37),
    54: (12, 0x38),
    55: (12, 0x27),
    56: (12, 0x28),
    57: (12, 0x58),
    58: (12, 0x59),
    59: (12, 0x2B),
    60: (12, 0x2C),
    61: (12, 0x5A),
    62: (12, 0x66),
    63: (12, 0x67),
    64: (10, 0xF),
    128: (12, 0xC8),
    192: (12, 0xC9),
    256: (12, 0x5B),
    320: (12, 0x33),
    384: (12, 0x34),
    448: (12, 0x35),
    512: (13, 0x6C),
    576: (13, 0x6D),
    640: (13, 0x4A),
    704: (13, 0x4B),
    768: (13, 0x4C),
    832: (13, 0x4D),
    896: (13, 0x72),
    960: (13, 0x73),
    1024: (13, 0x74),
    1088: (13, 0x75),
    1152: (13, 0x76),
    1216: (13, 0x77),
    1280: (13, 0x52),
    1344: (13, 0x53),
    1408: (13, 0x54),
    1472: (13, 0x55),
    1536: (13, 0x5A),
    1600: (13, 0x5B),
    1664: (13, 0x64),
    1728: (13, 0x65),
    1792: (11, 0x8),
    1856: (11, 0xC),
    1920: (11, 0xD),
    1984: (12, 0x12),
    2048: (12, 0x13),
    2112: (12, 0x14),
    2176: (12, 0x15),
    2240: (12, 0x16),
    2304: (12, 0x17),
    2368: (12, 0x1C),
    2432: (12, 0x1D),
    2496: (12, 0x1E),
    2560: (12, 0x1F),
}

def _build_decoder(codes):
    return {(length, code): run for run, (length, code) in codes.items()}

_WHITE_DEC = _build_decoder(WHITE_CODES)
_BLACK_DEC = _build_decoder(BLACK_CODES)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, length, code):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def take(self, n) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3] if (self.pos >> 3) < \
                len(self.data) else 0
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def peek1(self) -> int:
        byte = self.data[self.pos >> 3] if (self.pos >> 3) < \
            len(self.data) else 0
        return (byte >> (7 - (self.pos & 7))) & 1


def _put_run(w: _BitWriter, run: int, color: int):
    codes = BLACK_CODES if color else WHITE_CODES
    while run >= 64:
        if run >= 2624:
            mk = 2560
        else:
            mk = (run // 64) * 64
        length, code = codes[mk]
        w.put(length, code)
        run -= mk
    length, code = codes[run]
    w.put(length, code)


def _changes(row: np.ndarray) -> list:
    """Changing-element positions; a black line start is an implicit
    change at position 0 (the imaginary pixel before the line is
    white)."""
    d = (np.nonzero(np.diff(row))[0] + 1).tolist()
    if len(row) and row[0]:
        d.insert(0, 0)
    return d


def g4_encode(arr: np.ndarray) -> bytes:
    """arr: HxW of 0 (white) / 1 (black) -> T.6 codestream with EOFB."""
    a = (np.asarray(arr) != 0).astype(np.int8)
    h, wth = a.shape
    w = _BitWriter()
    ref_changes = [wth, wth]
    for y in range(h):
        cur = a[y]
        changes = _changes(cur) + [wth, wth]
        a0 = -1
        color = 0
        ci = 0  # index of next change > a0 in changes
        while a0 < wth:
            a1 = changes[ci] if ci < len(changes) else wth
            # b1: first change on ref line right of a0 with color
            # opposite of a0's color (i.e. a transition to !color)
            b1 = wth
            for pos_i, pos in enumerate(ref_changes):
                # parity: ref line starts white; change k flips to
                # black when k is even
                if pos > a0 and (pos_i % 2 == 0) == (color == 0):
                    b1 = pos
                    break
            b2 = wth
            for pos_i, pos in enumerate(ref_changes):
                if pos > b1:
                    b2 = pos
                    break
            if b2 < a1:
                w.put(4, 0b0001)  # pass
                a0 = b2
                while ci < len(changes) and changes[ci] <= a0:
                    ci += 1
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                if d == 0:
                    w.put(1, 0b1)
                elif d == 1:
                    w.put(3, 0b011)
                elif d == 2:
                    w.put(6, 0b000011)
                elif d == 3:
                    w.put(7, 0b0000011)
                elif d == -1:
                    w.put(3, 0b010)
                elif d == -2:
                    w.put(6, 0b000010)
                else:
                    w.put(7, 0b0000010)
                a0 = a1
                color ^= 1
                ci += 1
            else:
                # horizontal: two runs from a0
                a2 = changes[ci + 1] if ci + 1 < len(changes) else wth
                w.put(3, 0b001)
                start = 0 if a0 < 0 else a0
                _put_run(w, a1 - start, color)
                _put_run(w, a2 - a1, color ^ 1)
                a0 = a2
                ci += 2
            if a0 >= wth:
                break
        ref_changes = _changes(cur) + [wth, wth]
    # EOFB: two EOLs (000000000001 x2)
    w.put(12, 1)
    w.put(12, 1)
    return w.done()


def _read_run(r: _BitReader, color: int) -> int:
    dec = _BLACK_DEC if color else _WHITE_DEC
    total = 0
    while True:
        length = 0
        code = 0
        run = None
        while length < 14:
            code = (code << 1) | r.take(1)
            length += 1
            run = dec.get((length, code))
            if run is not None:
                break
        if run is None:
            raise ValueError("invalid G4 run code")
        total += run
        if run < 64:
            return total


def g4_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 codestream -> HxW uint8 of 0/1."""
    r = _BitReader(data)
    out = np.zeros((height, width), np.uint8)
    ref_changes = [width, width]
    for y in range(height):
        changes = []
        a0 = -1
        color = 0
        while a0 < width:
            # find b1/b2 from reference changes
            b1 = width
            for pos_i, pos in enumerate(ref_changes):
                if pos > a0:
                    if (pos_i % 2 == 0) == (color == 0):
                        b1 = pos
                        break
            b2 = width
            for pos in ref_changes:
                if pos > b1:
                    b2 = pos
                    break
            # decode mode word
            if r.take(1) == 1:  # V0
                a1 = b1
                changes.append(a1)
                a0 = a1
                color ^= 1
                continue
            bits = r.take(2)
            if bits == 0b11:  # 011 VR1
                a1 = b1 + 1
                changes.append(a1)
                a0 = a1
                color ^= 1
            elif bits == 0b10:  # 010 VL1
                a1 = b1 - 1
                changes.append(a1)
                a0 = a1
                color ^= 1
            elif bits == 0b01:  # 001 horizontal
                start = 0 if a0 < 0 else a0
                run1 = _read_run(r, color)
                run2 = _read_run(r, color ^ 1)
                a1 = start + run1
                a2 = a1 + run2
                changes.append(a1)
                changes.append(a2)
                a0 = a2
            else:  # 000x...
                if r.take(1) == 1:  # 0001 pass
                    a0 = b2
                    continue
                bits2 = r.take(2)
                if bits2 == 0b11:  # 000011 VR2
                    a1 = b1 + 2
                elif bits2 == 0b10:  # 000010 VL2
                    a1 = b1 - 2
                else:
                    b3 = r.take(1)
                    word = (bits2 << 1) | b3
                    if word == 0b011:  # 0000011 VR3
                        a1 = b1 + 3
                    elif word == 0b010:  # 0000010 VL3
                        a1 = b1 - 3
                    else:
                        # EOL / EOFB or garbage: stop this line
                        a1 = width
                        changes.append(a1)
                        a0 = width
                        color ^= 1
                        continue
                changes.append(a1)
                a0 = a1
                color ^= 1
        # paint the row from changes
        col = 0
        pos = 0
        for ch in changes:
            ch_cl = min(max(ch, 0), width)
            if col:
                out[y, pos:ch_cl] = 1
            pos = ch_cl
            col ^= 1
        if col and pos < width:
            out[y, pos:width] = 1
        ref_changes = [min(max(c, 0), width) for c in changes] + \
            [width, width]
    return out
