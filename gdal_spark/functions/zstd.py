"""Zstandard decoder — pure Python, re-derived from RFC 8878.

This environment has no zstd library, but ZSTD is the most common
modern COG compression after Deflate (reference: frmts/gtiff
COMPRESS=ZSTD via libtiff tif_zstd.c, LERC_ZSTD in tif_lerc.c, Zarr
blosc/zstd chunks). The decoder below implements the documented frame
format end to end:

  * frames: magic 0xFD2FB528, frame-header descriptor (FCS field
    size, single-segment, checksum, dictionary id), window descriptor,
    skippable frames (0x184D2A5?)
  * blocks: raw / RLE / compressed, 3-byte little-endian headers
  * literals: raw / RLE / Huffman-compressed / treeless, 1- and
    4-stream layouts with the jump table
  * Huffman: direct 4-bit weights or FSE-compressed weights (two
    interleaved states over a backward bitstream), last weight
    implied, canonical table in increasing-weight order
  * sequences: predefined / RLE / FSE-compressed literal-length,
    match-length and offset code tables (the RFC's default
    distributions), forward-read normalized-count descriptors,
    backward interleaved bitstream (init LL->OF->ML; per sequence
    read OF->ML->LL extras, update LL->ML->OF), the three-slot
    repeat-offset history with the literals_length==0 shift
  * sequence execution with overlap-safe match copies

Decode only — enough to read ZSTD-compressed strips/tiles. Frame
content checksums (low 32 bits of XXH64) and the frame-content-size
field ARE verified, so truncated/corrupted strips raise instead of
returning wrong pixels (the reference's byte_zstd_corrupted.tif
expectation).
"""

from __future__ import annotations

import struct

__all__ = ["zstd_decompress"]

_MAGIC = 0xFD2FB528

_M64 = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(v: int, r: int) -> int:
    return ((v << r) | (v >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (public algorithm) — zstd frame checksums are its low 32
    bits."""
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M64
        a2 = (seed + _P2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for j, a in enumerate((a1, a2, a3, a4)):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                a = _rotl((a + lane * _P2) & _M64, 31) * _P1 & _M64
                if j == 0:
                    a1 = a
                elif j == 1:
                    a2 = a
                elif j == 2:
                    a3 = a
                else:
                    a4 = a
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M64
        for a in (a1, a2, a3, a4):
            a = _rotl((a * _P2) & _M64, 31) * _P1 & _M64
            h = ((h ^ a) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        k = _rotl((k * _P2) & _M64, 31) * _P1 & _M64
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h = (_rotl(h ^ (k * _P1 & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5 & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h

# RFC 8878 default distributions (predefined FSE tables)
_LL_DEFAULTS = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                -1, -1, -1, -1]
_LL_ACCLOG = 6
_ML_DEFAULTS = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
                -1, -1, -1, -1, -1]
_ML_ACCLOG = 6
_OF_DEFAULTS = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1]
_OF_ACCLOG = 5

# literals-length codes: (baseline, extra bits)
_LL_TABLE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
    (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
    (65536, 16),
]
# match-length codes
_ML_TABLE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]


class _BackBits:
    """Backward bitstream: bytes are consumed from the END; the last
    byte's highest set bit is a padding sentinel."""

    __slots__ = ("val", "avail")

    def __init__(self, data: bytes):
        if not data:
            raise ValueError("zstd: empty bitstream")
        self.val = int.from_bytes(data, "little")
        if self.val == 0:
            raise ValueError("zstd: bitstream without sentinel")
        self.avail = self.val.bit_length() - 1  # drop the sentinel bit

    def read(self, n: int) -> int:
        """MSB-first read below the sentinel; short reads past the
        start are zero-padded (states may finish with 0 bits)."""
        if n == 0:
            return 0
        if n <= self.avail:
            self.avail -= n
            return (self.val >> self.avail) & ((1 << n) - 1)
        # zero-padded tail read
        got = self.val & ((1 << self.avail) - 1) if self.avail else 0
        pad = n - self.avail
        self.avail = 0
        return got << pad


class _FwdBits:
    """Forward little-endian bitstream (FSE table descriptors)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def peek(self, n: int) -> int:
        v = 0
        for i in range(n):
            p = self.pos + i
            v |= ((self.data[p >> 3] >> (p & 7)) & 1) << i
        return v

    def skip(self, n: int) -> None:
        self.pos += n

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.pos += n
        return v

    def bytes_used(self) -> int:
        return (self.pos + 7) >> 3


def _read_ncount(bits: _FwdBits, max_symbol: int,
                 max_acc: int = 9) -> tuple[list[int], int]:
    """FSE normalized-count descriptor (forward stream).

    RFC 8878 caps the accuracy log per table: 9 (literals-length),
    8 (offsets), 9 (match-length), 6 (Huffman weights); reject
    streams above the caller's cap instead of allocating oversized
    tables.
    """
    acc_log = bits.read(4) + 5
    if acc_log > max_acc:
        raise ValueError("zstd: accuracy log too large")
    table_size = 1 << acc_log
    remaining = table_size + 1
    threshold = table_size
    nbits = acc_log + 1
    norm: list[int] = []
    while remaining > 1 and len(norm) <= max_symbol:
        mx = (2 * threshold - 1) - remaining
        val = bits.peek(nbits)
        if (val & (threshold - 1)) < mx:
            val &= threshold - 1
            bits.skip(nbits - 1)
        else:
            val &= 2 * threshold - 1
            if val >= threshold:
                val -= mx
            bits.skip(nbits)
        count = val - 1
        remaining -= -count if count < 0 else count
        norm.append(count)
        if count == 0:
            while True:
                rep = bits.read(2)
                norm.extend([0] * rep)
                if rep < 3:
                    break
        while remaining > 1 and remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: corrupted normalized counts")
    return norm, acc_log


def _fse_table(norm: list[int], acc_log: int):
    """-> list of (symbol, nb_bits, baseline) per state cell."""
    size = 1 << acc_log
    table = [0] * size
    high = size - 1
    for s, c in enumerate(norm):
        if c == -1:
            table[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for s, c in enumerate(norm):
        if c > 0:
            for _ in range(c):
                table[pos] = s
                pos = (pos + step) & (size - 1)
                while pos > high:
                    pos = (pos + step) & (size - 1)
    if pos != 0:
        raise ValueError("zstd: FSE table spread error")
    counts = [1 if c == -1 else c for c in norm]
    next_state = list(counts)
    out = []
    for cell in range(size):
        s = table[cell]
        ns = next_state[s]
        next_state[s] += 1
        nb = acc_log - (ns.bit_length() - 1)
        baseline = (ns << nb) - size
        out.append((s, nb, baseline))
    return out


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------


def _huffman_from_weights(weights: list[int]):
    """weights (without the implied last) -> (table, table_log); table
    maps a table_log-bit prefix -> (symbol, nb_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty huffman")
    table_log = total.bit_length()  # smallest t with 2^t > total
    if table_log > 11:
        raise ValueError("zstd: huffman depth > 11")
    missing = (1 << table_log) - total
    if missing & (missing - 1):
        raise ValueError("zstd: invalid huffman weights")
    last_w = missing.bit_length()  # log2(missing) + 1
    weights = weights + [last_w]
    size = 1 << table_log
    table = [None] * size
    pos = 0
    for w in range(1, table_log + 1):
        for sym, ww in enumerate(weights):
            if ww == w:
                nb = table_log + 1 - w
                span = 1 << (w - 1)
                for i in range(span):
                    table[pos + i] = (sym, nb)
                pos += span
    if pos != size:
        raise ValueError("zstd: huffman table incomplete")
    return table, table_log


def _read_huffman(data: bytes, pos: int):
    hb = data[pos]
    pos += 1
    if hb >= 128:
        # direct: hb-127 stored 4-bit weights (high nibble first); the
        # last symbol's weight stays implied (added by the builder)
        n = hb - 127
        weights = []
        for i in range(n):
            b = data[pos + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        pos += (n + 1) >> 1
        return _huffman_from_weights(weights), pos
    # FSE-compressed weights: hb = compressed size
    blob = data[pos : pos + hb]
    pos += hb
    fwd = _FwdBits(blob)
    norm, acc = _read_ncount(fwd, 255, max_acc=6)
    dtable = _fse_table(norm, acc)
    bstream = blob[fwd.bytes_used() :]
    br = _BackBits(bstream)
    s1 = br.read(acc)
    s2 = br.read(acc)
    weights = []
    while True:
        sym, nb, base = dtable[s1]
        weights.append(sym)
        if br.avail < nb:
            sym2, _, _ = dtable[s2]
            weights.append(sym2)
            break
        s1 = base + br.read(nb)
        sym, nb, base = dtable[s2]
        weights.append(sym)
        if br.avail < nb:
            sym1, _, _ = dtable[s1]
            weights.append(sym1)
            break
        s2 = base + br.read(nb)
        if len(weights) > 255:
            raise ValueError("zstd: too many huffman weights")
    return _huffman_from_weights(weights), pos


def _huff_decode_stream(table, table_log, data: bytes, count: int) -> bytes:
    br = _BackBits(data)
    out = bytearray()
    for _ in range(count):
        # peek table_log bits (zero-padded near the start), consume
        # only the symbol's own nb bits
        if br.avail >= table_log:
            idx = (br.val >> (br.avail - table_log)) & ((1 << table_log) - 1)
        else:
            low = br.val & ((1 << br.avail) - 1) if br.avail else 0
            idx = low << (table_log - br.avail)
        sym, nb = table[idx]
        out.append(sym)
        br.avail = br.avail - nb if br.avail >= nb else 0
    return bytes(out)


# --------------------------------------------------------------------------
# block decode
# --------------------------------------------------------------------------


def _decode_literals(data: bytes, pos: int, prev_huff):
    b0 = data[pos]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif sf == 1:
            regen = (b0 >> 4) | (data[pos + 1] << 4)
            pos += 2
        else:
            regen = (b0 >> 4) | (data[pos + 1] << 4) | (data[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            lit = data[pos : pos + regen]
            pos += regen
        else:
            lit = data[pos : pos + 1] * regen
            pos += 1
        return bytes(lit), pos, prev_huff
    # compressed (2) / treeless (3)
    h = b0 | (data[pos + 1] << 8) | (data[pos + 2] << 16)
    if sf == 0:
        streams = 1
        regen = (h >> 4) & 0x3FF
        comp = (h >> 14) & 0x3FF
        pos += 3
    elif sf == 1:
        streams = 4
        regen = (h >> 4) & 0x3FF
        comp = (h >> 14) & 0x3FF
        pos += 3
    elif sf == 2:
        streams = 4
        h |= data[pos + 3] << 24
        regen = (h >> 4) & 0x3FFF
        comp = (h >> 18) & 0x3FFF
        pos += 4
    else:
        streams = 4
        h |= (data[pos + 3] << 24) | (data[pos + 4] << 32)
        regen = (h >> 4) & 0x3FFFF
        comp = (h >> 22) & 0x3FFFF
        pos += 5
    section = data[pos : pos + comp]
    pos += comp
    sp = 0
    if ltype == 2:
        (table, tlog), used = _read_huffman_inline(section)
        sp = used
        huff = (table, tlog)
    else:
        if prev_huff is None:
            raise ValueError("zstd: treeless literals without prior tree")
        huff = prev_huff
    table, tlog = huff
    if streams == 1:
        lit = _huff_decode_stream(table, tlog, section[sp:], regen)
    else:
        s1, s2, s3 = struct.unpack_from("<HHH", section, sp)
        sp += 6
        body = section[sp:]
        n1 = (regen + 3) // 4
        sizes = [s1, s2, s3, len(body) - s1 - s2 - s3]
        counts = [n1, n1, n1, regen - 3 * n1]
        lit = bytearray()
        off = 0
        for sz, cnt in zip(sizes, counts):
            lit += _huff_decode_stream(table, tlog, body[off : off + sz], cnt)
            off += sz
        lit = bytes(lit)
    return lit, pos, huff


def _read_huffman_inline(section: bytes):
    (table_log_pair, new_pos) = _read_huffman(section, 0)
    return table_log_pair, new_pos


def _seq_table(data: bytes, pos: int, mode: int, defaults, def_acc,
               max_symbol, prev, max_acc=9):
    if mode == 0:  # predefined
        return _fse_table(defaults, def_acc), def_acc, pos, None
    if mode == 1:  # RLE: single symbol, 0-bit state
        sym = data[pos]
        return [(sym, 0, 0)], 0, pos + 1, None
    if mode == 2:  # FSE-compressed
        fwd = _FwdBits(data[pos:])
        norm, acc = _read_ncount(fwd, max_symbol, max_acc=max_acc)
        return _fse_table(norm, acc), acc, pos + fwd.bytes_used(), None
    if prev is None:
        raise ValueError("zstd: repeat mode without previous table")
    return prev[0], prev[1], pos, None


def _decode_block(data: bytes, out: bytearray, prev_huff, prev_tables,
                  rep: list[int]):
    """Decode one compressed block.

    ``rep`` is the frame-scoped repeat-offset history (RFC 8878
    §3.1.1.5): initialized to [1, 4, 8] at frame start and carried
    across blocks within the frame — NOT reset per block.  Mutated in
    place so raw/RLE blocks (which never see it) leave it unchanged.
    """
    pos = 0
    lit, pos, huff = _decode_literals(data, pos, prev_huff)
    b = data[pos]
    pos += 1
    if b == 0:
        out += lit
        return huff, prev_tables
    if b < 128:
        nseq = b
    elif b < 255:
        nseq = ((b - 128) << 8) + data[pos]
        pos += 1
    else:
        nseq = data[pos] + (data[pos + 1] << 8) + 0x7F00
        pos += 2
    modes = data[pos]
    pos += 1
    ll_mode = (modes >> 6) & 3
    of_mode = (modes >> 4) & 3
    ml_mode = (modes >> 2) & 3
    p_ll, p_of, p_ml = prev_tables if prev_tables else (None, None, None)
    ll_t, ll_acc, pos, _ = _seq_table(
        data, pos, ll_mode, _LL_DEFAULTS, _LL_ACCLOG, 35, p_ll, max_acc=9)
    of_t, of_acc, pos, _ = _seq_table(
        data, pos, of_mode, _OF_DEFAULTS, _OF_ACCLOG, 31, p_of, max_acc=8)
    ml_t, ml_acc, pos, _ = _seq_table(
        data, pos, ml_mode, _ML_DEFAULTS, _ML_ACCLOG, 52, p_ml, max_acc=9)
    br = _BackBits(data[pos:])
    st_ll = br.read(ll_acc)
    st_of = br.read(of_acc)
    st_ml = br.read(ml_acc)
    lit_pos = 0
    for i in range(nseq):
        of_code = of_t[st_of][0]
        ml_code = ml_t[st_ml][0]
        ll_code = ll_t[st_ll][0]
        offset_value = (1 << of_code) + br.read(of_code)
        ml_base, ml_bits = _ML_TABLE[ml_code]
        ml = ml_base + br.read(ml_bits)
        ll_base, ll_bits = _LL_TABLE[ll_code]
        ll = ll_base + br.read(ll_bits)
        # repeat-offset resolution
        if offset_value > 3:
            offset = offset_value - 3
            rep[:] = [offset, rep[0], rep[1]]
        else:
            ov = offset_value + (1 if ll == 0 else 0)
            if ov == 1:
                offset = rep[0]
            elif ov == 2:
                offset = rep[1]
                rep[:] = [offset, rep[0], rep[2]]
            elif ov == 3:
                offset = rep[2]
                rep[:] = [offset, rep[0], rep[1]]
            else:
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: offset underflow")
                rep[:] = [offset, rep[0], rep[1]]
        out += lit[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match before window start")
        for _ in range(ml):
            out.append(out[-offset])
        if i < nseq - 1:
            s, nb, base = ll_t[st_ll]
            st_ll = base + br.read(nb)
            s, nb, base = ml_t[st_ml]
            st_ml = base + br.read(nb)
            s, nb, base = of_t[st_of]
            st_of = base + br.read(nb)
    out += lit[lit_pos:]
    return huff, ((ll_t, ll_acc), (of_t, of_acc), (ml_t, ml_acc))


def zstd_decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    data = bytes(data)
    pos = 0
    out = bytearray()
    while pos < len(data):
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            (size,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + size
            continue
        if magic != _MAGIC:
            raise ValueError("zstd: bad magic")
        pos += 4
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single_segment = bool(fhd & 0x20)
        checksum_flag = bool(fhd & 0x04)
        dict_flag = fhd & 3
        if not single_segment:
            pos += 1  # window descriptor
        pos += (0, 1, 2, 4)[dict_flag]
        fcs = None
        if fcs_flag == 0:
            if single_segment:
                fcs = data[pos]
                pos += 1
        elif fcs_flag == 1:
            fcs = struct.unpack_from("<H", data, pos)[0] + 256
            pos += 2
        elif fcs_flag == 2:
            (fcs,) = struct.unpack_from("<I", data, pos)
            pos += 4
        else:
            (fcs,) = struct.unpack_from("<Q", data, pos)
            pos += 8
        frame_start = len(out)
        prev_huff = None
        prev_tables = None
        rep = [1, 4, 8]  # frame-scoped repeat-offset history
        while True:
            bh = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # raw
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                out += data[pos : pos + 1] * bsize
                pos += 1
            elif btype == 2:
                prev_huff, prev_tables = _decode_block(
                    data[pos : pos + bsize], out, prev_huff, prev_tables, rep
                )
                pos += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if len(out) > max_output:
                raise ValueError("zstd: output too large")
            if last:
                break
        if fcs is not None and len(out) - frame_start != fcs:
            raise ValueError("zstd: frame content size mismatch")
        if checksum_flag:
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            got = _xxh64(bytes(out[frame_start:])) & 0xFFFFFFFF
            if got != want:
                raise ValueError("zstd: content checksum mismatch")
    return bytes(out)
