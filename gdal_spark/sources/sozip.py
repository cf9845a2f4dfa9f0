"""SOZip (Seek-Optimized ZIP) reader + writer, stdlib zlib only.

A SOZip archive is a perfectly standard .zip whose Deflate members are
cut into fixed-size uncompressed chunks, each compressed as an
INDEPENDENT raw-deflate stream terminated (for non-final chunks) by a
Z_SYNC_FLUSH + Z_FULL_FLUSH marker pair (the 9-byte sequence
00 00 FF FF 00 00 00 FF FF), so every chunk starts on a byte boundary
with no back-references into earlier chunks.  A hidden STORED member
named ``<dir>/.<name>.sozip.idx`` placed immediately AFTER the data
member (and excluded from the central directory) records where each
chunk starts in the compressed stream:

    uint32 LE  version        (1)
    uint32 LE  skip bytes     (0)
    uint32 LE  chunk size
    uint32 LE  offset size    (8)
    uint64 LE  uncompressed size
    uint64 LE  compressed size
    then ((uncompressed-1) // chunk) uint64 LE offsets — the compressed
    offset of chunk i for i = 1..n-1 (chunk 0 starts at 0)

which lets N tasks range-read and inflate N chunks concurrently.

Semantics re-derived (no code copied) from the reference:
  * port/cpl_vsil_gzip.cpp:4208-4296 — index discovery (the entry
    right after the member's compressed data) + validity rules
    (version==1, sizes consistent with the zip entry, 0 < chunk
    < 100 MiB, offsetSize==8, index STORED, exact expected size)
  * port/cpl_vsil_gzip.cpp:3682-3990 — VSISOZipHandle chunk reads:
    offset lookup, next-offset sanity (monotonic, <= compressed size,
    gap <= 13 + 2*chunk), per-chunk raw inflate
  * port/cpl_vsil_gzip.cpp:2270-2296 — writer flush discipline
    (independent deflate per chunk, SYNC+FULL flush markers)
  * port/cpl_minizip_zip.cpp:2380-2600 — CPLAddFileInZip: AUTO mode
    (index iff size > min-file-size, default 1 MiB), default chunk
    32 KiB, hidden-index naming, INCLUDE_IN_CENTRAL_DIRECTORY=NO
  * autotest/utilities/test_sozip.py — list/validate behaviors

Spark-first scale path: :func:`sozip_lines_df` parallel-reads one
member as text lines — the driver reads only the tiny index, builds a
chunk-range DataFrame, and each executor task range-reads + inflates
its own chunks, stitching lines across chunk boundaries with the
HDFS-TextInputFormat convention (skip to the first newline unless at
offset 0; read past your end to finish the last line).
"""

from __future__ import annotations

import io
import struct
import zlib

__all__ = [
    "sozip_create",
    "sozip_list",
    "sozip_validate",
    "sozip_member_info",
    "sozip_chunk_ranges",
    "sozip_read_chunks",
    "sozip_read_member",
    "sozip_lines_df",
]

DEFAULT_CHUNK_SIZE = 32 * 1024          # cpl_minizip_zip.cpp:2419
DEFAULT_MIN_FILE_SIZE = 1024 * 1024     # SOZIP_MIN_FILE_SIZE default "1M"

_LOCAL_SIG = 0x04034B50
_CENTRAL_SIG = 0x02014B50
_EOCD_SIG = 0x06054B50


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------


def _deflate_chunks(data: bytes, chunk_size: int) -> tuple[bytes, list[int]]:
    """Compress ``data`` as a sequence of independent raw-deflate chunk
    streams; returns (compressed bytes, offsets of chunks 1..n-1)."""
    out = io.BytesIO()
    offsets: list[int] = []
    n = len(data)
    pos = 0
    while pos < n:
        chunk = data[pos : pos + chunk_size]
        pos += len(chunk)
        last = pos >= n
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        piece = co.compress(chunk)
        if last:
            piece += co.flush(zlib.Z_FINISH)
        else:
            # SYNC then FULL flush: two byte-aligned empty-stored-block
            # markers, pigz-compatible (cpl_vsil_gzip.cpp:2280-2295)
            piece += co.flush(zlib.Z_SYNC_FLUSH)
            piece += co.flush(zlib.Z_FULL_FLUSH)
        out.write(piece)
        if not last:
            offsets.append(out.tell())
    return out.getvalue(), offsets


def _dos_time(ts: tuple[int, int, int, int, int, int] | None):
    if ts is None:
        ts = (1980, 1, 1, 0, 0, 0)
    y, mo, d, h, mi, s = ts
    return (h << 11) | (mi << 5) | (s // 2), ((y - 1980) << 9) | (mo << 5) | d


def _local_header(name: bytes, method: int, crc: int, csize: int,
                  usize: int) -> bytes:
    t, d = _dos_time(None)
    return struct.pack(
        "<IHHHHHIIIHH", _LOCAL_SIG, 20, 0, method, t, d, crc, csize, usize,
        len(name), 0,
    ) + name


def sozip_create(
    dest,
    members: list[tuple[str, bytes]],
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    enabled: str = "AUTO",
    min_file_size: int = DEFAULT_MIN_FILE_SIZE,
) -> dict:
    """Write a .zip at ``dest`` (path or file-like); members with
    ``enabled="YES"`` (or AUTO + size > min_file_size) get a SOZip
    hidden index.  Returns {name: {"sozip": bool, "nchunks": int}}."""
    close = False
    if isinstance(dest, (str, bytes)):
        f = open(dest, "wb")
        close = True
    else:
        f = dest
    report: dict[str, dict] = {}
    central: list[bytes] = []
    try:
        for name, data in members:
            nm = name.encode("utf-8")
            want = (enabled.upper() == "YES") or (
                enabled.upper() == "AUTO" and len(data) > min_file_size
            )
            want = want and len(data) > chunk_size
            crc = zlib.crc32(data) & 0xFFFFFFFF
            offset = f.tell()
            if want:
                comp, offsets = _deflate_chunks(data, chunk_size)
                f.write(_local_header(nm, 8, crc, len(comp), len(data)))
                f.write(comp)
                # hidden index member: STORED, right after the data,
                # NOT in the central directory
                slash = name.rfind("/")
                idx_name = (
                    name[: slash + 1] + "." + name[slash + 1 :] + ".sozip.idx"
                ).encode("utf-8")
                idx = struct.pack(
                    "<IIIIQQ", 1, 0, chunk_size, 8, len(data), len(comp)
                ) + b"".join(struct.pack("<Q", o) for o in offsets)
                f.write(
                    _local_header(
                        idx_name, 0, zlib.crc32(idx) & 0xFFFFFFFF,
                        len(idx), len(idx),
                    )
                )
                f.write(idx)
                report[name] = {"sozip": True, "nchunks": len(offsets) + 1}
                method, csize, usize = 8, len(comp), len(data)
            else:
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                comp = co.compress(data) + co.flush(zlib.Z_FINISH)
                f.write(_local_header(nm, 8, crc, len(comp), len(data)))
                f.write(comp)
                report[name] = {"sozip": False, "nchunks": 0}
                method, csize, usize = 8, len(comp), len(data)
            t, d = _dos_time(None)
            central.append(
                struct.pack(
                    "<IHHHHHHIIIHHHHHII", _CENTRAL_SIG, 20, 20, 0, method,
                    t, d, crc, csize, usize, len(nm), 0, 0, 0, 0, 0, offset,
                ) + nm
            )
        cd_off = f.tell()
        for c in central:
            f.write(c)
        cd_size = f.tell() - cd_off
        f.write(
            struct.pack(
                "<IHHHHIIH", _EOCD_SIG, 0, 0, len(central), len(central),
                cd_size, cd_off, 0,
            )
        )
    finally:
        if close:
            f.close()
    return report


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def _read_all(path_or_bytes) -> bytes:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return bytes(path_or_bytes)
    with open(path_or_bytes, "rb") as f:
        return f.read()


def _central_entries(buf: bytes) -> list[dict]:
    eocd = buf.rfind(struct.pack("<I", _EOCD_SIG))
    if eocd < 0:
        raise ValueError("not a zip: no end-of-central-directory")
    (_, _, _, n, _, cd_size, cd_off, _) = struct.unpack_from("<IHHHHIIH", buf, eocd)
    out = []
    pos = cd_off
    for _i in range(n):
        (sig, _, _, flags, method, _, _, crc, csize, usize, nlen, elen,
         clen, _, _, _, lho) = struct.unpack_from("<IHHHHHHIIIHHHHHII", buf, pos)
        if sig != _CENTRAL_SIG:
            raise ValueError("bad central directory entry")
        name = buf[pos + 46 : pos + 46 + nlen].decode("utf-8", "replace")
        out.append(
            {"name": name, "method": method, "flags": flags, "crc": crc,
             "csize": csize, "usize": usize, "local_offset": lho}
        )
        pos += 46 + nlen + elen + clen
    return out


def _local_data_start(buf: bytes, local_offset: int) -> int:
    (sig, _, _, _, _, _, _, _, _, nlen, elen) = struct.unpack_from(
        "<IHHHHHIIIHH", buf, local_offset
    )
    if sig != _LOCAL_SIG:
        raise ValueError("bad local file header")
    return local_offset + 30 + nlen + elen


def sozip_member_info(path_or_bytes, name: str | None = None) -> dict:
    """Info for one member (the first if ``name`` is None): zip entry
    fields + SOZip index discovery/validation flags, mirroring the
    reference's GetFileInfo (cpl_vsil_gzip.cpp:4208-4296)."""
    buf = _read_all(path_or_bytes)
    entries = _central_entries(buf)
    ent = None
    for e in entries:
        if name is None or e["name"] == name:
            ent = e
            break
    if ent is None:
        raise KeyError(f"member not found: {name}")
    info = dict(ent)
    info["data_start"] = _local_data_start(buf, ent["local_offset"])
    info.update(
        {"sozip_found": False, "sozip_valid": False, "chunk_size": 0,
         "index_data_start": 0, "nchunks": 0}
    )
    if ent["method"] != 8:
        return info
    # the index, if any, is the entry immediately after the compressed data
    after = info["data_start"] + ent["csize"]
    if after + 30 > len(buf) or struct.unpack_from("<I", buf, after)[0] != _LOCAL_SIG:
        return info
    (_, _, _, idx_method, _, _, _, idx_csize, idx_usize, nlen, elen) = (
        struct.unpack_from("<IHHHHHIIIHH", buf, after)
    )
    idx_name = buf[after + 30 : after + 30 + nlen].decode("utf-8", "replace")
    if ".sozip.idx" not in idx_name:
        return info
    info["sozip_found"] = True
    ds = after + 30 + nlen + elen
    info["index_data_start"] = ds
    if ds + 32 > len(buf):
        return info
    version, to_skip, chunk, osz = struct.unpack_from("<IIII", buf, ds)
    unc, comp = struct.unpack_from("<QQ", buf, ds + 16)
    info.update(
        {"sozip_version": version, "sozip_to_skip": to_skip,
         "chunk_size": chunk, "offset_size": osz}
    )
    valid = (
        version == 1
        and comp == ent["csize"]
        and unc == ent["usize"]
        and 0 < chunk < 100 * 1024 * 1024
        and osz == 8
        and idx_method == 0
        # Python's floor division makes (unc-1)//chunk == -1 for an
        # empty member (the reference uses unsigned math): guard unc==0
        # explicitly — an empty member stores zero offsets.
        and idx_usize == 32 + to_skip + (0 if unc == 0 else
                                         ((unc - 1) // chunk) * osz)
        and idx_csize == idx_usize
    )
    info["sozip_valid"] = valid
    if valid:
        info["nchunks"] = (unc + chunk - 1) // chunk if unc else 0
    return info


def sozip_list(path_or_bytes) -> list[dict]:
    """`sozip --list` analog: every central-directory member with its
    sizes and whether a valid SOZip index backs it."""
    buf = _read_all(path_or_bytes)
    return [sozip_member_info(buf, e["name"]) for e in _central_entries(buf)]


def sozip_chunk_ranges(path_or_bytes, info: dict) -> list[tuple[int, int, int]]:
    """(chunk_idx, compressed_start, compressed_end) per chunk, offsets
    relative to the member's compressed stream."""
    if not info["sozip_valid"]:
        raise ValueError("member has no valid SOZip index")
    buf = _read_all(path_or_bytes)
    base = info["index_data_start"] + 32 + info["sozip_to_skip"]
    n = info["nchunks"]
    offs = [0] + [
        struct.unpack_from("<Q", buf, base + 8 * i)[0] for i in range(n - 1)
    ] + [info["csize"]]
    return [(i, offs[i], offs[i + 1]) for i in range(n)]


def _inflate_range(comp: bytes) -> bytes:
    return zlib.decompressobj(-15).decompress(comp)


def sozip_read_chunks(path: str, info: dict,
                      ranges: list[tuple[int, int, int]]) -> list[bytes]:
    """Range-read + inflate the given chunks — the per-task kernel of
    the parallel read path; opens the archive once, seeks per chunk."""
    out = []
    with open(path, "rb") as f:
        for _idx, start, end in ranges:
            if end <= start or end > info["csize"] or (
                end - start > 13 + 2 * info["chunk_size"]
            ):
                raise ValueError("invalid chunk offsets in SOZip index")
            f.seek(info["data_start"] + start)
            out.append(_inflate_range(f.read(end - start)))
    return out


def sozip_read_member(path_or_bytes, name: str | None = None) -> bytes:
    """Whole-member read. Uses per-chunk inflation when a valid index
    exists (exercising the same kernel as the parallel path), plain
    streaming inflate otherwise."""
    buf = _read_all(path_or_bytes)
    info = sozip_member_info(buf, name)
    data = buf[info["data_start"] : info["data_start"] + info["csize"]]
    if info["method"] == 0:
        return data
    if info["sozip_valid"]:
        parts = [
            _inflate_range(data[s:e])
            for _i, s, e in sozip_chunk_ranges(buf, info)
        ]
        return b"".join(parts)
    return _inflate_range(data)


def sozip_validate(path_or_bytes, name: str | None = None) -> dict:
    """`sozip --validate` analog: structural validity + every chunk
    inflates to the expected size + reassembled CRC32 matches the zip
    entry. Returns {"valid": bool, "reason": str|None, ...}."""
    buf = _read_all(path_or_bytes)
    info = sozip_member_info(buf, name)
    if not info["sozip_found"]:
        return {**info, "valid": False, "reason": "no .sozip.idx member"}
    if not info["sozip_valid"]:
        return {**info, "valid": False, "reason": "index header invalid"}
    data = buf[info["data_start"] : info["data_start"] + info["csize"]]
    prev = 0
    total = bytearray()
    for i, s, e in sozip_chunk_ranges(buf, info):
        if s < prev or e <= s or e > info["csize"]:
            return {**info, "valid": False,
                    "reason": f"non-monotonic offset at chunk {i}"}
        if e - s > 13 + 2 * info["chunk_size"]:
            return {**info, "valid": False,
                    "reason": f"chunk {i} compressed span too large"}
        raw = _inflate_range(data[s:e])
        want = min(info["chunk_size"], info["usize"] - i * info["chunk_size"])
        if len(raw) != want:
            return {**info, "valid": False,
                    "reason": f"chunk {i} inflated to {len(raw)} != {want}"}
        prev = e
        total += raw
    if (zlib.crc32(bytes(total)) & 0xFFFFFFFF) != info["crc"]:
        return {**info, "valid": False, "reason": "CRC mismatch"}
    return {**info, "valid": True, "reason": None}


# --------------------------------------------------------------------------
# Spark parallel read
# --------------------------------------------------------------------------


def sozip_lines_df(spark, zip_path: str, name: str | None = None,
                   chunks_per_task: int = 1):
    """Parallel text-line read of one SOZip member: the driver parses
    only the tiny index; each executor task range-reads + inflates its
    own chunk span, splitting lines with the TextInputFormat
    convention (a task owns a line iff the line STARTS in its span:
    skip to the first newline unless starting at offset 0, and read
    past the end — inflating following chunks — to finish the last
    line).  Returns DataFrame(chunk0 int, line_no long, line string)
    where line_no is the 0-based index within the task's span."""
    import pandas as pd
    from pyspark.sql import types as T

    info = sozip_member_info(zip_path, name)
    ranges = sozip_chunk_ranges(zip_path, info)
    spans = [
        ranges[i : i + chunks_per_task]
        for i in range(0, len(ranges), chunks_per_task)
    ]
    rows = [
        (sp[0][0], sp[0][1], sp[-1][2], i < len(spans) - 1)
        for i, sp in enumerate(spans)
    ]
    sch_in = "chunk0 int, cstart long, cend long, has_next boolean"
    sch = T.StructType(
        [
            T.StructField("chunk0", T.IntegerType()),
            T.StructField("line_no", T.LongType()),
            T.StructField("line", T.StringType()),
        ]
    )
    b_info = spark.sparkContext.broadcast(
        {k: v for k, v in info.items() if not isinstance(v, (bytes, bytearray))}
    )
    b_ranges = spark.sparkContext.broadcast(ranges)

    def run(batches):
        inf = b_info.value
        rg = b_ranges.value
        for pdf in batches:
            out = []
            with open(zip_path, "rb") as f:

                def read_span(s, e):
                    f.seek(inf["data_start"] + s)
                    return _inflate_range(f.read(e - s))

                for chunk0, cstart, cend, has_next in zip(
                    pdf["chunk0"], pdf["cstart"], pdf["cend"], pdf["has_next"]
                ):
                    data = read_span(cstart, cend)
                    # discard through the first newline unless we own
                    # offset 0 (the line belongs to whichever task
                    # contains its START); a span wholly inside one
                    # line yields nothing and may not read forward
                    own = True
                    if chunk0 > 0:
                        nl = data.find(b"\n")
                        if nl < 0:
                            data, own = b"", False
                        else:
                            data = data[nl + 1 :]
                    # ALWAYS read one line past the end (through the
                    # first newline of the following chunks) — the next
                    # task discards it unconditionally, so each
                    # boundary line is owned exactly once
                    if own and has_next:
                        nxt = next(
                            (i for i, (_, s, _e) in enumerate(rg) if s == cend),
                            None,
                        )
                        while nxt is not None and nxt < len(rg):
                            _, s, e = rg[nxt]
                            tail = read_span(s, e)
                            nl = tail.find(b"\n")
                            if nl >= 0:
                                data += tail[: nl + 1]
                                break
                            data += tail
                            nxt += 1
                    text = data.decode("utf-8", "replace")
                    lines = text.split("\n")
                    if lines and lines[-1] == "":
                        lines.pop()
                    out.extend(
                        (int(chunk0), j, ln) for j, ln in enumerate(lines)
                    )
            yield pd.DataFrame(out, columns=["chunk0", "line_no", "line"])

    n_tasks = max(1, len(rows))
    return (
        spark.createDataFrame(rows, sch_in)
        .repartition(min(n_tasks, 256), "chunk0")
        .mapInPandas(run, sch)
    )
