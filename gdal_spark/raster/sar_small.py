"""Small SAR-family drivers: GFF, COASP, AirSAR, JAXA PALSAR.

Pure-numpy re-derivations of four compact reference readers:

GFF (frmts/gff/gff_dataset.cpp) — Sandia GSAT File Format:
  "GSATIMG" magic; little-endian header with version at 8 (minor u2,
  major u2), header length u4 at 12, BPP u4 at 56, frame count u4,
  image type u4, row-major u4, range count u4, azimuth count u4.
  Image type 0 -> Byte, 1 -> CInt16 when BPP==4 else CInt32,
  2 -> CFloat32; complex images store 2x the X-count in the
  range/azimuth fields (gff_dataset.cpp:283-297), row-major flag
  picks which of rg/az is X.

COASP (frmts/coasp/coasp_dataset.cpp) — DRDC Configurable Airborne
  SAR Processor: a text .hdr starting "time_first_datarec" with
  whitespace-tokenized key/value lines (number_lines / number_samples),
  plus per-polarization .rc binaries named by substituting hh/hv/vh/vv
  in the header basename. Pixels are big-endian complex float32
  (8 bytes: I then Q — the reference byte-swaps on LSB hosts,
  coasp_dataset.cpp:318-321). Four bands present ->
  MATRIX_REPRESENTATION=SCATTERING.

AirSAR (frmts/airsar/airsardataset.cpp) — JPL AirSAR polarimetric
  compressed Stokes matrices: 50-byte header records split on '=' or
  the last double-space, keys underscored and prefixed MH_/PH_/CH_;
  10 signed bytes per pixel expand to the 10-element Stokes matrix
  (airsardataset.cpp:316-334) and then to the 6 symmetrized
  covariance bands C11/C12/C13/C22/C23/C33 (airsardataset.cpp:168-237).

JAXA PALSAR (frmts/jaxapalsar/jaxapalsardataset.cpp) — ALOS PALSAR
  level 1.1/1.5 CEOS products: VOL- volume directory identify
  (record seq 1, subtype/type 192/192/18/18, length 360), IMG-{POL}-
  band files with ASCII header fields (bits/sample at 216, samples per
  group at 220, line count at 236, SAR record length at 186), LED-
  leader metadata (looks, spacings, projection name, corner GCPs).
  The band read replicates the reference's record-offset arithmetic
  verbatim, including its (row-1)*record quirk
  (jaxapalsardataset.cpp:333-336).

No code was copied from the reference (C++); the formats were
re-derived from reading those files' logic.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "gff_decode",
    "coasp_read",
    "airsar_read",
    "palsar_identify",
    "palsar_read",
]

_SQRT2 = 1.4142135623730951


# ---------------------------------------------------------------- GFF

def gff_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a Sandia GFF scene -> (array, meta).

    Complex types return complex64 arrays (CInt16/CInt32 sources are
    widened; the integer I/Q pair semantics are preserved exactly).
    """
    if len(data) < 64 or data[:7].upper() != b"GSATIMG":
        raise ValueError("not a GFF file (GSATIMG magic missing)")
    h = memoryview(data)
    u2 = lambda o: int.from_bytes(h[o:o + 2], "little")
    u4 = lambda o: int.from_bytes(h[o:o + 4], "little")
    minor, major = u2(8), u2(10)
    hdr_len = u4(12)
    endianness = u2(54)
    bpp = u4(56)
    frame_cnt = u4(60)
    image_type = u4(64)
    row_major = u4(68)
    rg_cnt = u4(72)
    az_cnt = u4(76)

    if image_type == 0:
        dt, sample_size, complex_halved = np.dtype("u1"), 1, 1
    elif image_type == 1:
        if bpp == 4:
            dt, sample_size = np.dtype("<i2"), 4
        else:
            dt, sample_size = np.dtype("<i4"), 8
        complex_halved = 2
    elif image_type == 2:
        dt, sample_size, complex_halved = np.dtype("<f4"), 8, 2
    else:
        raise ValueError(f"GFF: unknown image type {image_type}")

    if row_major:
        w, hgt = rg_cnt // complex_halved, az_cnt
    else:
        w, hgt = az_cnt // complex_halved, rg_cnt
    if w <= 0 or hgt <= 0:
        raise ValueError(f"GFF: invalid raster dimensions {w} x {hgt}")

    n = w * hgt
    if image_type == 0:
        arr = np.frombuffer(data, dt, n, hdr_len).reshape(hgt, w)
    else:
        iq = np.frombuffer(data, dt, 2 * n, hdr_len).astype(np.float32)
        arr = (iq[0::2] + 1j * iq[1::2]).astype(np.complex64).reshape(hgt, w)
    meta = {
        "VERSION": f"{major}.{minor}",
        "HEADER_LENGTH": hdr_len,
        "ENDIANNESS": endianness,
        "BPP": bpp,
        "FRAME_COUNT": frame_cnt,
        "IMAGE_TYPE": image_type,
        "ROW_MAJOR": row_major,
    }
    return arr, meta


# -------------------------------------------------------------- COASP

_POLS = ("hh", "hv", "vh", "vv")


def _coasp_meta(hdr_text: str) -> dict:
    """Whitespace-tokenized key/value lines; multi-token values joined
    by single spaces (COASPMetadataReader::GetNextItem)."""
    meta: dict[str, str] = {}
    for line in hdr_text.splitlines():
        toks = line.split()
        if len(toks) >= 2 and toks[0] not in meta:
            meta[toks[0]] = " ".join(toks[1:])
    return meta


def coasp_read(
    hdr_name: str, hdr_text: str, files: dict[str, bytes]
) -> tuple[list[tuple[str, np.ndarray]], dict]:
    """Open a COASP scene from its .hdr text plus sibling binaries.

    ``files`` maps sibling filenames -> bytes; the per-polarization
    binaries are found by substituting hh/hv/vh/vv into the header
    basename with extension .rc (coasp_dataset.cpp:404-528). Returns
    ordered (polarization, complex64 array) bands + the header dict.
    """
    if not hdr_text.lstrip().startswith("time_first_datarec"):
        raise ValueError("not a COASP header (time_first_datarec missing)")
    meta = _coasp_meta(hdr_text)
    h = int(meta["number_lines"])
    w = int(meta["number_samples"])

    base = hdr_name.rsplit("/", 1)[-1]
    if "." in base:
        base = base[: base.rindex(".")]
    # the reference truncates the last TWO characters of the basename
    # before substituting the channel code: it allocates len-1 bytes and
    # NUL-terminates at len-2 (coasp_dataset.cpp:396-404)
    base = base[:-2]
    chan_at = -1
    for pol in _POLS:
        if pol in base:
            chan_at = base.index(pol)
            break
    if chan_at < 0:
        raise ValueError("COASP: no polarization code in basename")

    bands = []
    for pol in _POLS:
        name = base[:chan_at] + pol + base[chan_at + 2:] + ".rc"
        payload = files.get(name)
        if payload is None:
            continue
        iq = np.frombuffer(payload, ">f4", 2 * w * h).astype(np.float32)
        arr = (iq[0::2] + 1j * iq[1::2]).astype(np.complex64).reshape(h, w)
        bands.append((pol, arr))
    if not bands:
        raise ValueError("COASP: unable to find any data")
    out_meta = dict(meta)
    if len(bands) == 4:
        out_meta["MATRIX_REPRESENTATION"] = "SCATTERING"
    return bands, out_meta


# ------------------------------------------------------------- AirSAR

def _airsar_header(data: bytes, offset: int, prefix: str, max_lines: int) -> dict:
    """50-byte header records -> {PREFIX_KEY: value} (ReadHeader)."""
    md: dict[str, str] = {}
    for _ in range(max_lines):
        rec = data[offset:offset + 50]
        if len(rec) < 50:
            break
        offset += 50
        if b"\x00" in rec:
            rec = rec[: rec.index(b"\x00")]
        txt = rec.decode("latin-1")
        if not txt.strip():
            break
        if any(ord(c) > 127 or ord(c) < 10 for c in txt):
            break
        pivot = txt.find("=")
        if pivot < 0:
            # split on the LAST double-space
            for i in range(len(txt) - 2, -1, -1):
                if txt[i] == " " and txt[i + 1] == " ":
                    pivot = i
                    break
        if pivot < 0:
            break
        value = txt[pivot + 1:].lstrip().rstrip()
        key = txt[:pivot].rstrip()
        key = key.replace(" ", "_").replace(":", "_").replace(",", "_")
        md[f"{prefix}_{key}"] = value
    return md


def airsar_read(data: bytes) -> tuple[list[tuple[str, np.ndarray]], dict]:
    """Decode a JPL AirSAR compressed-Stokes scene to the 6 symmetrized
    covariance bands -> ([(name, complex64 array) x6], metadata)."""
    head = data[:50].decode("latin-1", "replace")
    if not head.upper().startswith("RECORD LENGTH IN BYTES"):
        raise ValueError("not an AirSAR file")
    probe = data[:800].decode("latin-1", "replace")
    if "COMPRESSED" not in probe or "JPL AIRCRAFT" not in probe:
        raise ValueError("not a compressed JPL AirSAR file")

    md = _airsar_header(data, 0, "MH", 20)
    w = int(md["MH_NUMBER_OF_SAMPLES_PER_RECORD"])
    h = int(md["MH_NUMBER_OF_LINES_IN_IMAGE"])
    rec_len = int(md["MH_RECORD_LENGTH_IN_BYTES"])
    data_start = int(md["MH_BYTE_OFFSET_OF_FIRST_DATA_RECORD"])

    ph_off = md.get("MH_BYTE_OFFSET_OF_PARAMETER_HEADER")
    if ph_off is not None:
        ph_off = int(ph_off)
        md.update(_airsar_header(data, ph_off, "PH", 100))
        md.update(_airsar_header(data, ph_off + rec_len, "CH", 18))
    md["MATRIX_REPRESENTATION"] = "SYMMETRIZED_COVARIANCE"

    # decode all lines at once: (h, w, 10) signed bytes
    raw = np.empty((h, w * 10), np.int8)
    for y in range(h):
        off = data_start + y * rec_len
        raw[y] = np.frombuffer(data, np.int8, w * 10, off)
    b = raw.reshape(h, w, 10).astype(np.float64)

    m11 = (b[..., 1] / 254.0 + 1.5) * np.power(2.0, b[..., 0])
    m12 = b[..., 2] * m11 / 127.0
    m13 = b[..., 3] * np.abs(b[..., 3]) * m11 / (127.0 * 127.0)
    m14 = b[..., 4] * np.abs(b[..., 4]) * m11 / (127.0 * 127.0)
    m23 = b[..., 5] * np.abs(b[..., 5]) * m11 / (127.0 * 127.0)
    m24 = b[..., 6] * np.abs(b[..., 6]) * m11 / (127.0 * 127.0)
    m33 = b[..., 7] * m11 / 127.0
    m34 = b[..., 8] * m11 / 127.0
    m44 = b[..., 9] * m11 / 127.0
    m22 = m11 - m33 - m44

    def cplx(re, im):
        out = np.empty(re.shape, np.complex64)
        out.real = re.astype(np.float32)
        out.imag = im.astype(np.float32)
        return out

    zero = np.zeros_like(m11)
    bands = [
        ("Covariance_11", cplx(m11 + m22 + 2 * m12, zero)),
        ("Covariance_12", cplx(_SQRT2 * (m13 + m23), -_SQRT2 * (m24 + m14))),
        ("Covariance_13", cplx(2 * m33 + m22 - m11, -2 * m34)),
        ("Covariance_22", cplx(2 * (m11 - m22), zero)),
        ("Covariance_23", cplx(_SQRT2 * (m13 - m23), _SQRT2 * (m24 - m14))),
        ("Covariance_33", cplx(m11 + m22 - 2 * m12, zero)),
    ]
    return bands, md


# -------------------------------------------------------- JAXA PALSAR

def palsar_identify(vol: bytes, filename: str = "") -> bool:
    """Volume-directory identify (jaxapalsardataset.cpp:505-557)."""
    if len(vol) < 360:
        return False
    if vol[60:62].upper() != b"AL":
        return False
    base = filename.rsplit("/", 1)[-1]
    if "." in base:
        base = base[: base.rindex(".")]
    if base and not (len(base) >= 9 and base[4:9].upper() == "ALPSR"):
        return False
    seq = int.from_bytes(vol[0:4], "big")
    subtype, rtype, second, third = vol[4], vol[5], vol[6], vol[7]
    length = int.from_bytes(vol[8:12], "big")
    return (seq, subtype, rtype, second, third, length) == (1, 192, 192, 18, 18, 360)


def _palsar_band(img: bytes) -> tuple[np.ndarray, dict]:
    """Decode one IMG-{POL} file (header fields are ASCII numbers)."""
    bits = int(img[216:220])
    spg = int(img[220:224])
    if bits == 32 and spg == 2:
        level, nbytes, prefix = "1.1", 8, 412
    elif bits == 8 and spg == 2:
        raise ValueError("ALOS PALSAR Level 1.0 products are not supported")
    else:
        level, nbytes, prefix = "1.5", 2, 192
    h = int(img[236:244])
    rec = int(img[186:192])
    w = (rec - prefix) // ((bits // 8) * spg)

    rows = []
    for y in range(h):
        # verbatim reference arithmetic incl. the (y-1) quirk
        # (jaxapalsardataset.cpp:333-336); the reference's unsigned
        # file offset underflows for row 0 on wide images and the read
        # silently fails — degrade to a zero row instead of crashing
        off = 720 + (y - 1) * rec + prefix
        if off < 0 or off + w * (8 if level == "1.1" else 2) > len(img):
            rows.append(np.zeros(w, np.complex64 if level == "1.1"
                                 else np.uint16))
            continue
        if level == "1.1":
            iq = np.frombuffer(img, ">f4", 2 * w, off).astype(np.float32)
            rows.append((iq[0::2] + 1j * iq[1::2]).astype(np.complex64))
        else:
            rows.append(np.frombuffer(img, ">u2", w, off))
    return np.vstack(rows), {"PRODUCT_LEVEL": level, "RECORD_SIZE": rec}


def _ascii_float(buf: bytes, off: int, n: int = 16) -> float:
    try:
        return float(buf[off:off + n])
    except ValueError:
        return 0.0


def palsar_read(
    vol_name: str, files: dict[str, bytes]
) -> tuple[list[tuple[str, np.ndarray]], dict, list[tuple]]:
    """Open an ALOS PALSAR product from its VOL- file and siblings.

    Returns (bands as (POL, array), metadata, corner GCPs as
    (id, pixel, line, x, y) — populated for level 1.5 when the LED-
    leader is present, replicating ReadMetadata).
    """
    vol = files.get(vol_name)
    if vol is None or not palsar_identify(vol, vol_name):
        raise ValueError("not a JAXA PALSAR volume directory")
    suffix = vol_name.rsplit("/", 1)[-1][3:]

    bands: list[tuple[str, np.ndarray]] = []
    meta: dict = {"SENSOR_BAND": "L", "RANGE_LOOKS": "1.0"}
    for pol in ("HH", "HV", "VH", "VV"):
        img = files.get(f"IMG-{pol}{suffix}")
        if img is None:
            continue
        arr, bmeta = _palsar_band(img)
        meta.update(bmeta)
        bands.append((pol, arr))
    if not bands:
        raise ValueError("PALSAR: unable to find any image data")

    gcps: list[tuple] = []
    level = meta.get("PRODUCT_LEVEL")
    meta["AZIMUTH_LOOKS"] = "1.0"
    led = files.get(f"LED{suffix}")
    if led is not None and level == "1.5":
        LFD, DSS = 720, 4096
        meta["AZIMUTH_LOOKS"] = f"{_ascii_float(led, LFD + 1174):-.1f}"
        meta["PIXEL_SPACING"] = f"{_ascii_float(led, LFD + DSS + 92):-.1f}"
        meta["LINE_SPACING"] = meta["PIXEL_SPACING"]
        meta["PROJECTION_NAME"] = (
            led[LFD + DSS + 412:LFD + DSS + 444].decode("latin-1").strip()
        )
        h = bands[0][1].shape[0]
        base = LFD + DSS + 1072
        lats_lons = [_ascii_float(led, base + 16 * i) for i in range(8)]
        # (id, pixel, line, lon, lat) — note the reference reuses
        # nRasterYSize for the pixel coordinate of the right edge
        gcps = [
            ("1", 0.5, 0.5, lats_lons[1], lats_lons[0]),
            ("2", h - 0.5, 0.5, lats_lons[3], lats_lons[2]),
            ("3", h - 0.5, h - 0.5, lats_lons[5], lats_lons[4]),
            ("4", 0.5, h - 0.5, lats_lons[7], lats_lons[6]),
        ]
    if len(bands) == 4:
        meta["MATRIX_REPRESENTATION"] = "SCATTERING"
    return bands, meta, gcps
