"""MSG Native (EUMETSAT Meteosat Second Generation .nat) reader
(frmts/msgn — re-derived, no code copied; the on-disk layout is the
#pragma pack(1) struct set in msg_basic_types.h).

A .nat product is text headers + binary packets, all big-endian:

  MAIN_PROD_HEADER (3674 bytes): 80-byte "name : value" PH_DATA
  entries — identify requires the first to read
  "FormatName                  : NATIVE" — five 62-byte PH_DATA_ID
  entries (15Header/15Data/15Trailer sizes + addresses), 1364 slack
  bytes, then 19 more PH_DATA (SNIT carries the nominal image time).
  SECONDARY_PROD_HEADER (1120 bytes): 14 PH_DATA incl.
  selectedBandIds ('X' per selected channel) and the selected
  rectangle (south/north lines, east/west columns).

  15Data: per line and band a packet of GP_PK_HEADER (22 bytes,
  packetLength at +18), GP_PK_SH1 (16) and SUB_VISIRLINE (27: line
  number at +13, channel id at +17, validity at +24) followed by
  MSB-first 10-bit packed samples; bytes_per_line =
  packetLength - 42, packet stride = packetLength + 23, interline
  spacing = sum of selected band strides (HRV counts three). Rows are
  stored bottom-up and pixels east-to-west (both flipped on read,
  msgndataset.cpp IReadBlock).

  15Header: the radiometric processing record at a fixed offset
  (satellite status 60134 + image acquisition 700 + celestial events
  326058 + image description 101 + the packet header prefix 39)
  carries 12 (slope, offset) calibration doubles after 72 flag bytes;
  101 bytes before it sits the image description record (projection
  byte, SSP longitude float, VISIR/HRV reference grids and planned
  coverages).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["MsgnFile", "msgn_open", "msgn_write"]

MPH_SIZE = 6 * 80 + 5 * 62 + 1364 + 19 * 80      # 3674
SPH_SIZE = 14 * 80
GP_PK_HEADER_SIZE = 22
GP_PK_SH1_SIZE = 16
SUB_VISIRLINE_SIZE = 27
RAD_RECORD_OFFSET = 60134 + 700 + 326058 + 101   # msg_basic_types.h:21-29
NUM_CHANNELS = 12
NODATA = 0  # MSGN_NODATA_VALUE for raw counts


def _ph(data: bytes, off: int) -> tuple[str, str]:
    name = data[off:off + 30].decode("latin-1").rstrip().rstrip(":").rstrip()
    value = data[off + 30:off + 80].decode("latin-1").strip()
    return name, value


class MsgnFile:
    def __init__(self, data: bytes):
        if not data.startswith(b"FormatName                  : NATIVE"):
            raise ValueError("not an MSG native file")
        self.data = data
        self.mph: dict[str, str] = {}
        for i in range(6):
            k, v = _ph(data, i * 80)
            self.mph[k] = v
        self.locations: dict[str, tuple[int, int]] = {}
        for i in range(5):
            off = 480 + i * 62
            name = data[off:off + 30].decode("latin-1").strip()
            size = data[off + 30:off + 46].decode("latin-1").strip()
            addr = data[off + 46:off + 62].decode("latin-1").strip()
            if name:
                try:
                    self.locations[name] = (int(size), int(addr))
                except ValueError:
                    pass
        base = 480 + 310 + 1364
        for i in range(19):
            k, v = _ph(data, base + i * 80)
            self.mph[k] = v
        self.sph: dict[str, str] = {}
        sph_names = [
            "abid", "smod", "apxs", "avpa", "lscd", "lmap", "qdlc",
            "qdlp", "qqai", "SelectedBandIDs", "SouthLineSelectedRectangle",
            "NorthLineSelectedRectangle", "EastColumnSelectedRectangle",
            "WestColumnSelectedRectangle",
        ]
        for i, nm in enumerate(sph_names):
            k, v = _ph(data, MPH_SIZE + i * 80)
            self.sph[k or nm] = v
            self.sph[nm] = v

        hdr = next((v for k, v in self.locations.items()
                    if k.startswith("15Header")), (0, 0))
        dat = next((v for k, v in self.locations.items()
                    if k.startswith("15Data")), (0, 0))
        self.header_offset = hdr[1]
        self.data_offset = dat[1]

        north = int(self.sph["NorthLineSelectedRectangle"])
        south = int(self.sph["SouthLineSelectedRectangle"])
        west = int(self.sph["WestColumnSelectedRectangle"])
        east = int(self.sph["EastColumnSelectedRectangle"])
        self.line_start = south
        self.col_start = east
        self.lines = north - (south - 1) if south > 0 else north
        self.columns = west - (east - 1) if east > 0 else west

        bands_txt = self.sph["SelectedBandIDs"]
        self.band_selected = [c == "X" for c in bands_txt[:NUM_CHANNELS]]

        self._scan_packets()
        self._read_header_records()

    # -- packet scan -------------------------------------------------------
    def _scan_packets(self) -> None:
        d = self.data
        pos = self.data_offset
        todo = list(self.band_selected)
        self.visir_bytes_per_line = 0
        self.visir_packet_size = 0
        self.hrv_bytes_per_line = 0
        self.hrv_packet_size = 0
        self.interline_spacing = 0
        self.band_order: list[int] = []
        guard = 0
        while any(todo) and guard < 64:
            guard += 1
            if pos + GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE + \
                    SUB_VISIRLINE_SIZE > len(d):
                raise ValueError("MSGN: truncated data section")
            (packet_len,) = struct.unpack_from(">I", d, pos + 18)
            vis = pos + GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE
            channel = d[vis + 17]
            if packet_len < GP_PK_SH1_SIZE + SUB_VISIRLINE_SIZE - 1:
                raise ValueError("MSGN: insane packet length")
            if channel == 0 or channel > NUM_CHANNELS:
                raise ValueError("MSGN: invalid channel id")
            if todo[channel - 1]:
                todo[channel - 1] = False
                bpl = packet_len - (GP_PK_SH1_SIZE + SUB_VISIRLINE_SIZE - 1)
                psz = packet_len + GP_PK_HEADER_SIZE + 1
                if channel != 12:
                    self.visir_bytes_per_line = bpl
                    self.visir_packet_size = psz
                    self.interline_spacing += psz
                else:
                    self.hrv_bytes_per_line = bpl
                    self.hrv_packet_size = psz
                    self.interline_spacing += 3 * psz
                self.band_order.append(channel)
            pos += GP_PK_HEADER_SIZE + packet_len + 1

    # -- 15Header records ---------------------------------------------------
    def _read_header_records(self) -> None:
        d = self.data
        prefix = GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE + 1
        rad_off = RAD_RECORD_OFFSET + self.header_offset + prefix
        self.calibration: list[tuple[float, float]] = []
        if rad_off + 72 + 12 * 16 <= len(d):
            cal = rad_off + 6 * 12
            for i in range(NUM_CHANNELS):
                slope, offset = struct.unpack_from(">dd", d, cal + 16 * i)
                self.calibration.append((slope, offset))
        idr_off = rad_off - 101
        self.image_description: dict = {}
        if 0 <= idr_off and idr_off + 101 <= len(d):
            proj = d[idr_off]
            (ssp,) = struct.unpack_from(">f", d, idr_off + 1)
            vis = struct.unpack_from(">iiffB", d, idr_off + 5)
            hrv = struct.unpack_from(">iiffB", d, idr_off + 22)
            self.image_description = {
                "type_of_projection": proj,
                "longitude_of_ssp": ssp,
                "visir_grid": {"lines": vis[0], "columns": vis[1],
                               "line_step": vis[2], "col_step": vis[3]},
                "hrv_grid": {"lines": hrv[0], "columns": hrv[1],
                             "line_step": hrv[2], "col_step": hrv[3]},
            }

    # -- band read ----------------------------------------------------------
    def read_band(self, channel: int) -> np.ndarray:
        """1-based channel id (1..11 VISIR, 12 HRV) -> (lines, cols)
        uint16 raw counts, north-up and west-east like the reference."""
        if not self.band_selected[channel - 1]:
            raise ValueError(f"MSGN: channel {channel} not selected")
        hrv = channel == 12
        bpl = self.hrv_bytes_per_line if hrv else self.visir_bytes_per_line
        psz = self.hrv_packet_size if hrv else self.visir_packet_size
        band_in_file = self.band_order.index(channel) + 1
        nsamples = (bpl * 8) // 10
        height = self.lines * (3 if hrv else 1)
        width = nsamples
        data_length = bpl + SUB_VISIRLINE_SIZE
        out = np.full((height, width), NODATA, np.uint16)
        for y in range(height):
            inv = height - 1 - y
            if not hrv:
                off = (self.data_offset
                       + self.interline_spacing * inv
                       + (band_in_file - 1) * psz
                       + (psz - data_length))
            else:
                off = (self.data_offset
                       + self.interline_spacing * (inv // 3 + 1)
                       - psz * (3 - (inv % 3))
                       + (psz - data_length))
            if off < 0 or off + data_length > len(self.data):
                continue
            validity = self.data[off + 24]
            payload = np.frombuffer(self.data, np.uint8, bpl,
                                    off + SUB_VISIRLINE_SIZE)
            bits = np.unpackbits(payload)[: nsamples * 10].reshape(-1, 10)
            vals = (bits.astype(np.uint16)
                    * (1 << np.arange(9, -1, -1, dtype=np.uint16))).sum(1)
            if validity == 1:
                out[y, :] = vals[::-1]  # east->west storage mirrored
        return out

    def radiance(self, channel: int) -> np.ndarray:
        slope, offset = self.calibration[channel - 1]
        return self.read_band(channel).astype(np.float64) * slope + offset


def msgn_open(data: bytes) -> MsgnFile:
    return MsgnFile(data)


# ----------------------------------------------------------------- write

def msgn_write(bands: dict[int, np.ndarray],
               calibration: list[tuple[float, float]] | None = None,
               longitude_of_ssp: float = 0.0) -> bytes:
    """Minimal .nat writer for round trips: bands maps channel id ->
    (lines, cols) uint16 (<1024) arrays; all VISIR channels must share
    a shape, HRV (12) must have 3x the lines."""
    chans = sorted(bands)
    ref = bands[[c for c in chans if c != 12][0]] if any(
        c != 12 for c in chans) else bands[12]
    lines = ref.shape[0] if any(c != 12 for c in chans) else \
        bands[12].shape[0] // 3

    def ph(name: str, value: str) -> bytes:
        return (name.ljust(28)[:28] + ": ").encode() + \
            value.ljust(48)[:48].encode() + b"\r\n"

    def pack10(row: np.ndarray) -> bytes:
        bits = ((row[::-1].astype(np.uint16)[:, None]
                 >> np.arange(9, -1, -1)) & 1).astype(np.uint8).ravel()
        pad = (-len(bits)) % 8
        bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
        return np.packbits(bits).tobytes()

    # build the data section
    payloads: list[bytes] = []
    for y in range(lines - 1, -1, -1):
        for c in chans:
            # HRV sub-lines are stored bottom-up within the group
            rows = ([bands[c][y]] if c != 12 else
                    [bands[12][3 * y + k] for k in (2, 1, 0)])
            for ri, row in enumerate(rows):
                raw = pack10(np.asarray(row, np.uint16))
                packet_len = (GP_PK_SH1_SIZE + SUB_VISIRLINE_SIZE - 1
                              + len(raw))
                hdr = bytearray(GP_PK_HEADER_SIZE)
                struct.pack_into(">I", hdr, 18, packet_len)
                sh1 = bytes(GP_PK_SH1_SIZE)
                vis = bytearray(SUB_VISIRLINE_SIZE)
                line_no = (y + 1) if c != 12 else (3 * y + ri + 1)
                struct.pack_into(">i", vis, 13, line_no)
                vis[17] = c
                vis[24] = 1  # validity
                payloads.append(bytes(hdr) + sh1 + bytes(vis) + raw)

    # 15Header with the radiometric + image description records
    prefix = GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE + 1
    hdr_block = bytearray(RAD_RECORD_OFFSET + prefix + 72 + 12 * 16)
    idr_off = RAD_RECORD_OFFSET + prefix - 101
    struct.pack_into(">f", hdr_block, idr_off + 1, longitude_of_ssp)
    struct.pack_into(">iiffB", hdr_block, idr_off + 5,
                     3712, 3712, 3.0, 3.0, 2)
    struct.pack_into(">iiffB", hdr_block, idr_off + 22,
                     11136, 11136, 1.0, 1.0, 2)
    cal = RAD_RECORD_OFFSET + prefix + 72
    for i in range(NUM_CHANNELS):
        s, o = (calibration[i] if calibration and i < len(calibration)
                else (0.02, -1.0))
        struct.pack_into(">dd", hdr_block, cal + 16 * i, s, o)

    header_offset = MPH_SIZE + SPH_SIZE
    data_offset = header_offset + len(hdr_block)
    data_block = b"".join(payloads)

    mph = bytearray()
    mph += ph("FormatName", "NATIVE")
    mph += ph("FormatDocumentName", "MSG synthetic")
    mph += ph("FormatDocumentMajorVersion", "1")
    mph += ph("FormatDocumentMinorVersion", "0")
    mph += ph("CreationDateTime", "20260821000000")
    mph += ph("CreatingCentre", "TEST")

    def phid(name: str, size: int, addr: int) -> bytes:
        return (name.ljust(30)[:30] + str(size).ljust(16)
                + str(addr).ljust(16)).encode()

    mph += phid("15Header", len(hdr_block), header_offset)
    mph += phid("15Data", len(data_block), data_offset)
    mph += phid("15Trailer", 0, data_offset + len(data_block))
    mph += phid("", 0, 0)
    mph += phid("", 0, 0)
    mph += bytes(1364)
    tail = ["TotalFileSize", "GORT", "ASTI", "LLOS",
            "SNIT", "AIID", "SSBT", "SSST", "RRCC", "RRBT", "RRST",
            "PPRC", "PPDT", "GPLV", "APNM", "AARF", "UUDT", "QQOV",
            "UDSP"]
    for i, nm in enumerate(tail):
        val = "20260821T000000Z" if nm == "SNIT" else "0"
        mph += ph(nm, val)
    assert len(mph) == MPH_SIZE

    cols = ref.shape[1]
    band_ids = "".join("X" if (i + 1) in chans else "-"
                       for i in range(NUM_CHANNELS))
    sph = bytearray()
    for nm, val in [
        ("ABID", "0"), ("SMOD", "0"), ("APXS", "0"), ("AVPA", "0"),
        ("LSCD", "0"), ("LMAP", "0"), ("QDLC", "0"), ("QDLP", "0"),
        ("QQAI", "0"),
        ("SelectedBandIDs", band_ids),
        ("SouthLineSelectedRectangle", "1"),
        ("NorthLineSelectedRectangle", str(lines)),
        ("EastColumnSelectedRectangle", "1"),
        ("WestColumnSelectedRectangle", str(cols)),
    ]:
        sph += ph(nm, val)
    assert len(sph) == SPH_SIZE

    return bytes(mph) + bytes(sph) + bytes(hdr_block) + data_block
