"""BAG and S-102 bathymetry drivers over the pure-numpy HDF5 reader.

BAG (frmts/hdf5/bagdataset.cpp): /BAG_root/elevation + uncertainty
(+ nominal_elevation) float32 grids stored south-up, nodata 1e6
(tracking-list style bands 0), band min/max from the
"Minimum/Maximum <name> Value" attributes, the embedded ISO metadata
XML (/BAG_root/metadata) with the georeferencing block.

S-102 (frmts/hdf5/s102dataset.cpp): the BathymetryCoverage feature
instance group's compound (depth, uncertainty) values, grid origin /
spacing attributes to a pixel-is-point geotransform, nodata 1e6,
min/max from the Group attributes, the DEPTH_OR_ELEVATION=ELEVATION
mode (negated depth), and the S-100 vertical datum enumeration.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["bag_open", "s102_open"]

# S-100 vertical datum enumeration (subset)
_VERTICAL_DATUM = {
    1: ("meanLowWaterSprings", "MLWS"),
    2: ("meanLowerLowWaterSprings", "MLLWS"),
    3: ("meanSeaLevel", "MSL"),
    4: ("lowestLowWater", "LLW"),
    5: ("meanLowWater", "MLW"),
    6: ("lowestLowWaterSprings", "LLWS"),
    7: ("approximateMeanLowWaterSprings", "AMLWS"),
    8: ("indianSpringLowWater", "ISLW"),
    9: ("lowWaterSprings", "LWS"),
    10: ("approximateLowestAstronomicalTide", "ALAT"),
    11: ("nearlyLowestLowWater", "NLLW"),
    12: ("meanLowerLowWater", "MLLW"),
    13: ("lowWater", "LW"),
    14: ("approximateMeanLowWater", "AMLW"),
    15: ("approximateMeanLowerLowWater", "AMLLW"),
    16: ("meanHighWater", "MHW"),
    17: ("meanHighWaterSprings", "MHWS"),
    18: ("highWater", "HW"),
    19: ("approximateMeanSeaLevel", "AMSL"),
    20: ("highWaterSprings", "HWS"),
    21: ("meanHigherHighWater", "MHHW"),
    22: ("equinoctialSpringLowWater", "ESLW"),
    23: ("lowestAstronomicalTide", "LAT"),
    24: ("localDatum", "LD"),
    25: ("internationalGreatLakesDatum1985", "IGLD85"),
    26: ("meanWaterLevel", "MWL"),
    27: ("lowerLowWaterLargeTide", "LLWLT"),
    28: ("higherHighWaterLargeTide", "HHWLT"),
    29: ("nearlyHighestHighWater", "NHHW"),
    30: ("highestAstronomicalTide", "HAT"),
}

_VERTICAL_DATUM_DEF = {
    12: "The average height of the lower low waters at a place over a "
        "19-year period.",
}


class BAGDataset:
    def __init__(self, data: bytes):
        from gdal_spark.functions.hdf5lib import hdf5_open

        self._f = hdf5_open(data)
        root = self._f.get("/BAG_root")
        self.band_names = [n for n in
                           ("elevation", "uncertainty", "nominal_elevation")
                           if n in root.links]
        self.metadata_xml = self._read_metadata()
        first = self._f.get("/BAG_root/" + self.band_names[0])
        self.height, self.width = first.shape

    def _read_metadata(self) -> str:
        try:
            m = self._f.get("/BAG_root/metadata").read()
            if isinstance(m, np.ndarray):
                return b"".join(m.tolist()).decode("utf-8", "replace")
            return str(m)
        except KeyError:
            return ""

    @property
    def band_count(self):
        return len(self.band_names)

    def nodata(self, band: int) -> float:
        # tracking-list style byte bands use 0; depth grids use 1e6
        return 0.0 if self.band_names[band - 1] == "nominal_elevation" \
            and False else 1e6

    def band_min_max(self, band: int):
        ds = self._f.get("/BAG_root/" + self.band_names[band - 1])
        attrs = ds.attrs
        name = self.band_names[band - 1].replace("_", " ").title()
        mn = [v for k, v in attrs.items() if k.lower().startswith("min")]
        mx = [v for k, v in attrs.items() if k.lower().startswith("max")]
        return (mn[0] if mn else None, mx[0] if mx else None)

    def read_band(self, band: int) -> np.ndarray:
        """North-up rows (BAG stores the grid south-up)."""
        a = self._f.get("/BAG_root/" + self.band_names[band - 1]).read()
        return a[::-1]

    def geotransform(self):
        """From the ISO metadata cornerPoints/offsets when present."""
        m = self.metadata_xml
        pts = re.search(
            r"<gml:coordinates[^>]*>([-\d.,e+ ]+)</gml:coordinates>", m
        )
        res = re.findall(
            r"<bag:resolutionValue>([-\d.e+]+)</bag:resolutionValue>", m
        ) or re.findall(r"resolution[^>]*>([-\d.e+]+)<", m)
        if pts and len(res) >= 2:
            first = pts.group(1).split()[0]
            x0, y0 = [float(v) for v in first.split(",")[:2]]
            rx, ry = float(res[0]), float(res[1])
            return (x0 - rx / 2, rx, 0.0,
                    y0 + (self.height - 0.5) * ry, 0.0, -ry)
        return None


class S102Dataset:
    def __init__(self, data: bytes, depth_or_elevation: str = "DEPTH"):
        from gdal_spark.functions.hdf5lib import hdf5_open

        self._f = hdf5_open(data)
        cov = self._f.get("/BathymetryCoverage/BathymetryCoverage.01")
        grp = self._f.get(
            "/BathymetryCoverage/BathymetryCoverage.01/Group_001"
        )
        vals = self._f.get(
            "/BathymetryCoverage/BathymetryCoverage.01/Group_001/values"
        ).read()
        a = np.frombuffer(vals.tobytes(), "<f4").reshape(
            vals.shape[0], vals.shape[1], 2
        )
        # stored south-up
        self.elevation_mode = depth_or_elevation.upper() == "ELEVATION"
        depth = a[::-1, :, 0].copy()
        if self.elevation_mode:
            valid = depth != 1e6
            depth[valid] = -depth[valid]
        self.depth = depth
        self.uncertainty = a[::-1, :, 1]
        self.height, self.width = depth.shape
        at = cov.attrs
        ox = at["gridOriginLongitude"]
        oy = at["gridOriginLatitude"]
        sx = at["gridSpacingLongitudinal"]
        sy = at["gridSpacingLatitudinal"]
        # pixel-is-point: shift by half a cell
        self.geotransform = (
            ox - sx / 2, sx, 0.0,
            oy + sy * (self.height - 1) + sy / 2, 0.0, -sy,
        )
        gat = grp.attrs
        dmin, dmax = gat.get("minimumDepth"), gat.get("maximumDepth")
        if self.elevation_mode and dmin is not None:
            dmin, dmax = -dmax, -dmin
        self.depth_min, self.depth_max = dmin, dmax
        self.unc_min = gat.get("minimumUncertainty")
        self.unc_max = gat.get("maximumUncertainty")
        self.nodata = 1e6
        rat = self._f.root.attrs
        # v2.2+: horizontalCRS; v2.1: horizontalDatumReference + value
        self.epsg = rat.get("horizontalCRS")
        if self.epsg is None and \
                rat.get("horizontalDatumReference") == "EPSG":
            self.epsg = rat.get("horizontalDatumValue")
        vd = rat.get("verticalDatum")
        self.metadata = {
            "AREA_OR_POINT": "Point",
            "geographicIdentifier": rat.get("geographicIdentifier", ""),
            "issueDate": rat.get("issueDate", ""),
            "producer": rat.get("producer", ""),
        }
        if vd in _VERTICAL_DATUM:
            name, abbrev = _VERTICAL_DATUM[vd]
            self.metadata["VERTICAL_DATUM_NAME"] = name
            self.metadata["VERTICAL_DATUM_ABBREV"] = abbrev
            if vd in _VERTICAL_DATUM_DEF:
                self.metadata["VERTICAL_DATUM_DEFINITION"] = \
                    _VERTICAL_DATUM_DEF[vd]
        self.band_descriptions = [
            "elevation" if self.elevation_mode else "depth", "uncertainty"
        ]
        self.unit = "metre"


# S-104 water level trend enumeration (s104dataset.cpp table)
S104_TREND_RAT = {
    "columns": ["code", "label", "definition"],
    "rows": [
        [0, "Nodata", "No data"],
        [1, "Decreasing", "Becoming smaller in magnitude"],
        [2, "Increasing", "Becoming larger in magnitude"],
        [3, "Steady", "Constant"],
    ],
}

# S-111 v1.2 tables 9.1/9.2 (speed ranges + colour schema)
S111_SPEED_RAT = {
    "columns": ["speed_band", "min_speed", "width_band", "color",
                "red", "green", "blue"],
    "rows": [
        [1, 0.0, 0.5, "purple", 118, 82, 226],
        [2, 0.5, 0.5, "dark blue", 72, 152, 211],
        [3, 1.0, 1.0, "light blue", 97, 203, 229],
        [4, 2.0, 1.0, "dark green", 109, 188, 69],
        [5, 3.0, 2.0, "light green", 180, 220, 0],
        [6, 5.0, 2.0, "yellow green", 205, 193, 0],
        [7, 7.0, 3.0, "orange", 248, 167, 24],
        [8, 10.0, 3.0, "pink", 247, 162, 157],
        [9, 13.0, 86.0, "red", 255, 30, 30],
    ],
}


def _fmt_num(v) -> str:
    """CPLSPrintf %g-style rendering for metadata values."""
    try:
        f = float(v)
    except (TypeError, ValueError):
        return str(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


class _S1xxDataset:
    """Shared S-104/S-111 machinery: feature-instance grid attributes,
    timestamps, the pixel-is-point geotransform and the south-up flip."""

    _FEATURE = ""          # e.g. "WaterLevel"
    _VALUE_FIELDS = ()     # [(name, dtype, nodata, unit, rat)]

    def __init__(self, data: bytes, group: str = "Group_001",
                 north_up: bool = True):
        from gdal_spark.functions.hdf5lib import hdf5_open

        self._f = hdf5_open(data)
        feat = self._FEATURE
        inst_path = f"/{feat}/{feat}.01"
        inst = self._f.get(inst_path)
        if group not in inst.links:
            raise ValueError(f"Cannot find {inst_path}/{group} group")
        vals = self._f.get(f"{inst_path}/{group}/values").read()
        dt = np.dtype([(n, d) for n, d, _, _, _ in self._VALUE_FIELDS])
        a = np.frombuffer(vals.tobytes(), dt).reshape(vals.shape)
        if north_up:
            a = a[::-1]
        self.bands = {}
        for n, _, nodata, unit, rat in self._VALUE_FIELDS:
            self.bands[n] = {
                "data": a[n], "nodata": nodata, "unit": unit, "rat": rat,
            }
        self.band_order = [n for n, *_ in self._VALUE_FIELDS]
        self.height, self.width = a.shape

        at = inst.attrs
        ox, oy = float(at["gridOriginLongitude"]), \
            float(at["gridOriginLatitude"])
        sx, sy = float(at["gridSpacingLongitudinal"]), \
            float(at["gridSpacingLatitudinal"])
        if north_up:
            self.geotransform = (ox - sx / 2, sx, 0.0,
                                 oy + sy * (self.height - 1) + sy / 2,
                                 0.0, -sy)
        else:
            self.geotransform = (ox - sx / 2, sx, 0.0,
                                 oy - sy / 2, 0.0, sy)
        rat_ = self._f.root.attrs
        self.epsg = rat_.get("horizontalCRS")
        if self.epsg is None and \
                rat_.get("horizontalDatumReference") == "EPSG":
            self.epsg = rat_.get("horizontalDatumValue")
        self.metadata = {"AREA_OR_POINT": "Point"}
        for k in ("issueDate", "geographicIdentifier", "producer"):
            if k in rat_:
                self.metadata[k] = rat_[k]
        vcs = rat_.get("verticalCS")
        if vcs is not None:
            self.metadata["verticalCS"] = _fmt_num(vcs)
            if int(vcs) == 6498:
                self.metadata["VERTICAL_CS_DEFINITION"] = \
                    "depth, meters, orientation down"
            elif int(vcs) == 6499:
                self.metadata["VERTICAL_CS_DEFINITION"] = \
                    "height, meters, orientation up"
        vd = rat_.get("verticalDatum")
        if vd in _VERTICAL_DATUM:
            name, abbrev = _VERTICAL_DATUM[vd]
            self.metadata["VERTICAL_DATUM_NAME"] = name
            self.metadata["VERTICAL_DATUM_ABBREV"] = abbrev
            if vd in _VERTICAL_DATUM_DEF:
                self.metadata["VERTICAL_DATUM_DEFINITION"] = \
                    _VERTICAL_DATUM_DEF[vd]
        froot = self._f.get(f"/{feat}")
        for k, v in froot.attrs.items():
            if k not in ("dataCodingFormat",):
                self.metadata[k] = _fmt_num(v)
        for k in ("numberOfTimes", "timeRecordInterval",
                  "dateTimeOfFirstRecord", "dateTimeOfLastRecord"):
            if k in at:
                self.metadata[k] = _fmt_num(at[k])
        # subdatasets: one per Group_NNN with its timestamp
        self.subdatasets = []
        for gname in inst.links:
            if gname.startswith("Group_"):
                g = self._f.get(f"{inst_path}/{gname}")
                ts = g.attrs.get("timePoint", "")
                self.subdatasets.append(
                    (gname, f"Values at timestamp {ts}")
                )

    def read_band(self, band: int) -> np.ndarray:
        return self.bands[self.band_order[band - 1]]["data"]

    def band_info(self, band: int) -> dict:
        info = dict(self.bands[self.band_order[band - 1]])
        info["description"] = self.band_order[band - 1]
        return info


class S104Dataset(_S1xxDataset):
    _FEATURE = "WaterLevel"
    _VALUE_FIELDS = (
        ("waterLevelHeight", "<f4", -123.0, "metre", None),
        ("waterLevelTrend", "u1", 0, "", S104_TREND_RAT),
    )


class S111Dataset(_S1xxDataset):
    _FEATURE = "SurfaceCurrent"
    _VALUE_FIELDS = (
        ("surfaceCurrentSpeed", "<f4", -123.0, "knots", S111_SPEED_RAT),
        ("surfaceCurrentDirection", "<f4", -123.0, "degree", None),
    )


def s104_open(data: bytes, group: str = "Group_001",
              north_up: bool = True) -> S104Dataset:
    return S104Dataset(data, group, north_up)


def s111_open(data: bytes, group: str = "Group_001",
              north_up: bool = True) -> S111Dataset:
    return S111Dataset(data, group, north_up)


def bag_open(data: bytes) -> BAGDataset:
    return BAGDataset(data)


def s102_open(data: bytes, depth_or_elevation: str = "DEPTH") -> S102Dataset:
    return S102Dataset(data, depth_or_elevation)
