"""STACIT — STAC ItemCollection mosaics.

Re-expresses frmts/stacit/stacitdataset.cpp's open path: a STAC
FeatureCollection (or single 1.1 Feature) whose items carry projection
extension fields (``proj:epsg`` / ``proj:code``, ``proj:bbox``,
``proj:transform``, ``proj:shape`` — asset-level overriding
item-level), paginated through ``links[rel=next]``, grouped by
(collection, asset, CRS).  A single group opens directly as a mosaic:
the union extent on the shared grid, per-item Src/DstRect placements
in ascending-datetime draw order, band properties (type / nodata /
eo:bands colour interpretation) taken from the most recent asset.
Multiple groups are exposed as ``STACIT:"<path>":collection=
X,asset=Y[,crs=EPSG_Z]`` subdatasets (the crs key only when one
collection+asset spans several CRS).

Overlap strategies (autotest/gdrivers/stacit.py):
  REMOVE_IF_NO_NODATA (default) — when the mosaic band has no nodata,
    a source fully covered by the union of strictly more recent
    sources can never contribute a pixel and is dropped;
  USE_MOST_RECENT — always drop covered sources;
  USE_ALL — keep everything.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

__all__ = ["stacit_open", "StacItDataset"]


def _lenient_json(text: str):
    """The reference fixtures carry trailing commas; strip them."""
    return json.loads(re.sub(r",(\s*[}\]])", r"\1", text))


def _srs_name(epsg: int) -> str:
    if 26701 <= epsg <= 26722:
        return "NAD27 / UTM zone %dN" % (epsg - 26700)
    if 26901 <= epsg <= 26923:
        return "NAD83 / UTM zone %dN" % (epsg - 26900)
    if 32601 <= epsg <= 32660:
        return "WGS 84 / UTM zone %dN" % (epsg - 32600)
    if 32701 <= epsg <= 32760:
        return "WGS 84 / UTM zone %dS" % (epsg - 32700)
    return "EPSG:%d" % epsg


class _Source:
    """One (item, asset) occurrence with resolved grid placement."""

    def __init__(self, item, asset_name, asset):
        roles = asset.get("roles") or []
        mime = asset.get("type") or ""
        if "metadata" in roles or "thumbnail" in roles or \
                mime.startswith(("application/", "text/")):
            raise ValueError("non-imagery asset")
        props = item.get("properties") or {}

        def pick(key):
            return asset.get(key, props.get(key))

        epsg = pick("proj:epsg")
        if epsg is None:
            code = pick("proj:code")
            m = re.match(r"EPSG:(\d+)$", code or "")
            if m:
                epsg = int(m.group(1))
        if epsg is None:
            raise ValueError("no proj:epsg/proj:code")
        self.epsg = int(epsg)
        t = pick("proj:transform")
        if not t or len(t) < 6:
            raise ValueError("no proj:transform")
        self.resx, self.resy = float(t[0]), -float(t[4])
        bbox = pick("proj:bbox")
        shape = pick("proj:shape")
        if bbox is not None:
            self.ulx, self.uly = float(bbox[0]), float(bbox[3])
            self.width = int(round((bbox[2] - bbox[0]) / self.resx))
            self.height = int(round((bbox[3] - bbox[1]) / self.resy))
        elif shape is not None:
            self.ulx, self.uly = float(t[2]), float(t[5])
            self.height, self.width = int(shape[0]), int(shape[1])
        else:
            raise ValueError("neither proj:bbox nor proj:shape")
        href = asset.get("href") or ""
        if href.startswith("file://"):
            href = href[len("file://"):]
        self.href = href
        self.datetime = props.get("datetime") or ""
        self.collection = item.get("collection") or ""
        self.asset_name = asset_name
        # eo:bands (1.0) / bands (1.1) colour info
        bands = asset.get("eo:bands") or asset.get("bands") or []
        self.common_name = None
        if bands:
            self.common_name = (bands[0].get("common_name")
                                or bands[0].get("eo:common_name"))

    @property
    def rect(self):
        return (self.ulx, self.uly - self.height * self.resy,
                self.ulx + self.width * self.resx, self.uly)


class StacItDataset:
    def __init__(self, path, collection=None, asset=None, crs=None,
                 max_items=None, overlap_strategy="REMOVE_IF_NO_NODATA",
                 base_dir=None):
        self.path = path
        self.base_dir = base_dir or os.path.dirname(os.path.abspath(path))
        sources = _paginate(path, max_items)
        if not sources:
            raise ValueError("no usable STAC assets")

        groups = {}
        for s in sources:
            groups.setdefault(
                (s.collection, s.asset_name, s.epsg), []).append(s)
        self._groups = groups

        if collection is not None or asset is not None or crs is not None:
            keys = [k for k in groups
                    if (collection is None or k[0] == collection)
                    and (asset is None or k[1] == asset)
                    and (crs is None or k[2] == crs)]
            if not keys:
                raise ValueError("no matching collection/asset/crs")
            if len(keys) > 1:
                raise ValueError("ambiguous collection/asset/crs")
            self._build(groups[keys[0]], overlap_strategy)
            self.subdatasets = []
        elif len(groups) == 1:
            self._build(next(iter(groups.values())), overlap_strategy)
            self.subdatasets = []
        else:
            self.band_count = 0
            self.subdatasets = self._subdataset_list()

    # -- subdatasets ---------------------------------------------------
    def _subdataset_list(self):
        multi_crs = {}
        for coll, an, epsg in self._groups:
            multi_crs.setdefault((coll, an), set()).add(epsg)
        out = []
        for coll, an, epsg in sorted(self._groups):
            name = 'STACIT:"%s":collection=%s,asset=%s' % (
                self.path, coll, an)
            desc = "Collection %s, Asset %s of %s" % (coll, an, self.path)
            if len(multi_crs[(coll, an)]) > 1:
                name += ",crs=EPSG_%d" % epsg
                desc += " in CRS EPSG:%d" % epsg
            out.append((name, desc))
        return out

    # -- mosaic --------------------------------------------------------
    def _build(self, sources, strategy):
        # draw order: ascending datetime, stable page order on ties
        sources = sorted(sources, key=lambda s: s.datetime)
        self.epsg = sources[0].epsg
        self.srs_name = _srs_name(self.epsg)
        resx, resy = sources[0].resx, sources[0].resy

        # band properties from the most recent openable asset
        self.nodata = None
        self.dtype = "uint8"
        self.color_interp = None
        if sources[-1].common_name:
            self.color_interp = sources[-1].common_name.capitalize()
        for s in reversed(sources):
            f = self._resolve(s.href)
            if f and os.path.exists(f):
                try:
                    from gdal_spark.functions.tiff import tiff_parse

                    a, meta = tiff_parse(open(f, "rb").read())
                    self.nodata = meta.get("nodata")
                    self.dtype = str(a.dtype)
                except Exception:
                    pass
                break

        sources = self._apply_overlap(sources, strategy)
        self._sources = sources

        minx = min(s.rect[0] for s in sources)
        miny = min(s.rect[1] for s in sources)
        maxx = max(s.rect[2] for s in sources)
        maxy = max(s.rect[3] for s in sources)
        self.width = int(round((maxx - minx) / resx))
        self.height = int(round((maxy - miny) / resy))
        self.geotransform = (minx, resx, 0.0, maxy, 0.0, -resy)
        self.band_count = 1
        self.sources = [
            (s.href, (0, 0, s.width, s.height),
             (int(round((s.ulx - minx) / resx)),
              int(round((maxy - s.uly) / resy)), s.width, s.height))
            for s in sources
        ]

    def _apply_overlap(self, sources, strategy):
        strategy = (strategy or "REMOVE_IF_NO_NODATA").upper()
        if strategy == "USE_ALL":
            return sources
        if strategy == "REMOVE_IF_NO_NODATA" and self.nodata is not None:
            return sources
        # drop any source fully covered by the union of strictly more
        # recent sources (rect cover check; the reference uses GEOS)
        keep = []
        for i, s in enumerate(sources):
            newer = sources[i + 1:]
            if not any(_covers(n.rect, s.rect) for n in newer):
                keep.append(s)
        return keep

    # -- access --------------------------------------------------------
    def _resolve(self, href):
        if os.path.isabs(href):
            return href
        p = os.path.join(self.base_dir, href)
        return p if os.path.exists(p) else href

    @property
    def file_list(self):
        out = [self.path]
        for href, _src, _dst in self.sources:
            if href not in out:
                out.append(href)
        return out

    def read(self):
        """Materialize the mosaic band (nodata-aware paste, draw
        order oldest -> newest)."""
        from gdal_spark.functions.tiff import tiff_parse

        fill = self.nodata if self.nodata is not None else 0
        canvas = np.full((self.height, self.width), fill,
                         dtype=np.float64)
        for href, src, dst in self.sources:
            f = self._resolve(href)
            if not os.path.exists(f):
                continue
            a, _meta = tiff_parse(open(f, "rb").read())
            if a.ndim == 3:
                a = a[..., 0]
            a = a[src[1]:src[1] + src[3], src[0]:src[0] + src[2]]
            win = canvas[dst[1]:dst[1] + dst[3], dst[0]:dst[0] + dst[2]]
            if self.nodata is not None:
                mask = a != self.nodata
                win[mask] = a[mask]
            else:
                win[...] = a
        return canvas.astype(self.dtype if self.nodata is None
                             else np.float64)


def _covers(outer, inner, eps=1e-9):
    return (outer[0] <= inner[0] + eps and outer[1] <= inner[1] + eps
            and outer[2] >= inner[2] - eps and outer[3] >= inner[3] - eps)


def _paginate(path, max_items):
    """Walk the next-link chain collecting per-asset sources;
    ``max_items`` caps the number of STAC *items* consumed."""
    out = []
    n_items = 0
    seen = set()
    base = path
    while base and base not in seen:
        seen.add(base)
        doc = _lenient_json(open(base).read())
        feats = (doc.get("features")
                 if doc.get("type") == "FeatureCollection" else [doc])
        for item in feats or []:
            if max_items is not None and n_items >= max_items:
                return out
            added = False
            for an, a in (item.get("assets") or {}).items():
                if not a.get("href"):
                    continue
                try:
                    out.append(_Source(item, an, a))
                    added = True
                except ValueError:
                    continue
            if added:
                n_items += 1
        nxt = None
        for lk in doc.get("links") or []:
            if lk.get("rel") == "next" and lk.get("href"):
                nxt = lk["href"]
                if nxt.startswith("file://"):
                    nxt = nxt[len("file://"):]
                if not os.path.isabs(nxt) and not os.path.exists(nxt):
                    nxt = os.path.join(os.path.dirname(base),
                                       os.path.basename(nxt))
                break
        base = nxt
    return out


def stacit_open(name, max_items=None,
                overlap_strategy="REMOVE_IF_NO_NODATA",
                base_dir=None) -> StacItDataset:
    """Open a STAC ItemCollection path or a
    ``STACIT:"<path>":key=value,...`` subdataset name."""
    m = re.match(r'^STACIT:"([^"]+)":(.*)$', name)
    if m:
        path, rest = m.group(1), m.group(2)
        kv = {}
        for part in rest.split(","):
            if "=" not in part:
                raise ValueError(f"malformed STACIT selector {part!r}")
            k, v = part.split("=", 1)
            kv[k] = v
        crs = kv.get("crs")
        if crs is not None:
            m2 = re.match(r"EPSG_(\d+)$", crs)
            if not m2:
                raise ValueError(f"bad crs selector {crs!r}")
            crs = int(m2.group(1))
        return StacItDataset(
            path, collection=kv.get("collection"), asset=kv.get("asset"),
            crs=crs, max_items=max_items,
            overlap_strategy=overlap_strategy, base_dir=base_dir)
    return StacItDataset(name, max_items=max_items,
                         overlap_strategy=overlap_strategy,
                         base_dir=base_dir)
