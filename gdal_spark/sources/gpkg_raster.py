"""GeoPackage raster-tile pyramids (ogr/ogrsf_frmts/gpkg raster side).

The reference implements GPKG tiles and MBTiles over one shared base
(GDALGPKGMBTilesLikePseudoDataset, ogrgeopackagedataset.cpp /
mbtilesdataset.cpp): a tile matrix with a top-left origin, per-zoom
pixel sizes from ``gpkg_tile_matrix``, the raster window cut out of the
tile grid by the ``gpkg_contents`` bounds with the same
floor(0.5 + shift) pixel arithmetic. Unlike MBTiles, GPKG tile rows run
top-down and the origin comes from ``gpkg_tile_matrix_set``.

Write path emits the minimal spec-compliant table set
(gpkg_spatial_ref_sys / gpkg_contents / gpkg_tile_matrix_set /
gpkg_tile_matrix / the pyramid table) so round trips through this
engine's own reader and any GPKG client.

Scale: reads hand each task a read-only sqlite connection over its tile
slice (same contract as sources/mbtiles.py).
"""

from __future__ import annotations

import math
import os
import sqlite3

import numpy as np

from gdal_spark.sources.mbtiles import _decode_tile, _tile_to_bands


def gpkg_raster_tables(path: str) -> list[str]:
    con = sqlite3.connect(path)
    try:
        return [
            r[0]
            for r in con.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type='tiles'"
            )
        ]
    finally:
        con.close()


def read_gpkg_raster(
    path: str, table: str | None = None, zoom: int | None = None,
    band_count: int = 4, tile_size: int = 256,
):
    """-> ((band_count, h, w) uint8 north-up, geotransform, srs_id)."""
    con = sqlite3.connect(path)
    try:
        if table is None:
            table = gpkg_raster_tables(path)[0]
        minx, miny, maxx, maxy, srs = con.execute(
            "SELECT min_x, min_y, max_x, max_y, srs_id FROM gpkg_contents "
            "WHERE table_name=?", (table,)
        ).fetchone()
        ox, oy = con.execute(
            "SELECT min_x, max_y FROM gpkg_tile_matrix_set "
            "WHERE table_name=?", (table,)
        ).fetchone()
        zooms = {
            z: (px, py, mw, mh, tw, th)
            for z, mw, mh, tw, th, px, py in con.execute(
                "SELECT zoom_level, matrix_width, matrix_height, tile_width, "
                "tile_height, pixel_x_size, pixel_y_size FROM "
                "gpkg_tile_matrix WHERE table_name=?", (table,)
            )
        }
        z = zoom if zoom is not None else max(zooms)
        res_x, res_y, _, _, tw, th = zooms[z]

        w = int(0.5 + (maxx - minx) / res_x)
        h = int(0.5 + (maxy - miny) / res_y)
        gt = (minx, res_x, 0.0, maxy, 0.0, -res_y)
        spx = int(math.floor(0.5 + (minx - ox) / res_x))
        spy = int(math.floor(0.5 + (maxy - oy) / -res_y))

        out = np.zeros((h, w, band_count), np.uint8)
        c0, c1 = spx // tw, (spx + w - 1) // tw
        r0, r1 = spy // th, (spy + h - 1) // th
        for row in range(r0, r1 + 1):  # gpkg rows are top-down
            for col in range(c0, c1 + 1):
                r = con.execute(
                    f'SELECT tile_data FROM "{table}" WHERE zoom_level=? '
                    "AND tile_column=? AND tile_row=?", (z, col, row)
                ).fetchone()
                if r is None:
                    continue
                bands = _tile_to_bands(
                    _decode_tile(bytes(r[0])), band_count, tw
                )
                gx0, gy0 = col * tw - spx, row * th - spy
                dx0, dy0 = max(gx0, 0), max(gy0, 0)
                dx1, dy1 = min(gx0 + tw, w), min(gy0 + th, h)
                if dx1 <= dx0 or dy1 <= dy0:
                    continue
                out[dy0:dy1, dx0:dx1] = bands[
                    dy0 - gy0:dy1 - gy0, dx0 - gx0:dx1 - gx0
                ]
        return np.moveaxis(out, 2, 0), gt, srs
    finally:
        con.close()


def write_gpkg_raster(
    path: str, table: str, arr: np.ndarray, gt, srs_id: int = 0,
    tile_size: int = 256, fmt: str = "png",
) -> None:
    """(h, w[, bands]) north-up array -> GPKG tile pyramid table (single
    zoom level 0, tiles cut on the gt grid with the array origin as the
    tile-matrix origin)."""
    from gdal_spark.functions.codecs import encode_image

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nb = a.shape
    cols = (w + tile_size - 1) // tile_size
    rows = (h + tile_size - 1) // tile_size
    if os.path.exists(path):
        os.unlink(path)
    con = sqlite3.connect(path)
    try:
        con.executescript(
            """
            CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL,
              srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL,
              organization_coordsys_id INTEGER NOT NULL, definition TEXT
              NOT NULL, description TEXT);
            CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY,
              data_type TEXT NOT NULL, identifier TEXT UNIQUE,
              description TEXT DEFAULT '', last_change DATETIME,
              min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
              srs_id INTEGER);
            CREATE TABLE gpkg_tile_matrix_set (table_name TEXT PRIMARY KEY,
              srs_id INTEGER NOT NULL, min_x DOUBLE NOT NULL, min_y DOUBLE
              NOT NULL, max_x DOUBLE NOT NULL, max_y DOUBLE NOT NULL);
            CREATE TABLE gpkg_tile_matrix (table_name TEXT NOT NULL,
              zoom_level INTEGER NOT NULL, matrix_width INTEGER NOT NULL,
              matrix_height INTEGER NOT NULL, tile_width INTEGER NOT NULL,
              tile_height INTEGER NOT NULL, pixel_x_size DOUBLE NOT NULL,
              pixel_y_size DOUBLE NOT NULL,
              CONSTRAINT pk_ttm PRIMARY KEY (table_name, zoom_level));
            """
        )
        con.execute(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?, ?, 'EPSG', ?, "
            "'undefined', NULL)", (f"srs {srs_id}", srs_id, srs_id),
        )
        con.execute(
            f'CREATE TABLE "{table}" (id INTEGER PRIMARY KEY AUTOINCREMENT, '
            "zoom_level INTEGER NOT NULL, tile_column INTEGER NOT NULL, "
            "tile_row INTEGER NOT NULL, tile_data BLOB NOT NULL, "
            "UNIQUE (zoom_level, tile_column, tile_row))"
        )
        minx, maxy = gt[0], gt[3]
        maxx = gt[0] + w * gt[1]
        miny = gt[3] + h * gt[5]
        set_maxx = gt[0] + cols * tile_size * gt[1]
        set_miny = gt[3] + rows * tile_size * gt[5]
        con.execute(
            "INSERT INTO gpkg_contents VALUES (?, 'tiles', ?, '', "
            "'2024-01-01T00:00:00.000Z', ?, ?, ?, ?, ?)",
            (table, table, minx, miny, maxx, maxy, srs_id),
        )
        con.execute(
            "INSERT INTO gpkg_tile_matrix_set VALUES (?, ?, ?, ?, ?, ?)",
            (table, srs_id, minx, set_miny, set_maxx, maxy),
        )
        con.execute(
            "INSERT INTO gpkg_tile_matrix VALUES (?, 0, ?, ?, ?, ?, ?, ?)",
            (table, cols, rows, tile_size, tile_size, gt[1], -gt[5]),
        )
        for row in range(rows):
            for col in range(cols):
                tile = np.zeros((tile_size, tile_size, nb), np.uint8)
                ys, xs = row * tile_size, col * tile_size
                sub = a[ys:ys + tile_size, xs:xs + tile_size]
                tile[:sub.shape[0], :sub.shape[1]] = sub
                blob = encode_image(np.ascontiguousarray(tile), fmt)
                con.execute(
                    f'INSERT INTO "{table}" (zoom_level, tile_column, '
                    "tile_row, tile_data) VALUES (0, ?, ?, ?)",
                    (col, row, sqlite3.Binary(blob)),
                )
        con.commit()
    finally:
        con.close()
