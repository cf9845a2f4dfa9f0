"""gdal_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query & data-processing capabilities of GDAL/OGR 3.14
(reference at /root/reference, studied for SEMANTICS only — no code copied)
as idiomatic PySpark DataFrame operators over an Iceberg-shaped table of
image + caption pairs::

    images(image_id string, bytes binary, w int, h int, fmt string,
           caption string, phash long)

Design pillars (SURVEY.md §7):
  * DataFrame/SQL first — Catalyst plans everything relational.
  * Vectorized pandas/Arrow UDFs for pixel + geometry kernels (no per-row
    Python anywhere in a hot path).
  * Cell-key (quadkey) partitioning plays the role of GDAL's spatial
    indexes (shapefile .qix quadtree / GPKG R*Tree).
  * Two-phase spatial predicates: cheap bbox column conjunction, then the
    exact numpy kernel — mirroring OGRLayer::FilterGeometry
    (ogr/ogrsf_frmts/generic/ogrlayer.cpp:4004).
"""

__version__ = "0.1.0"

from gdal_spark.session import get_session  # noqa: F401
