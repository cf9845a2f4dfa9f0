"""Generic EPSG dispatch contract query.

The reference resolves any EPSG code through PROJ
(ogr/ogrspatialreference.cpp importFromEPSG, ogr/ogrct.cpp:665).  The
engine's parameterized registry (functions/crs.py EPSG_REGISTRY)
covers 20 national grids over 7 projection families; each code is
transformed from WGS84 at a fixed canonical point on every executor
slice, emitted as integer centimetres plus a machine-precision
round-trip flag, and counted to prove the work distributed.

The oracle carries the expected constants.  They are NOT free
parameters: the projection kernels behind them are pinned to the EPSG
Guidance Note 7-2 published worked examples and the reference
autotest's OSGB->ETRS89 golden in tests/test_epsg_registry.py, so any
math drift breaks pytest first and this hash gate second.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

# code -> (lon, lat) canonical WGS84 point (GN7-2 worked-example points
# where one exists for the code, else a mid-domain point)
CANONICAL = {
    "EPSG:2056": (8.0, 47.0),
    "EPSG:21781": (8.0, 47.0),
    "EPSG:2193": (173.0, -41.0),
    "EPSG:23030": (-3.0, 40.0),
    "EPSG:24200": (-76.94368333333334, 17.932166666666667),
    "EPSG:25832": (9.0, 51.0),
    "EPSG:25833": (15.0, 51.0),
    "EPSG:26917": (-81.0, 35.0),
    "EPSG:27700": (0.5, 50.5),
    "EPSG:28355": (147.0, -25.0),
    "EPSG:3002": (120.0, -3.0),
    "EPSG:3032": (120.0, -75.0),
    "EPSG:3035": (5.0, 50.0),
    "EPSG:31370": (4.5, 50.5),
    "EPSG:32040": (-96.0, 28.5),
    "EPSG:3395": (10.0, 45.0),
    "EPSG:3577": (133.0, -25.0),
    "EPSG:5514": (16.849771944444445, 50.209011555555556),
    "ESRI:102003": (-100.0, 40.0),
    "ESRI:102008": (-100.0, 45.0),
}


def epsg_transform_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    sch = T.StructType(
        [
            T.StructField("code", T.StringType()),
            T.StructField("e_cm", T.LongType()),
            T.StructField("n_cm", T.LongType()),
            T.StructField("rt_ok", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import crs as C

        for pdf in batches:
            rows = []
            for _k in pdf["n_nationkey"]:
                for code, (lon, lat) in CANONICAL.items():
                    e, n = C._from_4326(code, np.array([lon]),
                                        np.array([lat]))
                    lo, la = C._to_4326(code, e, n)
                    dlon = abs(float(lo[0]) - lon)
                    dlon = min(dlon, 360.0 - dlon)
                    rt = dlon < 5e-7 and abs(float(la[0]) - lat) < 5e-7
                    rows.append((code, int(round(float(e[0]) * 100)),
                                 int(round(float(n[0]) * 100)), rt))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    per_key = (
        load(spark, sf_dir, "nation").select("n_nationkey")
        .mapInPandas(run, sch)
    )
    return (
        per_key.groupBy("code")
        .agg(
            F.first("e_cm").alias("e_cm"),
            F.first("n_cm").alias("n_cm"),
            F.min("rt_ok").alias("rt_ok"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_EPSG_ORACLE = """
    WITH expected(code, e_cm, n_cm, rt_ok) AS (
        VALUES
        ('EPSG:2056', 264269542, 120559052, TRUE),
        ('EPSG:21781', 64269542, 20559052, TRUE),
        ('EPSG:2193', 160000000, 546124294, TRUE),
        ('EPSG:23030', 50010238, 442796314, TRUE),
        ('EPSG:24200', 25596654, 14263252, TRUE),
        ('EPSG:25832', 50000000, 564982489, TRUE),
        ('EPSG:25833', 50000000, 564982489, TRUE),
        ('EPSG:26917', 50000000, 387304306, TRUE),
        ('EPSG:27700', 57739337, 6967362, TRUE),
        ('EPSG:28355', 50000000, 723505225, TRUE),
        ('EPSG:3002', 500947782, 56897354, TRUE),
        ('EPSG:3032', 725538079, 705338956, TRUE),
        ('EPSG:3035', 396279945, 299971885, TRUE),
        ('EPSG:31370', 15931175, 13214233, TRUE),
        ('EPSG:32040', 296348715, 25541299, TRUE),
        ('EPSG:3395', 111319491, 559129592, TRUE),
        ('EPSG:3577', 9979556, -270296153, TRUE),
        ('EPSG:5514', -56888546, -105047183, TRUE),
        ('ESRI:102003', -33839059, 28731388, TRUE),
        ('ESRI:102008', -29650540, 59695613, TRUE)
    )
    SELECT code, e_cm, n_cm, rt_ok,
           (SELECT COUNT(*) FROM nation) AS n
    FROM expected
"""


SPARK = {"epsg_transform_matrix": epsg_transform_matrix}
ORACLE = {"epsg_transform_matrix": _EPSG_ORACLE}
