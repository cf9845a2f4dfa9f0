from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from gdal_spark.session import get_session

    s = get_session(app_name="gdal_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
