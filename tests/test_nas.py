"""NAS reader vs the reference autotest fixtures
(autotest/ogr/ogr_nas.py tests 4 and 5)."""

from __future__ import annotations

import os

import pytest

from gdal_spark.sources.nas import nas_read

D = "/root/reference/autotest/ogr/data/nas"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing")


def _rd(name: str) -> bytes:
    with open(os.path.join(D, name), "rb") as fh:
        return fh.read()


def test_delete_transactions():
    """test_ogr_nas_4: one Delete layer with three delete features."""
    layers = nas_read(_rd("delete_nas.xml"))
    assert list(layers) == ["Delete"]
    feats = layers["Delete"]
    assert len(feats) == 3
    f = feats[0]["fields"]
    assert f["context"] == "Delete"
    assert f["typeName"] == "AX_Namensnummer"
    assert f["FeatureId"] == "DENW44AL00000HJU20100730T092847Z"


def test_replace_transactions():
    """test_ogr_nas_5: Delete layer records the replace; the new
    feature lands in its own layer."""
    layers = nas_read(_rd("replace_nas.xml"))
    assert set(layers) == {"Delete", "AX_Flurstueck"}

    d = layers["Delete"]
    assert len(d) == 1
    f = d[0]["fields"]
    assert f["context"] == "Replace"
    assert f["replacedBy"] == "DENW44AL00003IkM20110429T070635Z"
    assert f["safeToIgnore"] == "false"
    assert f["typeName"] == "AX_Flurstueck"
    assert f["FeatureId"] == "DENW44AL00003IkM20100809T071726Z"

    lyr = layers["AX_Flurstueck"]
    assert len(lyr) == 1
    g = lyr[0]["fields"]
    assert g["gml_id"] == "DENW44AL00003IkM20110429T070635Z"
    assert g["stelle"] == 5212


def test_empty_document():
    layers = nas_read(_rd("empty_nas.xml"))
    assert layers.get("Delete", []) == []
