"""GeoRSS + GMT drivers vs the reference autotest
(autotest/ogr/ogr_georss.py, ogr_gmt.py)."""

import os

import pytest

from gdal_spark.sources.georss import georss_features, georss_write
from gdal_spark.sources.gmtvec import gmt_features, gmt_write

RD = "/root/reference/autotest/ogr/data/georss"
GD = "/root/reference/autotest/ogr/data/gmt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RD), reason="reference autotest data not present"
)


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


def test_georss_simple_rss():
    # ogr_georss_test_rss expectations
    feats = georss_features(_read(os.path.join(RD, "test_georss_simple.xml")))
    assert len(feats) == 4
    f = feats[0]
    assert f["wkt"] == "POINT (2 49)"
    assert f["title"] == "A point"
    assert f["author"] == "Author"
    assert f["link"] == "http://gdal.org"
    assert f["pubDate"] == "2008/12/07 20:13:00+02"
    assert f["category"] == "First category"
    assert f["category_domain"] == "first_domain"
    assert f["category2"] == "Second category"
    assert f["category2_domain"] == "second_domain"
    assert feats[1]["wkt"] == "LINESTRING (2 48,2.1 48.1,2.2 48)"
    assert feats[1]["title"] == "A line"
    assert feats[2]["wkt"] == \
        "POLYGON ((2 50,2.1 50.1,2.2 48.1,2.1 46.1,2 50))"
    assert feats[3]["wkt"] == \
        "POLYGON ((2 49,2 49.5,2.2 49.5,2.2 49,2 49))"


def test_georss_gml_where():
    feats = georss_features(_read(os.path.join(RD, "test_georss_gml.xml")))
    assert feats[0]["wkt"].startswith("POINT")
    assert "2" in feats[0]["wkt"] and "49" in feats[0]["wkt"]


def test_georss_atom():
    # ogr_georss_test_atom expectations (atom_field_values)
    feats = georss_features(_read(os.path.join(RD, "atom_rfc_sample.xml")))
    f = feats[0]
    assert f["title"] == "Atom draft-07 snapshot"
    assert f["link_rel"] == "alternate"
    assert f["link_type"] == "text/html"
    assert f["link_href"] == "http://example.org/2005/04/02/atom"
    assert f["link2_rel"] == "enclosure"
    assert f["link2_type"] == "audio/mpeg"
    assert f["link2_length"] == "1337"
    assert f["link2_href"] == \
        "http://example.org/audio/ph34r_my_podcast.mp3"
    assert f["id"] == "tag:example.org,2003:3.2397"
    assert f["updated"] == "2005/07/31 12:29:29+00"
    assert f["published"] == "2003/12/13 08:29:29-04"
    assert f["author_name"] == "Mark Pilgrim"
    assert f["author_uri"] == "http://example.org/"
    assert f["author_email"] == "f8dy@example.com"
    assert f["contributor_name"] == "Sam Ruby"
    assert f["contributor2_name"] == "Joe Gregorio"
    assert f["content_type"] == "xhtml"
    assert f["content_xml_lang"] == "en"
    assert f["content_xml_base"] == "http://diveintomark.org/"
    assert '<div xmlns="http://www.w3.org/1999/xhtml">' in f["content"]


def test_georss_write_roundtrip():
    # ogr_georss_create / test_ogr_georss_4+5 shape
    feats = [
        {"title": "A point", "author": "Author", "link": "http://gdal.org",
         "pubDate": "2008/12/07 20:13:00+02",
         "category": "First category", "category_domain": "first_domain",
         "category2": "Second category", "category2_domain": "second_domain",
         "wkt": "POINT (2 49)"},
        {"title": "A line", "author": "Author", "link": "http://gdal.org",
         "pubDate": "2008/12/07 20:13:00+02",
         "wkt": "LINESTRING (2 48,2.1 48.1,2.2 48)"},
        {"title": "A polygon", "author": "Author", "link": "http://gdal.org",
         "pubDate": "2008/12/07 20:13:00+02",
         "wkt": "POLYGON ((2 50,2.1 50.1,2.2 48.1,2.1 46.1,2 50))"},
        {"title": "A box", "author": "Author", "link": "http://gdal.org",
         "pubDate": "2008/12/07 20:13:00+02",
         "wkt": "POLYGON ((2 49,2 49.5,2.2 49.5,2.2 49,2 49))"},
    ]
    text = georss_write(feats)
    back = georss_features(text)
    assert len(back) == 4
    assert back[0]["wkt"] == "POINT (2 49)"
    assert back[0]["category2_domain"] == "second_domain"
    assert back[1]["wkt"] == "LINESTRING (2 48,2.1 48.1,2.2 48)"
    assert back[3]["wkt"] == "POLYGON ((2 49,2 49.5,2.2 49.5,2.2 49,2 49))"
    # pubDate survives the RFC822 <-> OGR format conversion
    assert back[0]["pubDate"].startswith("2008/12/07 20:13:00")


def test_gmt_multilinestring():
    # test_ogr_gmt_4
    feats, info = gmt_features(_read(os.path.join(GD, "test_multi.gmt")))
    assert info["geom_type"] == "MULTILINESTRING"
    assert len(feats) == 2
    assert feats[0]["wkt"] == \
        "MULTILINESTRING ((175 -45,176 -45),(180 -45.3,179 -45.4))"
    assert feats[0]["name"] == "feature 1"
    assert feats[0]["id"] == 1
    assert feats[1]["wkt"] == \
        "MULTILINESTRING ((175.1 -45,175.2 -45.1),(180.1 -45.3,180 -45.2))"
    assert feats[1]["name"] == "feature 2"


def test_gmt_multipolygon_roundtrip():
    # test_ogr_gmt_5 (with GMT_USE_TAB for the first feature)
    feats = [
        {"ID": 15, "wkt": "MULTIPOLYGON (((0 0,0 10,10 10,0 10,0 0),"
                          "(3 3,4 4,3 4,3 3)),((12 0,14 0,12 3,12 0)))"},
        {"ID": 16, "wkt": "MULTIPOLYGON (((30 20,40 20,30 30,30 20)))"},
    ]
    text = gmt_write(feats, "MULTIPOLYGON", ["ID"], ["integer"],
                     use_tab=True)
    assert "@R" in text
    back, info = gmt_features(text)
    assert info["geom_type"] == "MULTIPOLYGON"
    assert back[0]["wkt"] == feats[0]["wkt"]
    assert back[0]["ID"] == 15
    assert back[1]["wkt"] == feats[1]["wkt"]
    assert back[1]["ID"] == 16
    assert len(back) == 2


def test_gmt_coord_only_points():
    # test_ogr_gmt_coord_only
    feats, info = gmt_features(b"1 2 3\n")
    assert feats[0]["wkt"] == "POINT Z (1 2 3)"
