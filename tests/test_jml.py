"""JML driver vs the reference autotest (autotest/ogr/ogr_jml.py)."""

import os

import pytest

from gdal_spark.sources.jml import jml_features, jml_write

JD = "/root/reference/autotest/ogr/data/jml"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(JD), reason="reference autotest data not present"
)


def test_jml_1_read():
    with open(os.path.join(JD, "test.jml"), "rb") as fh:
        feats, columns = jml_features(fh.read())
    names = [c["name"] for c in columns]
    assert names == [
        "first_property", "another_property", "objectAttr", "attr2",
        "attr3", "int", "double", "date", "datetime", "R_G_B",
        "not_ignored"]
    assert len(feats) == 3
    f = feats[0]
    assert f["first_property"] == "even"
    assert f["another_property"] == "rouault"
    assert f["objectAttr"] == "foo"
    assert f["attr2"] == "bar"
    assert f["attr3"] == "baz"
    assert f["int"] == 123
    assert f["double"] == 1.23
    assert f["date"] == "2014/10/18 00:00:00"
    assert f["datetime"] == "2014/10/18 21:36:45"
    assert f["R_G_B"] == "0000FF"
    assert f["not_ignored"] is None
    assert f["style"] == "BRUSH(fc:#0000FF)"
    assert f["wkt"] == "POLYGON ((0 0,0 10,10 10,10 0,0 0))"

    f2 = feats[1]
    assert f2["datetime"] == "2014/10/18 21:36:45+02"
    assert f2["R_G_B"] == "FF00FF"
    assert f2["style"] == "PEN(c:#FF00FF)"
    assert f2["wkt"] == "POINT (-1 -1)"

    assert feats[2]["wkt"] is None


def test_jml_srid_4326():
    with open(os.path.join(JD, "one_point_srid_4326.jml"), "rb") as fh:
        feats, _ = jml_features(fh.read())
    assert len(feats) == 1
    assert feats[0]["wkt"].startswith("POINT")


# the exact writer golden from autotest test_ogr_jml_2a
GOLDEN_2A = """<?xml version='1.0' encoding='UTF-8'?>
<JCSDataFile xmlns:gml="http://www.opengis.net/gml" xmlns:xsi="http://www.w3.org/2000/10/XMLSchema-instance" >
<JCSGMLInputTemplate>
<CollectionElement>featureCollection</CollectionElement>
<FeatureElement>feature</FeatureElement>
<GeometryElement>geometry</GeometryElement>
<CRSElement>boundedBy</CRSElement>
<ColumnDefinitions>
     <column>
          <name>str</name>
          <type>STRING</type>
          <valueElement elementName="property" attributeName="name" attributeValue="str"/>
          <valueLocation position="body"/>
     </column>
     <column>
          <name>int</name>
          <type>INTEGER</type>
          <valueElement elementName="property" attributeName="name" attributeValue="int"/>
          <valueLocation position="body"/>
     </column>
     <column>
          <name>double</name>
          <type>DOUBLE</type>
          <valueElement elementName="property" attributeName="name" attributeValue="double"/>
          <valueLocation position="body"/>
     </column>
     <column>
          <name>date</name>
          <type>DATE</type>
          <valueElement elementName="property" attributeName="name" attributeValue="date"/>
          <valueLocation position="body"/>
     </column>
     <column>
          <name>datetime</name>
          <type>DATE</type>
          <valueElement elementName="property" attributeName="name" attributeValue="datetime"/>
          <valueLocation position="body"/>
     </column>
     <column>
          <name>datetime2</name>
          <type>DATE</type>
          <valueElement elementName="property" attributeName="name" attributeValue="datetime2"/>
          <valueLocation position="body"/>
     </column>
     <column>
          <name>time_as_str</name>
          <type>STRING</type>
          <valueElement elementName="property" attributeName="name" attributeValue="time_as_str"/>
          <valueLocation position="body"/>
     </column>
     <column>
          <name>R_G_B</name>
          <type>STRING</type>
          <valueElement elementName="property" attributeName="name" attributeValue="R_G_B"/>
          <valueLocation position="body"/>
     </column>
</ColumnDefinitions>
</JCSGMLInputTemplate>
<featureCollection>
  <gml:boundedBy>
    <gml:Box srsName="http://www.opengis.net/gml/srs/epsg.xml#32632">
      <gml:coordinates decimal="." cs="," ts=" ">0.0000000000,0.0000000000 10.0000000000,10.0000000000                                               </gml:coordinates>
    </gml:Box>
  </gml:boundedBy>
     <feature>
          <geometry>
                <gml:MultiGeometry></gml:MultiGeometry>
          </geometry>
          <property name="str"></property>
          <property name="int"></property>
          <property name="double"></property>
          <property name="date"></property>
          <property name="datetime"></property>
          <property name="datetime2"></property>
          <property name="time_as_str"></property>
          <property name="R_G_B"></property>
     </feature>
     <feature>
          <geometry>
                <gml:Point><gml:coordinates>1,2</gml:coordinates></gml:Point>
          </geometry>
          <property name="str">fo&lt;o</property>
          <property name="int">1</property>
          <property name="double">1.23</property>
          <property name="date">2014/10/19</property>
          <property name="datetime">2014-10-19T12:34:56</property>
          <property name="datetime2">2014-10-19T12:34:56.000+0200</property>
          <property name="time_as_str">12:34:56</property>
          <property name="R_G_B">112233</property>
     </feature>
     <feature>
          <geometry>
                <gml:Polygon><gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>0,0 0,10 10,10 10,0 0,0</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>
          </geometry>
          <property name="str"></property>
          <property name="int"></property>
          <property name="double"></property>
          <property name="date"></property>
          <property name="datetime"></property>
          <property name="datetime2"></property>
          <property name="time_as_str"></property>
          <property name="R_G_B">112233</property>
     </feature>
</featureCollection>
</JCSDataFile>
"""


def test_jml_2a_writer_golden():
    fields = [("str", "string"), ("int", "integer"), ("double", "real"),
              ("date", "date"), ("datetime", "datetime"),
              ("datetime2", "datetime"), ("time_as_str", "time")]
    feats = [
        {},
        {"str": "fo<o", "int": 1, "double": 1.23, "date": "2014-10-19",
         "datetime": "2014-10-19 12:34:56",
         "datetime2": "2014-10-19 12:34:56+02",
         "time_as_str": "12:34:56", "wkt": "POINT (1 2)",
         "style": "PEN(c:#112233)"},
        {"wkt": "POLYGON ((0 0,0 10,10 10,10 0,0 0))",
         "style": "BRUSH(fc:#112233)"},
    ]
    out = jml_write(feats, fields, srs_epsg=32632)
    assert out == GOLDEN_2A


def test_jml_write_read_roundtrip():
    fields = [("name", "string"), ("n", "integer")]
    feats = [{"name": "a", "n": 7, "wkt": "POINT (3 4)",
              "style": "PEN(c:#A0B0C0)"}]
    back, cols = jml_features(jml_write(feats, fields))
    assert back[0]["name"] == "a"
    assert back[0]["n"] == 7
    assert back[0]["wkt"] == "POINT (3 4)"
    assert back[0]["R_G_B"] == "A0B0C0"
