"""QuakeML / StationXML ingest + export (pure stdlib parser)."""

import pytest

from obsplus_spark.sources.quakeml import (
    _iso_to_ns,
    _ns_to_iso,
    event_to_quakeml,
    parse_quakeml,
    parse_stationxml,
)

NS = 1_000_000_000

QML = """<?xml version="1.0"?>
<q:quakeml xmlns:q="http://quakeml.org/xmlns/quakeml/1.2"
           xmlns="http://quakeml.org/xmlns/bed/1.2">
 <eventParameters publicID="smi:local/catalog">
  <event publicID="smi:local/ev1">
   <description><text>test quake</text></description>
   <preferredOriginID>smi:local/or1</preferredOriginID>
   <preferredMagnitudeID>smi:local/mag1</preferredMagnitudeID>
   <creationInfo><creationTime>2024-01-02T03:04:05Z</creationTime></creationInfo>
   <origin publicID="smi:local/or1">
    <time><value>2024-01-02T03:00:00.1234Z</value></time>
    <latitude><value>40.5</value></latitude>
    <longitude><value>-111.25</value></longitude>
    <depth><value>7000.0</value></depth>
   </origin>
   <magnitude publicID="smi:local/mag1">
    <mag><value>2.3</value></mag>
    <type>ML</type>
    <originID>smi:local/or1</originID>
   </magnitude>
   <pick publicID="smi:local/p1">
    <time><value>2024-01-02T03:00:01Z</value></time>
    <waveformID networkCode="UU" stationCode="CAPS"
                locationCode="01" channelCode="EHZ"/>
    <phaseHint>P</phaseHint>
    <evaluationStatus>reviewed</evaluationStatus>
   </pick>
  </event>
  <event publicID="smi:local/ev2"/>
 </eventParameters>
</q:quakeml>
"""

SXML = """<?xml version="1.0"?>
<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" schemaVersion="1.1">
 <Network code="UU">
  <Station code="CAPS">
   <Channel code="EHZ" locationCode="01"
            startDate="2020-01-01T00:00:00Z" endDate="2030-01-01T00:00:00Z">
    <Latitude>40.5</Latitude>
    <Longitude>-111.25</Longitude>
    <Elevation>2000.0</Elevation>
    <Depth>0.0</Depth>
    <SampleRate>100.0</SampleRate>
   </Channel>
   <Channel code="EHN" locationCode="01">
    <Latitude>40.5</Latitude><Longitude>-111.25</Longitude>
    <Elevation>2000.0</Elevation><Depth>0.0</Depth>
    <SampleRate>100.0</SampleRate>
   </Channel>
  </Station>
 </Network>
</FDSNStationXML>
"""


def test_parse_quakeml_fields():
    rows = parse_quakeml(QML, "c.xml")
    assert len(rows) == 2
    ev = rows[0]
    assert ev["event_id"] == "smi:local/ev1"
    assert ev["event_description"] == "test quake"
    assert ev["preferred_origin_id"] == "smi:local/or1"
    assert ev["creation_time"] == _iso_to_ns("2024-01-02T03:04:05Z")
    o = ev["origins"][0]
    assert o["latitude"] == 40.5 and o["depth"] == 7000.0
    assert o["time"] == _iso_to_ns("2024-01-02T03:00:00.1234Z")
    assert ev["magnitudes"][0]["mag"] == 2.3
    p = ev["picks"][0]
    assert (p["network"], p["station"], p["channel"]) == ("UU", "CAPS", "EHZ")
    assert p["phase_hint"] == "P"
    # empty event: lists empty, fields None
    assert rows[1]["origins"] == [] and rows[1]["preferred_origin_id"] is None


def test_iso_ns_roundtrip():
    for iso in ("2024-01-02T03:00:00Z", "2024-01-02T03:00:00.1234Z",
                "1999-12-31T23:59:59.000000001Z"):
        ns_val = _iso_to_ns(iso)
        assert _iso_to_ns(_ns_to_iso(ns_val)) == ns_val
    assert _iso_to_ns(None) is None
    assert _iso_to_ns("not a date") is None


def test_event_xml_roundtrip_python():
    ev = parse_quakeml(QML)[0]
    xml = event_to_quakeml(ev)
    back = parse_quakeml(f"<quakeml><eventParameters>{xml}</eventParameters></quakeml>")
    assert back[0] == ev


def test_parse_garbage():
    assert parse_quakeml(b"<<<not xml") == []
    assert parse_quakeml(b"<root><other/></root>") == []
    assert parse_stationxml(b"junk") == []


def test_parse_stationxml_rows():
    rows = parse_stationxml(SXML)
    assert len(rows) == 2
    r = rows[0]
    assert (r["network"], r["station"], r["location"], r["channel"]) == (
        "UU", "CAPS", "01", "EHZ",
    )
    assert r["sample_rate"] == 100.0
    assert r["start_date"] == _iso_to_ns("2020-01-01T00:00:00Z")
    assert rows[1]["start_date"] is None  # undated channel


def test_spark_quakeml_pipeline(spark, tmp_path):
    from obsplus_spark.sources.quakeml import (
        quakeml_to_tree,
        stationxml_to_df,
        tree_to_quakeml,
    )
    from obsplus_spark.sources.summarize import binary_file_scan

    d = tmp_path / "qml"
    d.mkdir()
    (d / "cat1.xml").write_text(QML)
    (d / "cat2.xml").write_text(QML.replace("ev1", "ev3").replace("ev2", "ev4"))
    (d / "bad.xml").write_text("<<<")
    files = binary_file_scan(spark, str(d), glob="*.xml")
    tree = quakeml_to_tree(files)
    got = {r.event_id for r in tree.collect()}
    assert got == {"smi:local/ev1", "smi:local/ev2", "smi:local/ev3", "smi:local/ev4"}

    # spark-side export → re-parse round trip preserves the populated event
    xml_df = tree_to_quakeml(tree.filter("event_id = 'smi:local/ev1'"))
    xml = xml_df.collect()[0].quakeml
    back = parse_quakeml(
        f"<quakeml><eventParameters>{xml}</eventParameters></quakeml>"
    )[0]
    orig = parse_quakeml(QML)[0]
    assert back == orig

    s = tmp_path / "sxml"
    s.mkdir()
    (s / "inv.xml").write_text(SXML)
    sdf = stationxml_to_df(binary_file_scan(spark, str(s), glob="*.xml"))
    assert sdf.count() == 2
    assert {r.channel for r in sdf.collect()} == {"EHZ", "EHN"}


def test_eventbank_quakeml_ingest(spark, tmp_path):
    from obsplus_spark.sources.bank import EventBank
    from obsplus_spark.sources.quakeml import update_eventbank_from_files

    d = tmp_path / "qml"
    d.mkdir()
    (d / "cat1.xml").write_text(QML)
    bank = EventBank(spark, tmp_path / "bank")
    update_eventbank_from_files(spark, bank, str(d), incremental=False)
    idx = bank.read_index(use_cache=False)
    assert idx.count() == 2
    got = bank.get_events(use_cache=False, minmagnitude=2.0)
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0].event_id == "smi:local/ev1"
    assert rows[0].picks[0]["station"] == "CAPS"
