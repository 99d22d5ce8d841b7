"""QuakeML / StationXML ingest and export — pure stdlib ``xml.etree``.

The reference ingests catalogs with obspy's QuakeML reader
(``bank/eventbank.py:267-327 put_events`` → ``obspy.read_events``) and
station metadata with its StationXML reader. Both formats are public FDSN
XML schemas, and the subset the engine's nested event schema carries
(event → origins/magnitudes/picks, channel rows) parses fine with
ElementTree — no obspy.

Distribution shape: files arrive via ``binaryFile`` scan, parse runs in
an Arrow-batched ``mapInPandas`` (bytes stay on executors, one task per
file batch), rows land in the nested-event / station-index schemas used
everywhere else. Export is the inverse per-row serializer.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame

NS = 1_000_000_000


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _iso_to_ns(text: str | None) -> int | None:
    if not text:
        return None
    try:
        t = text.strip().replace("Z", "+00:00")
        dt = datetime.fromisoformat(t)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        # integer-second part exact, fraction re-derived to ns
        frac_ns = 0
        if "." in t:
            frac = t.split(".", 1)[1]
            for sep in "+-":
                frac = frac.split(sep, 1)[0]
            frac_ns = int(round(float("0." + frac) * NS)) if frac else 0
        whole = dt.replace(microsecond=0)
        return int(whole.timestamp()) * NS + frac_ns
    except ValueError:
        return None


def _ns_to_iso(ns_val: int | None) -> str | None:
    if ns_val is None:
        return None
    sec, rem = divmod(int(ns_val), NS)
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    return f"{base}.{rem:09d}Z" if rem else base + "Z"


def _child(el, name):
    for c in el:
        if _strip_ns(c.tag) == name:
            return c
    return None


def _value(el, name, conv=None):
    """<name><value>x</value></name> → x (QuakeML's RealQuantity shape)."""
    c = _child(el, name)
    if c is None:
        return None
    v = _child(c, "value")
    text = (v.text if v is not None else c.text) or None
    if text is None:
        return None
    return conv(text) if conv else text.strip()


def parse_quakeml(content: bytes | str, path: str = "") -> list[dict]:
    """QuakeML document → nested event rows (NESTED_EVENT_SCHEMA dicts).

    Namespace-agnostic (tags matched by local name), tolerant: events
    missing optional sub-objects produce empty lists/None fields;
    unparseable documents produce []."""
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return []
    rows = []
    for ev in root.iter():
        if _strip_ns(ev.tag) != "event":
            continue
        origins, mags, picks = [], [], []
        description = None
        pref_o = pref_m = None
        creation_ns = None
        for c in ev:
            tag = _strip_ns(c.tag)
            if tag == "origin":
                origins.append(
                    {
                        "resource_id": c.get("publicID"),
                        "time": _value(c, "time", _iso_to_ns),
                        "latitude": _value(c, "latitude", float),
                        "longitude": _value(c, "longitude", float),
                        "depth": _value(c, "depth", float),
                    }
                )
            elif tag == "magnitude":
                mag_el = _child(c, "mag")
                mags.append(
                    {
                        "resource_id": c.get("publicID"),
                        "mag": (
                            float(_child(mag_el, "value").text)
                            if mag_el is not None
                            and _child(mag_el, "value") is not None
                            else None
                        ),
                        "magnitude_type": _value(c, "type"),
                        "origin_id": _value(c, "originID"),
                    }
                )
            elif tag == "pick":
                wf = _child(c, "waveformID")
                picks.append(
                    {
                        "resource_id": c.get("publicID"),
                        "time": _value(c, "time", _iso_to_ns),
                        "phase_hint": _value(c, "phaseHint"),
                        "evaluation_status": _value(c, "evaluationStatus"),
                        "network": wf.get("networkCode") if wf is not None else None,
                        "station": wf.get("stationCode") if wf is not None else None,
                        "location": wf.get("locationCode") if wf is not None else None,
                        "channel": wf.get("channelCode") if wf is not None else None,
                    }
                )
            elif tag == "description":
                description = _value(c, "text") or (
                    _child(c, "text").text if _child(c, "text") is not None else None
                )
            elif tag == "preferredOriginID":
                pref_o = (c.text or "").strip() or None
            elif tag == "preferredMagnitudeID":
                pref_m = (c.text or "").strip() or None
            elif tag == "creationInfo":
                creation_ns = _value(c, "creationTime", _iso_to_ns)
        rows.append(
            {
                "event_id": ev.get("publicID") or f"{path}#{len(rows)}",
                "event_description": description,
                "preferred_origin_id": pref_o,
                "preferred_magnitude_id": pref_m,
                "creation_time": creation_ns,
                "origins": origins,
                "magnitudes": mags,
                "picks": picks,
            }
        )
    return rows


def _aslist(v) -> list:
    """None/numpy-array/list → list (Arrow hands arrays as ndarray)."""
    if v is None:
        return []
    return list(v)


def event_to_quakeml(row: dict) -> str:
    """One nested event row → a QuakeML <event> element string (the
    engine-carried subset; inverse of :func:`parse_quakeml`)."""
    ev = ET.Element("event", publicID=row["event_id"] or "")
    if row.get("event_description"):
        d = ET.SubElement(ev, "description")
        ET.SubElement(d, "text").text = row["event_description"]
    for name in ("preferred_origin_id", "preferred_magnitude_id"):
        if row.get(name):
            tag = (
                "preferredOriginID" if "origin" in name else "preferredMagnitudeID"
            )
            ET.SubElement(ev, tag).text = row[name]
    ct = row.get("creation_time")
    if ct is not None and ct == ct:  # NaN-safe: pandas nulls longs to NaN
        ci = ET.SubElement(ev, "creationInfo")
        ET.SubElement(ci, "creationTime").text = _ns_to_iso(int(ct))
    for o in _aslist(row.get("origins")):
        oe = ET.SubElement(ev, "origin", publicID=o.get("resource_id") or "")
        for field, tag in (
            ("time", "time"), ("latitude", "latitude"),
            ("longitude", "longitude"), ("depth", "depth"),
        ):
            v = o.get(field)
            if v is not None:
                q = ET.SubElement(oe, tag)
                ET.SubElement(q, "value").text = (
                    _ns_to_iso(v) if field == "time" else repr(float(v))
                )
    for m in _aslist(row.get("magnitudes")):
        me = ET.SubElement(ev, "magnitude", publicID=m.get("resource_id") or "")
        if m.get("mag") is not None:
            q = ET.SubElement(me, "mag")
            ET.SubElement(q, "value").text = repr(float(m["mag"]))
        if m.get("magnitude_type"):
            ET.SubElement(me, "type").text = m["magnitude_type"]
        if m.get("origin_id"):
            ET.SubElement(me, "originID").text = m["origin_id"]
    for p in _aslist(row.get("picks")):
        pe = ET.SubElement(ev, "pick", publicID=p.get("resource_id") or "")
        if p.get("time") is not None:
            q = ET.SubElement(pe, "time")
            ET.SubElement(q, "value").text = _ns_to_iso(p["time"])
        wf_attrs = {
            k: p.get(f)
            for k, f in (
                ("networkCode", "network"), ("stationCode", "station"),
                ("locationCode", "location"), ("channelCode", "channel"),
            )
            if p.get(f) is not None
        }
        if wf_attrs:
            ET.SubElement(pe, "waveformID", **wf_attrs)
        if p.get("phase_hint"):
            ET.SubElement(pe, "phaseHint").text = p["phase_hint"]
        if p.get("evaluation_status"):
            ET.SubElement(pe, "evaluationStatus").text = p["evaluation_status"]
    return ET.tostring(ev, encoding="unicode")


def quakeml_to_tree(files: DataFrame) -> DataFrame:
    """binaryFile rows → nested event rows, Arrow-batched on executors."""
    import pandas as pd

    from obsplus_spark.operators.event_tree import NESTED_EVENT_SCHEMA

    cols = [f.name for f in NESTED_EVENT_SCHEMA.fields]

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    out.extend(parse_quakeml(bytes(content), path))
                except Exception:
                    continue
            yield pd.DataFrame(out, columns=cols)

    return files.select("path", "content").mapInPandas(
        _batches, NESTED_EVENT_SCHEMA
    )


def tree_to_quakeml(tree: DataFrame) -> DataFrame:
    """Nested event rows → (event_id, quakeml) strings — per-row
    serializer, runs batched on executors (export is not a hot path)."""
    import pandas as pd

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            recs = pdf.to_dict("records")
            yield pd.DataFrame(
                {
                    "event_id": [r["event_id"] for r in recs],
                    "quakeml": [event_to_quakeml(r) for r in recs],
                }
            )

    return tree.mapInPandas(_batches, "event_id string, quakeml string")


def update_eventbank_from_files(
    spark,
    bank,
    path: str,
    glob: str = "*.xml",
    incremental: bool = True,
) -> None:
    """EventBank ingest from a QuakeML directory end-to-end (reference
    ``bank/eventbank.py:267-327 update_index``): discover (new) files by
    mtime, parse distributed, upsert payload trees + derived index."""
    from obsplus_spark.sources.summarize import binary_file_scan

    after = bank.last_updated_ns if incremental else None
    files = binary_file_scan(spark, path, glob, modified_after_ns=after)
    bank.put_events(quakeml_to_tree(files))


# --- StationXML -----------------------------------------------------------


def parse_stationxml(content: bytes | str, path: str = "") -> list[dict]:
    """StationXML → channel-level station index rows (the flat NSLC form
    consumed by operators/stations.py; reference ``utils/stations``)."""
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return []
    rows = []
    for net in root.iter():
        if _strip_ns(net.tag) != "Network":
            continue
        net_code = net.get("code") or ""
        for sta in net:
            if _strip_ns(sta.tag) != "Station":
                continue
            sta_code = sta.get("code") or ""
            for cha in sta:
                if _strip_ns(cha.tag) != "Channel":
                    continue

                def _f(name, el=cha):
                    c = _child(el, name)
                    try:
                        return float(c.text) if c is not None and c.text else None
                    except ValueError:
                        return None

                sr = _child(cha, "SampleRate")
                rows.append(
                    {
                        "network": net_code,
                        "station": sta_code,
                        "location": cha.get("locationCode") or "",
                        "channel": cha.get("code") or "",
                        "latitude": _f("Latitude"),
                        "longitude": _f("Longitude"),
                        "elevation": _f("Elevation"),
                        "depth": _f("Depth"),
                        "sample_rate": (
                            float(sr.text) if sr is not None and sr.text else None
                        ),
                        "start_date": _iso_to_ns(cha.get("startDate")),
                        "end_date": _iso_to_ns(cha.get("endDate")),
                    }
                )
    return rows


STATION_XML_SCHEMA = (
    "network string, station string, location string, channel string, "
    "latitude double, longitude double, elevation double, depth double, "
    "sample_rate double, start_date long, end_date long"
)


def stationxml_to_df(files: DataFrame) -> DataFrame:
    """binaryFile rows → flat channel index rows."""
    import pandas as pd

    cols = [c.split()[0] for c in STATION_XML_SCHEMA.split(", ")]

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    out.extend(parse_stationxml(bytes(content), path))
                except Exception:
                    continue
            yield pd.DataFrame(out, columns=cols)

    return files.select("path", "content").mapInPandas(
        _batches, STATION_XML_SCHEMA
    )
