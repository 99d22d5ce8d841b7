"""Degenerate-stream regression net for the CODEC/MULTIMODAL family —
the fifth leg of the sweep pattern (zero-norm cosine, degenerate text,
degenerate events, degenerate graph; each prior leg caught real
engine/oracle divergences). The media queries synthesize per-user
payloads from event streams, so boundary STREAM SHAPES are the codec
edge cases: a 1-event user (sub-frame audio, sub-row image), an
exactly-one-frame user, a just-below-boundary user, NULL sample values,
an all-NULL-value user (empty stream after the filter), and a NULL
user_id row. Extends sf0.001 events with those shapes and re-runs the
media queries() against their DuckDB oracle_sql() twins cell-by-cell.
"""

from __future__ import annotations

import math
import shutil

import pytest

SRC = "/root/testdata/sf0.001"

MEDIA_QUERIES = [
    "wav_roundtrip",
    "ppm_roundtrip",
    "video_frames",
    "image_patches",
    "image_phash",
    "phash_wide",
    "audio_frames",
    "audio_segments",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(
        out, key=lambda t: tuple((x is None, str(x)) for x in t)
    )


@pytest.fixture(scope="module")
def degenerate_media_sf_dir(tmp_path_factory):
    """sf0.001 with boundary-shaped user streams appended (user ids
    20-25, below video_frames' `user_id < 40` scope; fresh event ids):
    1-event user, 2-event user with one NULL sample, exactly-16-event
    user (one image row / one video frame), 15-event user (just below
    the frame boundary), 64-event user (first size that yields a
    phash-able 4-row image), all-NULL-values user, and one NULL-user_id
    row."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_degen_media")
    for t in TABLES:
        if t == "events":
            continue
        shutil.copyfile(f"{SRC}/{t}.parquet", str(d / f"{t}.parquet"))
    con = duckdb.connect()
    (maxid,) = con.execute(
        f"SELECT max(event_id) FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()
    b = int(maxid)
    ts = "TIMESTAMP '2024-01-02 03:04:05.678901'"
    extra = []
    eid = b
    def _rows(user, n, value_fn):
        nonlocal eid
        out = []
        for k in range(n):
            eid += 1
            v = value_fn(k)
            vv = "NULL" if v is None else repr(float(v))
            out.append(
                f"SELECT {eid}, {ts}, {user}, 'click', {vv}, '{{}}'"
            )
        return out

    extra += _rows(20, 1, lambda k: 0.5)
    extra += _rows(21, 2, lambda k: None if k == 0 else -0.25)
    extra += _rows(22, 16, lambda k: (k - 8) / 10.0)
    extra += _rows(23, 15, lambda k: (k - 7) / 9.0)
    extra += _rows(24, 64, lambda k: math.sin(k) / 2.0)
    extra += _rows(25, 2, lambda k: None)
    extra += _rows("NULL", 1, lambda k: 0.125)
    union = "\n          UNION ALL ".join(extra)
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/events.parquet')
          UNION ALL {union}
        ) TO '{d / "events.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", MEDIA_QUERIES)
def test_media_query_matches_oracle_with_degenerate_streams(
    spark, degenerate_media_sf_dir, name
):
    import duckdb

    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    sdf = fn(spark, degenerate_media_sf_dir)
    srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{degenerate_media_sf_dir}/{t}.parquet')"
            )
        res = con.execute(sql)
        ocols = [dsc[0] for dsc in res.description]
        orows = _normalize(res.fetchall(), ocols)
    finally:
        con.close()

    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    for i, (a, b) in enumerate(zip(srows, orows)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert abs(x - y) <= 1e-6 + 1e-6 * abs(y), (name, i, a, b)
            else:
                assert x == y, (name, i, a, b)


def test_truncated_and_corrupt_payloads_fail_loudly():
    """Codec-level degenerate payloads (no oracle — these never reach
    SQL): truncated WAV/PPM/PPMV byte strings must raise cleanly (not
    mis-decode), and the perceptual hashes fold sub-cell images to
    None instead of hashing garbage."""
    import numpy as np
    import pytest as _p

    from obsplus_spark.operators.codecs import (
        average_hash,
        average_hash_wide,
        decode_ppm,
        decode_ppmv,
        decode_wav,
        encode_ppm,
        encode_ppmv,
        encode_wav,
    )

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    wav = encode_wav(np.arange(-4, 4, dtype=np.int16), 8000)
    ppm = encode_ppm(img)
    vid = encode_ppmv([img, img])

    for codec, payload in (
        (decode_wav, wav), (decode_ppm, ppm),
    ):
        with _p.raises(Exception):
            codec(payload[: len(payload) // 2])  # truncated mid-record
        with _p.raises(Exception):
            codec(b"\x00\x01garbage")  # corrupt magic/header
    with _p.raises(Exception):
        decode_ppmv(vid[: len(vid) - 10], every_n=1)  # truncated frame

    one = np.array([[7]], dtype=np.uint8)  # 1x1: smaller than any cell
    assert average_hash(one) == (None, None)
    assert average_hash_wide(one) is None
