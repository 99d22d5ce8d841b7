"""File summarizers: directory of data files → index rows.

The reference's indexing fast path reads only headers per file
(``utils/mseed.py:70-112 summarize_mseed`` via a libmseed C buffer;
fallback ``utils/bank.py:61-83 summarize_generic_stream`` full read). The
Spark re-expression: ``spark.read.format("binaryFile")`` scans the
directory tree distributed (one task per file batch), and an Arrow-batched
``mapInPandas`` summarizer emits index rows — bytes stay on executors.

The miniSEED header parse is REAL: ``sources/mseed.py`` implements the
public FDSN SEED v2.4 fixed-header + blockette-1000 walk in pure stdlib
(no obspy/libmseed needed). The default parser tries miniSEED first and
falls back to a deterministic text-header convention (kept for fixtures
and as the ``summarize_generic_stream`` stand-in for formats whose codecs
aren't in this container).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: index-row schema produced by every summarizer
SUMMARY_SCHEMA = (
    "network string, station string, location string, channel string, "
    "starttime long, endtime long, sampling_period long, path string"
)


def binary_file_scan(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    modified_after_ns: int | None = None,
) -> DataFrame:
    """Recursive distributed file scan (reference ``_unindexed_iterator``
    ``bank/core.py:193-210``): path, length, mtime, content per file.

    ``modified_after_ns`` reproduces the mtime-based incremental contract
    batch-side (the streaming checkpoint covers it stream-side).
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    if modified_after_ns is not None:
        df = df.filter(
            (F.unix_micros(F.col("modificationTime")) * 1000) > modified_after_ns
        )
    return df


def _parse_header_stub(content: bytes, path: str) -> list[dict]:
    """Deterministic stand-in for the miniSEED header parse.

    Convention: first line ``NET|STA|LOC|CHA|start_ns|n_samples|sp_ns``
    per record (one record per line). Real deployment: obspy
    ``read(..., headonly=True)`` here — signature unchanged.
    """
    rows = []
    for line in content.decode("utf-8", errors="ignore").splitlines():
        parts = line.strip().split("|")
        if len(parts) != 7:
            continue
        net, sta, loc, cha, start, n, sp = parts
        try:
            start_ns, n_samp, sp_ns = int(start), int(n), int(sp)
        except ValueError:
            continue
        rows.append(
            {
                "network": net,
                "station": sta,
                "location": loc,
                "channel": cha,
                "starttime": start_ns,
                "endtime": start_ns + n_samp * sp_ns,
                "sampling_period": sp_ns,
                "path": path,
            }
        )
    return rows


def auto_parser(content: bytes, path: str) -> list[dict]:
    """Default parser: real miniSEED header walk first (``sources/mseed``),
    then the text-convention fallback (reference ``utils/bank.py:61-83``
    summarize_generic_stream ordering: format-specific fast path, generic
    reader on miss)."""
    from obsplus_spark.sources.mseed import parse_mseed_records

    rows = parse_mseed_records(content, path)
    return rows if rows else _parse_header_stub(content, path)


def summarize_files(
    files: DataFrame,
    parser: Callable[[bytes, str], list[dict]] = auto_parser,
) -> DataFrame:
    """binaryFile rows → index rows via Arrow-batched ``mapInPandas``.

    One output row per trace record; malformed files yield zero rows
    (PERMISSIVE — the reference's ``_try_read_stream`` returns None and
    moves on, ``utils/bank.py:440-455``).
    """
    import pandas as pd

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    out.extend(parser(bytes(content), path))
                except Exception:
                    continue  # unreadable file → skipped, not fatal
            yield pd.DataFrame(
                out,
                columns=[
                    "network", "station", "location", "channel",
                    "starttime", "endtime", "sampling_period", "path",
                ],
            )

    return files.select("path", "content").mapInPandas(_batches, SUMMARY_SCHEMA)


def update_wavebank_from_files(
    spark: SparkSession,
    bank,
    path: str,
    glob: str = "*",
    incremental: bool = True,
) -> None:
    """WaveBank.update_index end-to-end (``wavebank.py:247-276``): discover
    (new) files, summarize distributed, upsert into the bank index."""
    import time as _time

    after = bank.last_updated_ns if incremental else None
    # stamp BEFORE the listing: a file created while the indexing job
    # runs is missed by this scan, and must still be newer than the
    # recorded watermark so the NEXT incremental run picks it up
    scan_ns = _time.time_ns()
    files = binary_file_scan(spark, path, glob, modified_after_ns=after)
    bank.update_index(summarize_files(files), scan_started_ns=scan_ns)
