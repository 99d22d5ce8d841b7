"""Custom stateful streaming: gap detection over an unbounded segment stream.

The reference's gap detector (``wavebank.py:427-485``) is a batch window
program (see ``operators/gaps.py``). On an unbounded stream of trace
segments the same semantics need **custom state**: per seed, remember the
running max end time across micro-batches and emit a gap whenever a new
segment starts beyond it — exactly the running-max trick, carried in
``applyInPandasWithState``. Same file: streaming MinHash-LSH near-dup
candidate detection (bucket-exemplar state). SURVEY §2.9 / §2.12.

State per key is two longs (running max end, last sampling period) —
bounded regardless of stream length; timeouts are left to the caller's
watermark policy (segments are assumed key-ordered within a batch, which
``update_index`` batches guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output rows: one per detected gap
GAP_SCHEMA = (
    "network string, station string, location string, channel string, "
    "gap_start long, gap_end long, gap_duration long"
)
STATE_SCHEMA = "max_end long, min_gap long"


#: sentinel "no carry-in yet": large enough that prev + min_gap < start is
#: always false (matching the loop semantics: no comparison before the
#: first-ever row), far from int64 overflow when a min_gap is added
_NO_CARRY = 2**62


def _detect_gaps(key, pdf_iter, state: GroupState):
    """Per-key stateful kernel: running-max end across micro-batches.

    Vectorized: the per-row running max is ``np.maximum.accumulate`` over
    the sorted batch shifted by one (seeded with the carried state), and
    gap detection is one boolean mask — no Python-level row iteration.
    """
    import numpy as np
    import pandas as pd

    network, station, location, channel = key
    if state.exists:
        max_end, min_gap = state.get
    else:
        max_end, min_gap = None, 0

    cols = [
        "network", "station", "location", "channel",
        "gap_start", "gap_end", "gap_duration",
    ]
    out = []
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["starttime", "endtime"])
        starts = pdf["starttime"].to_numpy(np.int64)
        ends = pdf["endtime"].to_numpy(np.int64)
        # reference default threshold 1.5 × sampling period, per row
        # (wavebank.py:446); floor matches the loop's int() truncation
        min_gaps = (1.5 * pdf["sampling_period"].to_numpy(np.int64)).astype(np.int64)
        # running max of end seen BEFORE each row, seeded with the carry-in
        prev = np.empty_like(ends)
        prev[0] = _NO_CARRY if max_end is None else max_end
        prev[1:] = np.maximum.accumulate(ends[:-1])
        if max_end is not None:
            np.maximum(prev, max_end, out=prev)
        mask = prev + min_gaps < starts
        if mask.any():
            g_start = prev[mask]
            g_end = starts[mask]
            out.append(
                pd.DataFrame(
                    {
                        "network": network,
                        "station": station,
                        "location": location,
                        "channel": channel,
                        "gap_start": g_start,
                        "gap_end": g_end,
                        "gap_duration": g_end - g_start,
                    },
                    columns=cols,
                )
            )
        batch_max = int(ends.max())
        max_end = batch_max if max_end is None else max(max_end, batch_max)
        min_gap = int(min_gaps[-1])

    state.update((max_end, min_gap))
    yield (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame({c: [] for c in cols})
    )


def streaming_gap_detector(segments: DataFrame) -> DataFrame:
    """Unbounded gap detection keyed by NSLC.

    Works on a streaming DataFrame of index rows (append output mode).
    Gap semantics match :func:`obsplus_spark.operators.gaps.gaps_df` for
    in-order arrivals; cross-batch continuity is what the state buys over
    re-running the batch operator per micro-batch.
    """
    return segments.groupBy(
        "network", "station", "location", "channel"
    ).applyInPandasWithState(
        _detect_gaps,
        outputStructType=GAP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: candidate pairs out of the streaming near-dup detector
NEAR_DUP_SCHEMA = "id1 string, id2 string, band int, band_hash string"
NEAR_DUP_STATE = "ids array<string>"


def _collide(key, pdf_iter, state: GroupState, max_exemplars: int = 16):
    """Per-(band, band_hash) kernel: remember up to ``max_exemplars`` doc
    ids seen in this bucket across ALL micro-batches; every new arrival
    emits a candidate pair against each remembered exemplar (and the
    other arrivals of its own batch). State is a bounded id list — the
    cap trades recall inside pathological mega-buckets for a hard memory
    bound, the same trade a batch LSH salting pass makes."""
    import pandas as pd

    band, band_hash = key
    seen: list = list(state.get[0]) if state.exists else []

    rows = []
    for pdf in pdf_iter:
        for did in pdf["doc_id"].astype(str):
            for other in seen:
                if other != did:
                    lo, hi = sorted((other, did))
                    rows.append((lo, hi, int(band), str(band_hash)))
            # re-delivered docs must not duplicate their exemplar entry
            # (a replay would waste a bounded slot and re-emit its pairs)
            if did not in seen and len(seen) < max_exemplars:
                seen.append(did)

    state.update((seen,))
    yield pd.DataFrame(rows, columns=["id1", "id2", "band", "band_hash"])


def streaming_near_dup_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Streaming MinHash-LSH candidate detection: each document's band
    hashes are computed with the SAME narrow expressions as the batch
    pipeline (``minhash_signatures`` — per-row, streamable), then a
    stateful shuffle on (band, band_hash) compares each arrival against
    the bucket's remembered exemplars — near-dup pairs whose members
    arrive in DIFFERENT micro-batches are exactly what the state buys
    over re-running the batch detector per batch.

    Emits candidate pairs (downstream exact-Jaccard verification is a
    batch join against the corpus, as in the batch pipeline); duplicates
    across bands dedup downstream.
    """
    from pyspark.sql import functions as F

    from obsplus_spark.operators.dedup import minhash_signatures

    sig = minhash_signatures(docs, id_col, text_col, n_hashes)
    rows_per_band = n_hashes // bands
    band_structs = ", ".join(
        "named_struct('band', {b}, 'band_hash', md5(concat_ws('|', {cols})))".format(
            b=b,
            cols=", ".join(
                f"mh_{j}"
                for j in range(b * rows_per_band, (b + 1) * rows_per_band)
            ),
        )
        for b in range(bands)
    )
    banded = sig.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"explode(array({band_structs}))").alias("bh"),
    ).select("doc_id", "bh.band", "bh.band_hash")
    return banded.groupBy("band", "band_hash").applyInPandasWithState(
        _collide,
        outputStructType=NEAR_DUP_SCHEMA,
        stateStructType=NEAR_DUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
