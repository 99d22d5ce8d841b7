"""Structured-Streaming equivalents of the reference's incremental machinery.

The reference is batch-only; its incremental behaviors map to streaming
concepts (SURVEY.md §2.9):

- mtime-based "only new files" discovery (``bank/core.py:193-210
  _unindexed_iterator``) → a **file-source stream with checkpoint**: the
  checkpoint IS the "last indexed" state, ``Trigger.AvailableNow`` IS the
  catch-up scan.
- ``yield_waveforms(duration, overlap)`` (``wavebank.py:649-704``) →
  **sliding windows** ``window(ts, duration+overlap, duration)``.
- merge-group sessionization (``utils/waveforms.py:241-254``) →
  ``session_window(ts, gap)``.
- upsert-on-reingest (``eventbank.py:351-366``) → ``foreachBatch`` +
  bank upsert.

All helpers run equally under ``readStream`` (production) and the memory
sink (tests/local smoke).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def incremental_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
) -> DataFrame:
    """File-source stream over a directory — the 'only new files' contract.

    Each micro-batch sees exactly the files not yet indexed (checkpoint
    state), replacing the reference's mtime comparison. Drive with
    ``trigger(availableNow=True)`` for the reference's synchronous
    ``update_index`` behavior.
    """
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 64)
        .load(path)
    )


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "60 seconds",
    overlap: str = "0 seconds",
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """yield_waveforms(duration, overlap) as windowed streaming aggregation.

    ``overlap=0`` → tumbling; otherwise sliding with the reference's
    window-length = duration + overlap convention (``utils/time.py:378-421``
    chunk semantics). Watermark bounds state for late data — semantics the
    reference never had but a 100 TB stream needs.
    """
    import re

    def _secs(s: str) -> float:
        m = re.match(r"([\d.]+)\s*(\w+)", s)
        mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                "hour": 3600, "hours": 3600}[m.group(2)]
        return float(m.group(1)) * mult

    dur, ovl = _secs(duration), _secs(overlap)
    win = F.window(
        F.col(ts_col),
        windowDuration=f"{dur + ovl} seconds",
        slideDuration=f"{dur} seconds",
    )
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    out = events
    if events.isStreaming:
        out = out.withWatermark(ts_col, watermark)
    return out.groupBy(win.alias("window"), *keys).agg(*aggs)


def session_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Merge-group sessionization as native session windows.

    The streaming twin of :func:`obsplus_spark.operators.gaps.sessionize`:
    rows within ``gap`` of each other merge into one session per key.
    """
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    out = events
    if events.isStreaming:
        out = out.withWatermark(ts_col, gap)
    return out.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"), *keys
    ).agg(*aggs)


def stream_upsert_into_bank(
    stream: DataFrame,
    bank,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """foreachBatch → bank upsert: exactly-once incremental indexing.

    The streaming form of ``EventBank.update_index`` — each micro-batch of
    newly discovered rows MERGEs into the bank (``eventbank.py:267-327``).
    Returns the started StreamingQuery (call ``awaitTermination`` or
    ``processAllAvailable`` on it).
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.take(1):
            bank.update_index(batch_df)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first arrival of each content fingerprint
    passes, later duplicates drop — state bounded by the watermark (the
    fingerprint → seen map ages out with event time, so an unbounded
    stream holds a bounded dedup window, which is the only honest
    contract for a forever-running ingest: global forever-dedup state
    grows without bound).

    Batch twin: :func:`obsplus_spark.operators.dedup.exact_dedup` (the
    canonical-id groupBy); this is the ``dropDuplicatesWithinWatermark``
    re-expression over the same md5 fingerprint.
    """
    from obsplus_spark.operators.dedup import normalize_text
    from pyspark.sql import functions as F

    with_fp = docs.withColumn("fingerprint", F.md5(normalize_text(text_col)))
    wm = with_fp.withWatermark(ts_col, watermark)
    if hasattr(wm, "dropDuplicatesWithinWatermark"):
        return wm.dropDuplicatesWithinWatermark(["fingerprint"])
    return wm.dropDuplicates(["fingerprint"])


def streaming_contamination_candidates(
    docs: DataFrame,
    benchmark_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """Streaming FUZZY decontamination candidates: each arriving
    document is MinHash-banded with the batch pipeline's narrow per-row
    expressions and joined against a STATIC benchmark LSH index
    (:func:`obsplus_spark.operators.dedup.lsh_band_index` written at
    eval-set curation time) — ingest flags likely eval near-duplicates
    the moment they land, instead of waiting for the next corpus-wide
    decontamination sweep.

    Scale shape: the banding is stateless per-row expressions (any
    stream rate), and a stream-STATIC inner equi-join needs no
    watermark and no state store — Spark broadcasts or rescans the
    dimension-sized benchmark side per micro-batch. Output is
    candidates only; the exact-Jaccard verdict is the batch
    :func:`~obsplus_spark.operators.dedup.fuzzy_decontaminate` verify
    stage over the flagged ids (LSH recall trade documented there).

    Output stream: (doc_id, bench_id, band, band_hash) — one row per
    colliding band; distinct downstream.
    """
    from pyspark.sql import functions as F

    from obsplus_spark.operators.dedup import (
        _band_structs,
        minhash_signatures,
    )

    sig = minhash_signatures(
        docs, id_col, text_col, n_hashes, shingle_size=shingle_size
    )
    banded = sig.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"explode(array({_band_structs(n_hashes, bands)}))"
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.band_hash")
    bench = benchmark_index.select(
        F.col(id_col).alias("bench_id"),
        F.col("band").alias("b_band"),
        F.col("band_hash").alias("b_hash"),
    )
    return (
        banded.join(
            bench,
            (banded.band == bench.b_band)
            & (banded.band_hash == bench.b_hash),
        )
        .select("doc_id", "bench_id", "band", "band_hash")
    )


def streaming_rate_alerts(
    events: DataFrame,
    baseline: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    duration: str = "60 seconds",
    watermark: str = "10 minutes",
    sigma: float = 3.0,
) -> DataFrame:
    """Streaming twin of :func:`operators.sessions.rate_zscores`: windowed
    per-type counts scored against a PRE-COMPUTED per-type baseline
    (mean/stddev of historical bucket counts), emitting only buckets
    beyond ``sigma`` — the monitoring alert stream a pipeline hangs off
    its event log.

    The baseline is a batch artifact (tiny: one row per type) joined
    broadcast-style into the windowed aggregate — streaming aggregations
    cannot window over unbounded history, so the mean/stddev come from
    the batch side; refresh the baseline offline and restart (or use
    foreachBatch re-resolution) to roll it. State is bounded by the
    watermark; the stream-static join adds no state of its own.

    ``baseline`` columns: (``type_col``, mean, std). Works in batch mode
    too (same helper, no watermark) for backtesting the alert rule.

    Output: (window, event_type, n, z) — alert rows only.
    """
    counts = sliding_window_agg(
        events,
        ts_col=ts_col,
        duration=duration,
        watermark=watermark,
        keys=[type_col],
    )
    scored = counts.join(F.broadcast(baseline), type_col).select(
        "window",
        type_col,
        "n",
        F.when(F.col("std") == 0, F.lit(0.0))
        .otherwise((F.col("n") - F.col("mean")) / F.col("std"))
        .alias("z"),
    )
    return scored.filter(F.abs(F.col("z")) > float(sigma))


def stream_cms_counters(
    stream: DataFrame,
    key_col: str,
    store_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 512,
    available_now: bool = True,
):
    """foreachBatch count-min-sketch maintenance: each micro-batch builds
    its own ≤ depth×width-cell sketch and merges it CELL-WISE into a
    persistent counters table — the streaming form of the mergeable-
    sketch contract (``sketches.cms_merge``): the maintained table is at
    every point identical to a sketch built over everything ingested so
    far, while per-batch work is one map-combined aggregate plus a
    sketch-sized merge (never a rescan).

    The store swaps generations (write new, rename over old) — the same
    single-writer snapshot pattern as the bank upsert; readers see either
    the previous or the new complete table. Two at-least-once hazards of
    ``foreachBatch`` are handled explicitly:

    - **replay idempotence**: each generation carries an
      ``_applied_<batch_id>`` marker file (underscore-prefixed — the
      parquet reader ignores it), written into the generation BEFORE the
      swap so marker and data commit atomically in the same rename. A
      replayed batch (crash after the swap, before the stream checkpoint
      committed) finds its own marker in ``current`` and no-ops instead
      of double-counting.
    - **crash between the two swap renames** (``current`` renamed away,
      new generation not yet in place): the next invocation restores the
      newest ``_old_*`` survivor as ``current`` before doing anything.

    Returns the started StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _cms_apply_batch(batch_df, batch_id, key_col, store_dir, depth, width)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _gen_swap_apply(
    spark,
    store_dir: str,
    batch_id: int,
    fold: "Callable[[DataFrame | None], DataFrame]",
) -> None:
    """ONE idempotent generation-swap store transition — the shared
    crash-safety protocol of every foreachBatch-maintained table
    (:func:`stream_cms_counters`, :func:`stream_weighted_sample`):

    - **half-swap recovery**: if ``current`` is missing (crash between
      the two renames), the newest ``_old_*`` survivor is restored
      first;
    - **replay idempotence**: an ``_applied_<batch_id>`` marker rides
      INSIDE the generation dir (underscore-prefixed, so the parquet
      reader skips it) and commits with the data in the SAME rename; a
      replayed batch finds its marker and no-ops;
    - **no _old_ leak**: a crash after the swap but before the final
      cleanup leaves ``_old_<id>`` behind — swept on the replay path
      (once the marker is visible in ``current``, every ``_old_*`` is
      garbage) as well as after a normal swap.

    ``fold(prev)`` receives the current table (or None on first batch)
    and returns the next generation's full contents.
    """
    import os
    import shutil

    cur = os.path.join(store_dir, "current")
    if not os.path.isdir(cur) and os.path.isdir(store_dir):
        olds = sorted(
            (d for d in os.listdir(store_dir) if d.startswith("_old_")),
            key=lambda d: int(d.rsplit("_", 1)[-1]),
        )
        if olds:
            os.rename(os.path.join(store_dir, olds[-1]), cur)

    def _sweep_olds() -> None:
        for d in os.listdir(store_dir):
            if d.startswith("_old_"):
                shutil.rmtree(os.path.join(store_dir, d), ignore_errors=True)

    marker = f"_applied_{batch_id}"
    if os.path.isfile(os.path.join(cur, marker)):
        # replayed batch, already folded into `current`; a crash right
        # after the swap can strand its _old_ dir — current is complete
        # (the marker proves it), so stale _old_* are safe to sweep here
        _sweep_olds()
        return
    prev = spark.read.parquet(cur) if os.path.isdir(cur) else None
    nxt = fold(prev)
    tmp = os.path.join(store_dir, f"_gen_{batch_id}")
    nxt.coalesce(1).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, marker), "w") as fh:
        fh.write(str(batch_id))
    old = os.path.join(store_dir, f"_old_{batch_id}")
    shutil.rmtree(old, ignore_errors=True)  # crashed prior retry
    if os.path.isdir(cur):
        os.rename(cur, old)
    os.rename(tmp, cur)
    _sweep_olds()


def _cms_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    key_col: str,
    store_dir: str,
    depth: int,
    width: int,
) -> None:
    """One idempotent CMS-store transition (the ``foreachBatch`` body of
    :func:`stream_cms_counters`; crash/replay handling lives in the
    shared :func:`_gen_swap_apply`)."""
    from obsplus_spark.operators.sketches import cms_counters, cms_merge

    def fold(prev):
        b = cms_counters(batch_df, key_col, depth=depth, width=width)
        return b if prev is None else cms_merge(prev, b)

    _gen_swap_apply(batch_df.sparkSession, store_dir, batch_id, fold)


def streaming_event_window_join(
    events: DataFrame,
    picks: DataFrame,
    before_s: float = 10.0,
    after_s: float = 60.0,
    watermark: str = "1 minute",
    event_ts_col: str = "ev_time",
    pick_ts_col: str = "pk_time",
) -> DataFrame:
    """Stream-stream interval join: a stream of EVENTS (window anchors)
    joined with a stream of PICKS that fall inside each event's
    ``[anchor − before, anchor + after]`` window — the streaming form of
    the flagship ``Fetcher.yield_event_waveforms`` interval extraction
    (``structures/fetcher.py``), expressed as Spark's watermarked
    stream-stream join.

    State contract: BOTH sides carry an event-time watermark, and the
    join condition bounds pick time relative to event time on both ends
    — that pair of constraints is exactly what lets Spark compute how
    long each side's rows can still match and evict join state (an
    unbounded-range stream-stream join would hold state forever). Late
    rows beyond the watermark drop on ingestion; in-window late rows
    still pair correctly across micro-batches.

    Spark refuses a PURE range condition between two streams (no way to
    hash-partition the state), so the join rides the same bucketing
    trick as the batch flagship ``interval_overlap_join``: both sides
    get a coarse time-bucket EQUALITY key — the event side explodes
    into the (≤ 2, for a bucket no shorter than the window span)
    buckets its window touches, the pick side computes its single
    bucket — and the exact range stays as the residual predicate. A
    pick matches in exactly its own bucket, so no pair duplicates.

    Inner join (an event with no picks emits nothing until a pick
    arrives — the streaming semantic twin of the batch interval join's
    inner mode). Works identically under batch frames for A/B tests.
    """
    before_expr = f"INTERVAL {int(before_s * 1000)} MILLISECONDS"
    after_expr = f"INTERVAL {int(after_s * 1000)} MILLISECONDS"
    bucket_s = max(before_s + after_s, 1.0)
    ev = events.withWatermark(event_ts_col, watermark).withColumn(
        "_bkt",
        F.expr(
            f"explode(array_distinct(array("
            f"CAST(floor((unix_millis({event_ts_col}) / 1000.0D"
            f" - {before_s!r}) / {bucket_s!r}) AS BIGINT),"
            f"CAST(floor((unix_millis({event_ts_col}) / 1000.0D"
            f" + {after_s!r}) / {bucket_s!r}) AS BIGINT))))"
        ),
    )
    pk = picks.withWatermark(pick_ts_col, watermark).withColumn(
        "_bkt",
        F.expr(
            f"CAST(floor(unix_millis({pick_ts_col}) / 1000.0D"
            f" / {bucket_s!r}) AS BIGINT)"
        ),
    )
    cond = (
        (ev["_bkt"] == pk["_bkt"])
        & (F.col(pick_ts_col) >= F.expr(f"{event_ts_col} - {before_expr}"))
        & (F.col(pick_ts_col) <= F.expr(f"{event_ts_col} + {after_expr}"))
    )
    return ev.join(pk, cond, "inner").drop("_bkt")


def stream_weighted_sample(
    stream: DataFrame,
    weight_col: str,
    k: int,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    salt: str = "",
    available_now: bool = True,
):
    """foreachBatch maintenance of an EXACT weighted sample: because
    :func:`~obsplus_spark.operators.dedup.weighted_sample` derives its
    Efraimidis–Spirakis keys from an ID hash (``md5(id || salt)`` — a
    per-row fact, not an RNG draw; note: keyed on identity, so a
    re-ingested id keeps its key even if its payload changed), the
    sample is MERGEABLE — ``top_k(old_sample ∪ top_k(batch))`` equals
    ``top_k(everything ingested)`` at every point, so the maintained
    k-row table is always the exact weighted sample of the full stream
    history while per-batch work is one scan of the batch plus a
    2k-row merge (never a rescan).

    Same at-least-once hardening as :func:`stream_cms_counters`:
    generation-swap store, ``_applied_<batch_id>`` marker committed in
    the same rename as the data (replay no-ops), half-swap recovery
    from the newest ``_old_*`` survivor. Additionally the merge dedups
    per id (max_by sample_key) before re-ranking: a redelivered id in a
    DIFFERENT batch (distinct batch_id, so the marker cannot no-op it)
    would otherwise sit in the store AND the batch top-k with the same
    hash-derived key, survive ``limit(k)`` twice, and evict a
    legitimate k-th distinct member.

    Store schema: (id, weight, sample_key). Returns the started
    StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _weighted_sample_apply_batch(
            batch_df, batch_id, weight_col, k, store_dir, id_col, salt
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _weighted_sample_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    weight_col: str,
    k: int,
    store_dir: str,
    id_col: str,
    salt: str,
) -> None:
    """One idempotent sample-store transition (the ``foreachBatch`` body
    of :func:`stream_weighted_sample`; crash/replay handling lives in
    the shared :func:`_gen_swap_apply`)."""
    from pyspark.sql import functions as F

    from obsplus_spark.operators.dedup import weighted_sample

    cols = [id_col, weight_col, "sample_key"]

    def fold(prev):
        top = weighted_sample(
            batch_df.select(id_col, weight_col), weight_col, k,
            id_col=id_col, salt=salt,
        ).select(*cols)
        if prev is None:
            return top
        # keys are per-row facts: the union's top-k IS the history's
        # top-k (no re-draw, no re-keying of survivors). At-least-once
        # delivery can land an id in BOTH the stored sample and the
        # batch top-k with the identical hash-derived key — without a
        # per-id dedup both copies could survive limit(k) and evict a
        # legitimate k-th distinct item, so the merge keeps ONE row per
        # id (max_by sample_key: deterministic, and if a redelivery
        # changed the weight the higher-keyed row wins — the same rule
        # a from-scratch top-k over the deduped history would apply).
        merged = prev.select(*cols).unionByName(top)
        return (
            merged.groupBy(id_col)
            .agg(
                F.expr(
                    f"max_by(named_struct('w', {weight_col},"
                    " 'k', sample_key), sample_key)"
                ).alias("_best")
            )
            .select(
                F.col(id_col),
                F.col("_best.w").alias(weight_col),
                F.col("_best.k").alias("sample_key"),
            )
            .orderBy(F.col("sample_key").desc(), F.col(id_col))
            .limit(int(k))
        )

    _gen_swap_apply(batch_df.sparkSession, store_dir, batch_id, fold)


def stream_hll_distinct(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    store_dir: str,
    checkpoint_dir: str,
    lg_k: int = 12,
    available_now: bool = True,
):
    """foreachBatch HLL distinct-count maintenance: each micro-batch
    builds per-key HLL sketch partials and UNIONS them into a
    persistent sketch table — the streaming form of the mergeable-HLL
    contract (``sketches.hll_rollup``): the maintained table is at
    every point identical to sketches built over everything ingested so
    far (union of HLLs is exact over the sketch state), while per-batch
    work is one map-combined sketch aggregate plus a key-sized merge —
    never a rescan, never raw-value state.

    Crash/replay safety rides the shared generation-swap protocol
    (:func:`_gen_swap_apply`): applied-marker idempotence under
    at-least-once foreachBatch, half-swap recovery, stale-generation
    sweep.

    Store schema: (key_col, hll binary). Read with
    ``sketches.hll_estimate`` for the per-key distinct estimates.

    Returns the started StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _hll_apply_batch(batch_df, batch_id, key_col, value_col,
                         store_dir, lg_k)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _hll_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    key_col: str,
    value_col: str,
    store_dir: str,
    lg_k: int,
) -> None:
    """One idempotent HLL-store transition (extracted so tests can
    drive replay/crash paths without a streaming query)."""
    from obsplus_spark.operators.sketches import hll_partials, hll_rollup

    def fold(prev):
        b = hll_partials(batch_df, [key_col], value_col, lg_k=lg_k)
        return b if prev is None else hll_rollup(
            prev.unionByName(b), [key_col]
        )

    _gen_swap_apply(batch_df.sparkSession, store_dir, batch_id, fold)


def _funnel_apply_batch(
    batch_df: DataFrame, batch_id: int, stages, store_dir: str
) -> None:
    """One idempotent funnel-store transition: the batch's per-stage
    attrition counts merge ADDITIVELY into the maintained table (funnel
    counts are mergeable by construction — each stage's n_in/n_kept are
    plain sums over rows, so batch-wise sums equal the whole-history
    funnel). Extracted from the sink for direct replay tests."""
    from pyspark.sql import functions as F

    from obsplus_spark.operators.text import curation_funnel

    b = curation_funnel(batch_df, stages)

    def fold(prev):
        if prev is None:
            return b
        return (
            prev.unionByName(b)
            .groupBy("stage_idx", "stage")
            .agg(
                F.sum("n_in").alias("n_in"),
                F.sum("n_kept").alias("n_kept"),
                F.sum("n_dropped").alias("n_dropped"),
            )
        )

    _gen_swap_apply(batch_df.sparkSession, store_dir, batch_id, fold)


def stream_curation_funnel(
    stream: DataFrame,
    stages,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """foreachBatch maintenance of the curation-funnel attrition table
    (:func:`operators.text.curation_funnel`) over a document stream:
    after every micro-batch the store equals the funnel computed over
    EVERYTHING ingested so far — the live ingest-health dashboard a
    production curation pipeline watches (a filter that suddenly starts
    dropping everything shows up within one micro-batch, not at the
    next full-corpus audit).

    Per-batch work is the funnel's own map pass + one global aggregate
    over the BATCH (never a rescan of history), then a stage-count-
    sized additive merge under the shared generation-swap protocol
    (:func:`_gen_swap_apply`: replay-idempotent via the in-generation
    ``_applied`` marker, half-swap recovering, ``_old_*`` sweeping).

    Returns the started StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _funnel_apply_batch(batch_df, batch_id, stages, store_dir)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _centroid_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    vec_col: str,
    label_col: str,
    store_dir: str,
) -> None:
    """One idempotent centroid-store transition: the batch folds to
    per-label ``(n, sums)`` moment cells — count plus the elementwise
    vector sum, the MERGEABLE form of a centroid (means are not
    additive; moment sums are) — and merges into the maintained table
    by a label-keyed full-outer join + ``zip_with`` add. Both sides of
    the merge are |labels| rows, so the per-batch cost after the
    batch's own (label, dim) map-combined fold is label-count-sized.
    Vectors must share one dimensionality per store (the zip_with add
    nulls mismatched tails — the same fixed-dim contract every
    similarity operator documents)."""
    from obsplus_spark.util import sql_over

    from obsplus_spark.operators.similarity import valid_vectors

    src = valid_vectors(batch_df, vec_col).where(
        f"{label_col} IS NOT NULL"
    )

    def fold(prev):
        b = sql_over(
            {"s": src},
            f"""
            WITH cells AS (
              SELECT {label_col} AS label, pos, sum(CAST(x AS DOUBLE))
                       AS sx
              FROM {{s}} LATERAL VIEW posexplode({vec_col}) AS pos, x
              GROUP BY {label_col}, pos
            ),
            sums AS (
              SELECT label,
                     transform(array_sort(collect_list(struct(pos, sx))),
                               c -> c.sx) AS sums
              FROM cells GROUP BY label
            ),
            cnt AS (
              SELECT {label_col} AS label, CAST(count(1) AS BIGINT) AS n
              FROM {{s}} GROUP BY {label_col}
            )
            SELECT cnt.label, cnt.n, sums.sums
            FROM cnt JOIN sums ON cnt.label = sums.label
            """,
        )
        if prev is None:
            return b
        return sql_over(
            {"p": prev, "b": b},
            """
            SELECT coalesce(p.label, b.label) AS label,
                   coalesce(p.n, 0L) + coalesce(b.n, 0L) AS n,
                   CASE WHEN p.sums IS NULL THEN b.sums
                        WHEN b.sums IS NULL THEN p.sums
                        ELSE zip_with(p.sums, b.sums, (x, y) -> x + y)
                   END AS sums
            FROM {p} p FULL OUTER JOIN {b} b ON p.label = b.label
            """,
        )

    _gen_swap_apply(batch_df.sparkSession, store_dir, batch_id, fold)


def read_label_centroids(spark, store_dir: str) -> DataFrame:
    """Centroid view over a :func:`stream_label_centroids` store:
    ``(label, n, centroid)`` with 6-dp rounded components (the house
    kmeans convention — see ``similarity.embedding_outliers``)."""
    import os

    cur = os.path.join(store_dir, "current")
    return spark.read.parquet(cur).selectExpr(
        "label",
        "n",
        "transform(sums, x -> round(x / n, 6)) AS centroid",
    )


def stream_label_centroids(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    label_col: str = "label",
    available_now: bool = True,
):
    """foreachBatch maintenance of per-label embedding centroids over a
    vector stream: after every micro-batch the store's ``sums/n``
    equals the mean vector over EVERYTHING ingested so far — the live
    side of ``similarity.centroid_drift`` (compare the maintained
    centroids against a frozen snapshot's to alarm on encoder or
    distribution drift at ingest time, not at the next full re-embed
    audit).

    Per-batch work: the batch's own (label, dim) map-combined fold +
    a |labels|-row merge under the shared generation-swap protocol
    (:func:`_gen_swap_apply`: replay-idempotent, half-swap recovering).
    Malformed vectors and NULL labels are excluded by the shared
    similarity contracts. Read back via :func:`read_label_centroids`.

    Returns the started StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _centroid_apply_batch(
            batch_df, batch_id, vec_col, label_col, store_dir
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _hist_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    value_col: str,
    precision: int,
    store_dir: str,
) -> None:
    """One idempotent histogram-store transition: the batch folds to
    quantized ``(v, n)`` buckets (counts are trivially mergeable), then
    a bucket-cardinality-sized union + re-aggregate merges it into the
    maintained table under the shared generation-swap protocol."""
    from pyspark.sql import functions as F

    src = batch_df.where(f"{value_col} IS NOT NULL")
    b = (
        src.groupBy(
            F.round(F.col(value_col), precision).alias("v")
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def fold(prev):
        if prev is None:
            return b
        return (
            prev.unionByName(b)
            .groupBy("v")
            .agg(F.sum("n").cast("long").alias("n"))
        )

    _gen_swap_apply(batch_df.sparkSession, store_dir, batch_id, fold)


def stream_value_histogram(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    precision: int = 2,
    available_now: bool = True,
):
    """foreachBatch maintenance of a quantized value histogram over a
    stream: after every micro-batch the store's ``(v, n)`` buckets
    equal ``round(value, precision)`` counts over EVERYTHING ingested
    so far. Feed the maintained table and a frozen reference histogram
    to ``evaluation.ks_from_counts`` for a live distribution-drift
    alarm (the streaming side of ``ks_statistic`` — drift shows up
    within one micro-batch, not at the next full-corpus audit).

    Per-batch work: one map-combined batch aggregate + a
    bucket-cardinality-sized merge under the shared generation-swap
    protocol (replay-idempotent, half-swap recovering). NULL values
    are excluded (no bucket).

    Returns the started StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _hist_apply_batch(
            batch_df, batch_id, value_col, precision, store_dir
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ivf_assign(
    stream: DataFrame,
    centroids: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Streaming IVF index maintenance: assign each arriving vector to
    its nearest frozen centroid (argmax cosine, ties to the smaller
    cluster id — the exact formula of ``similarity.ivf_assign``'s
    assignment stage) and append it to a ``cluster=``-partitioned
    parquet index. New embeddings become probe-able by ``ivf_topk``-
    style readers one micro-batch after ingest, without ever
    re-assigning the existing corpus.

    ``centroids`` is the (cluster, centroid) frame of a batch
    ``ivf_assign`` run — the FROZEN coarse quantizer (re-clustering is
    a batch decision; this op only maintains membership). The ≤K
    centroid rows are collected ONCE at stream setup (bounded,
    documented driver action — the hyperplane-LSH literal pattern) and
    compiled into a literal array, so the per-batch plan is a PURE MAP:
    no join, no shuffle, and the partitioned file sink's manifest gives
    exactly-once appends across restarts.

    Returns the started StreamingQuery.
    """
    from obsplus_spark.operators.similarity import valid_vectors

    rows = sorted(
        (int(r["cluster"]), [float(x) for x in r["centroid"]])
        for r in centroids.select("cluster", "centroid").collect()
    )
    if not rows:
        raise ValueError("centroids frame is empty")
    cents = ", ".join(
        "named_struct('cluster', {c}, 'centroid', array({v}),"
        " 'nrm', {n!r}D)".format(
            c=c,
            v=", ".join(f"{x!r}D" for x in v),
            n=sum(x * x for x in v) ** 0.5,
        )
        for c, v in rows
    )
    # vector norm hoisted into its own projection so it evaluates once
    # per row, not once per centroid (the ivf_assign convention — a
    # K=256 quantizer would otherwise fold the vector 256× per row)
    assigned = (
        valid_vectors(stream, vec_col)
        .selectExpr(
            id_col,
            vec_col,
            f"sqrt(aggregate({vec_col}, 0.0D, (a, x) ->"
            " a + cast(x AS double) * cast(x AS double))) AS _vn",
        )
        .selectExpr(
            id_col,
            vec_col,
            f"""CAST(-(array_max(transform(array({cents}),
                  c -> named_struct(
                    'sim', coalesce(aggregate(zip_with({vec_col},
                      c.centroid,
                      (x, y) -> cast(x AS double) * y), 0.0D,
                      (a, x) -> a + x)
                      / nullif(_vn * c.nrm, 0.0D), 0.0D),
                    'nc', -c.cluster))).nc) AS INT) AS cluster""",
        )
    )
    writer = (
        assigned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("cluster")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _auc_cells_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    score_col: str,
    label_col: str,
    store_dir: str,
) -> None:
    """One idempotent AUC-cell transition: the batch folds to
    ``(s, n, np)`` sufficient-statistics cells (counts per distinct
    score — trivially mergeable), then a distinct-score-sized union +
    re-aggregate merges into the maintained table under the shared
    generation-swap protocol."""
    from pyspark.sql import functions as F

    b = (
        batch_df.where(
            f"{score_col} IS NOT NULL AND {label_col} IS NOT NULL"
        )
        .groupBy(F.col(score_col).alias("s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col(label_col), 1).otherwise(0)
            ).cast("long").alias("np"),
        )
    )

    def fold(prev):
        if prev is None:
            return b
        return (
            prev.unionByName(b)
            .groupBy("s")
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("np").cast("long").alias("np"),
            )
        )

    _gen_swap_apply(batch_df.sparkSession, store_dir, batch_id, fold)


def read_auc(spark, store_dir: str) -> DataFrame:
    """Whole-history AUC view over a :func:`stream_auc_cells` store —
    delegates to ``evaluation.auc_from_counts`` over the maintained
    sufficient-statistics cells."""
    import os

    from obsplus_spark.operators.evaluation import auc_from_counts

    return auc_from_counts(
        spark.read.parquet(os.path.join(store_dir, "current"))
    )


def stream_auc_cells(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    score_col: str = "score",
    label_col: str = "label",
    available_now: bool = True,
):
    """foreachBatch maintenance of tie-aware ROC-AUC sufficient
    statistics over a scored-and-labeled stream: the maintained
    ``(s, n, np)`` cells are MERGEABLE (plain counts per distinct
    score), so :func:`read_auc` computes the exact whole-history
    Mann-Whitney AUC after every micro-batch — a live quality-
    classifier health monitor (a drifting upstream feature shows up
    as an AUC drop within one micro-batch, not at the next offline
    eval). Quantize continuous scores upstream to bound the cell
    cardinality (the score_auc contract).

    Per-batch work: one map-combined batch aggregate + a
    cell-cardinality-sized merge under the shared generation-swap
    protocol (replay-idempotent, half-swap recovering).

    Returns the started StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _auc_cells_apply_batch(
            batch_df, batch_id, score_col, label_col, store_dir
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _gram_freq_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    id_col: str,
    text_col: str,
    n: int,
    store_dir: str,
) -> None:
    """One idempotent gram-frequency store transition (the
    ``foreachBatch`` body of :func:`stream_gram_frequencies`;
    crash/replay handling lives in the shared
    :func:`_gen_swap_apply`). Counts are mergeable by summation, so
    the fold is prev ∪ batch → gram-keyed sum."""
    from pyspark.sql import functions as F

    from obsplus_spark.operators.dedup import gram_frequencies

    def fold(prev):
        b = gram_frequencies(batch_df, id_col, text_col, n)
        if prev is None:
            return b
        return (
            prev.unionByName(b)
            .groupBy("g")
            .agg(F.sum("n_occ").cast("long").alias("n_occ"))
        )

    _gen_swap_apply(batch_df.sparkSession, store_dir, batch_id, fold)


def stream_gram_frequencies(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    available_now: bool = True,
):
    """foreachBatch maintenance of the corpus ``n``-gram frequency
    table (:func:`operators.dedup.gram_frequencies`) — the streaming
    leg of the exact-substring family: as documents arrive, their
    gram counts merge by SUMMATION into the persisted store, which at
    every point equals a batch build over everything ingested (the
    mergeable contract the CMS/HLL stores share). A curation pipeline
    joins a new batch's gram positions against ``current`` to flag
    duplicated spans incrementally — no corpus rescan per batch.

    Same generation-swap protocol as every maintained table here:
    replay-idempotent via the in-generation ``_applied_<batch_id>``
    marker, half-swap recovery, ``_old_*`` sweep (see
    :func:`_gen_swap_apply`).

    Returns the started StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _gram_freq_apply_batch(
            batch_df, batch_id, id_col, text_col, n, store_dir
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
