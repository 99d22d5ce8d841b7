"""Deduplication operators for large-scale document pipelines.

Beyond the reference surface (BASELINE.json north_star): exact dedup,
MinHash+LSH near-dup, and n-gram Jaccard verification, all as declarative
DataFrame programs.

Hashing convention: every hash in this module is derived from ``md5`` hex
strings (``F.md5`` ↔ DuckDB ``md5``), so results are engine-portable and
oracle-checkable; MinHash minima compare the hex strings lexicographically
(lowercase hex both sides) — no engine-specific integer hash anywhere.

Scale notes: signatures are one explode + one groupBy per corpus (shuffle on
doc_id); LSH banding turns the quadratic all-pairs problem into an equi-join
on (band_index, band_hash) — the standard shuffle-friendly formulation; only
bucket-collision pairs pay the Jaccard verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col) -> F.Column:
    """Canonical text form: lowercase, collapsed whitespace, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Exact duplicate groups by content hash.

    Output: one row per distinct content — ``fingerprint``, canonical id
    (min id), duplicate count. A single groupBy on the hash: map-side
    partial agg, one shuffle, no join.
    """
    from obsplus_spark.util import ensure_parallelism

    return (
        ensure_parallelism(df)
        .select(
            F.md5(normalize_text(text_col)).alias(fingerprint_col),
            F.col(id_col),
        )
        .groupBy(fingerprint_col)
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Distinct word n-gram shingles per document (exploded long table)."""
    from obsplus_spark.util import ensure_parallelism

    tokens = F.split(normalize_text(text_col), " ")
    # slice is 1-indexed; sequence(1, size-n+1) enumerates shingle starts
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_size: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document: ``sig_j = min_shingle rot_j(md5(s))``.

    Hash family: **one** md5 per shingle; lane ``j`` is the 32-hex-char
    digest rotated left by ``2·j`` characters, so each lane's lexicographic
    order is led by a different digit pair of the digest — 16 near-
    independent orderings for the price of a single hash (the j-keyed
    md5-per-lane family costs 16× the hashing and dominated the round-1
    bench). Lanes only gate LSH candidate recall; the exact Jaccard pass
    downstream decides membership, so lane independence needs to be good,
    not perfect.

    One wide aggregate over the exploded shingle table — n_hashes ``min``
    aggregations, all map-side combinable. Pass ``shingles_df`` (e.g. a
    persisted table from :func:`shingles`) to share the explode across
    pipeline stages.
    """
    sh = shingles_df if shingles_df is not None else shingles(
        df, id_col, text_col, shingle_size
    )
    h = F.md5(F.col("shingle"))
    sh = sh.withColumn("_h", h)
    aggs = [
        F.min(
            F.concat(
                F.substring(F.col("_h"), 2 * j + 1, 32 - 2 * j),
                F.substring(F.col("_h"), 1, 2 * j),
            )
        ).alias(f"mh_{j}")
        for j in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.

    Band hash = md5 of the concatenated band rows; pairs come from the
    self-equi-join on (band_index, band_hash) with ``id1 < id2`` — each
    unordered pair once, shuffle keyed on the band hash (uniform unless
    the corpus is pathologically duplicated; salting hook would go here).
    """
    rows_per_band = n_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [f"mh_{j}" for j in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bh")
    ).select(id_col, "bh.band", "bh.band_hash")
    a = banded.alias("a")
    b_ = banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            "inner",
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    intersection via equi-join of the two shingle sets, sizes via the
    per-doc shingle counts; ``J = |∩| / (|A| + |B| − |∩|)``.
    """
    sh = shingles_df if shingles_df is not None else shingles(
        df, id_col, text_col, shingle_size
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    s1 = sh.select(F.col(id_col).alias("id1"), "shingle")
    s2 = sh.select(F.col(id_col).alias("id2"), F.col("shingle"))
    inter = (
        pairs.join(s1, "id1")
        .join(s2, ["id2", "shingle"], "inner")
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    n1 = sizes.select(F.col(id_col).alias("id1"), F.col("n_shingles").alias("n1"))
    n2 = sizes.select(F.col(id_col).alias("id2"), F.col("n_shingles").alias("n2"))
    return (
        pairs.join(inter, ["id1", "id2"], "left")
        .join(n1, "id1")
        .join(n2, "id2")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n1") + F.col("n2") - F.col("n_inter")).cast("double"),
        )
        .select("id1", "id2", "n_inter", "n1", "n2", "jaccard")
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """SimHash: per-bit majority vote over token hashes.

    Each distinct token hashes (md5 → first 8 hex chars → uint32); bit k of
    the signature is 1 iff more tokens have bit k set than unset. Hamming-
    close signatures ⇒ similar token sets. One explode + one groupBy with
    ``bits`` conditional sums — all map-side combinable, engine-portable
    (same md5-derived hash convention as the MinHash family).
    """
    from obsplus_spark.util import ensure_parallelism

    toks = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
        )
        .distinct()
        .withColumn(
            "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        )
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), k).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{k}")
        for k in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sig = sum(
        (F.when(F.col(f"b{k}") > 0, F.lit(2**k)).otherwise(F.lit(0)) for k in range(bits)),
        F.lit(0),
    )
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def hamming_distance(a, b) -> F.Column:
    """Popcount of XOR via bin()-string counting (no Python UDF)."""
    x = (F.col(a) if isinstance(a, str) else a).bitwiseXOR(
        F.col(b) if isinstance(b, str) else b
    )
    return F.length(F.regexp_replace(F.bin(x), "0", ""))


def near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    threshold: float = 0.7,
    persist_shingles: bool | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: signature → banding →
    candidate pairs → exact Jaccard → threshold.

    The shingle table feeds three consumers (signatures, sizes,
    intersections); Catalyst re-plans the explode per consumer (no
    exchange reuse). ``persist_shingles`` caches it once instead:
    - ``None`` (default): auto — persist only when the corpus scan has
      many partitions (a real corpus); tiny/local inputs recompute,
      which measures faster than the cache round-trip.
    - ``True``/``False``: force. At 100 TB the shingle table is the thing
      you materialize (it is tokens-sized; re-deriving it 3× re-reads the
      corpus 3×). The persist stays in force for the caller's action;
      Spark LRU-evicts, or unpersist via ``spark.catalog.clearCache()``.
    """
    sh = shingles(df, id_col, text_col, shingle_size)
    if persist_shingles is None:
        # auto: persist on a real cluster (any non-local master — the
        # corpus re-read × 3 is the dominant cost there); tiny local runs
        # recompute, which measures faster than the cache round-trip. No
        # df.rdd partition probe — that would force plan materialization.
        from obsplus_spark.util import is_local_master

        persist_shingles = not is_local_master(df)
    if persist_shingles:
        sh = sh.persist()
    sig = minhash_signatures(
        df, id_col, text_col, n_hashes, shingle_size, shingles_df=sh
    )
    pairs = lsh_candidate_pairs(sig, id_col, n_hashes, bands)
    scored = ngram_jaccard(
        df, pairs, id_col, text_col, shingle_size, shingles_df=sh
    )
    return scored.filter(F.col("jaccard") >= threshold)
