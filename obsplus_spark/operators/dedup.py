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
    with_size: bool = False,
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
    if with_size:
        # per-doc shingle count rides the same aggregate — downstream
        # Jaccard needs it and this saves a whole extra pass over the
        # shingle table
        aggs.append(F.count(F.lit(1)).alias("n_shingles"))
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
    sizes_df: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    intersection via equi-join of the two shingle sets, sizes via the
    per-doc shingle counts; ``J = |∩| / (|A| + |B| − |∩|)``. Pass
    ``sizes_df`` (id_col, n_shingles) when the counts already exist —
    e.g. folded into the MinHash aggregate — to skip a shingle-table pass.
    """
    sh = shingles_df if shingles_df is not None else shingles(
        df, id_col, text_col, shingle_size
    )
    sizes = (
        sizes_df
        if sizes_df is not None
        else sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    )

    # the candidate-pair table is the LSH collision set — orders of
    # magnitude smaller than the shingle table by construction — so it
    # broadcasts through every join here; only the (id2, shingle)
    # intersection equi-join shuffles shingle-table rows
    s1 = sh.select(F.col(id_col).alias("id1"), "shingle")
    s2 = sh.select(F.col(id_col).alias("id2"), F.col("shingle"))
    inter = (
        F.broadcast(pairs).join(s1, "id1")
        .join(s2, ["id2", "shingle"], "inner")
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    n1 = sizes.select(F.col(id_col).alias("id1"), F.col("n_shingles").alias("n1"))
    n2 = sizes.select(F.col(id_col).alias("id2"), F.col("n_shingles").alias("n2"))
    return (
        F.broadcast(pairs.join(F.broadcast(inter), ["id1", "id2"], "left"))
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
    close signatures ⇒ similar token sets. Entirely **narrow**: the
    distinct-token hash array materializes once per row (one md5 per
    token), then ``bits`` array-aggregates vote per bit — no explode, no
    shuffle, at any scale (the explode → groupBy formulation shuffles the
    full token stream for an answer each row already holds). Engine-
    portable: same md5-derived hash convention as the MinHash family.
    """
    from obsplus_spark.util import ensure_parallelism

    hashes = F.transform(
        F.array_distinct(F.split(normalize_text(text_col), " ")),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    with_h = ensure_parallelism(df).select(F.col(id_col), hashes.alias("_hashes"))
    # ONE aggregate pass accumulates all per-bit votes into an int array
    # (higher-order functions evaluate interpreted — k separate aggregates
    # would re-walk the hash array k times); SQL-expression lambdas because
    # the bit index is itself a lambda variable
    votes = F.expr(
        f"aggregate(_hashes, array_repeat(0, {bits}), "
        "(acc, h) -> zip_with(acc, sequence(0, size(acc) - 1), "
        "(a, k) -> a + CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END))"
    )
    agg = with_h.select(F.col(id_col), votes.alias("_votes"))
    sig = sum(
        (
            F.when(F.element_at(F.col("_votes"), k + 1) > 0, F.lit(2**k)).otherwise(
                F.lit(0)
            )
            for k in range(bits)
        ),
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

    The shingle table feeds multiple consumers (signatures+sizes in one
    aggregate, both sides of the intersection join); Catalyst re-plans the
    explode per consumer (no exchange reuse), so ``persist_shingles``
    (default True) caches it once — at 100 TB the shingle table is the
    thing you materialize (it is tokens-sized; re-deriving it re-reads the
    corpus each time), and it measures faster locally too. The persist
    stays in force for the caller's action; Spark LRU-evicts, or unpersist
    via ``spark.catalog.clearCache()``.
    """
    sh = shingles(df, id_col, text_col, shingle_size)
    if persist_shingles is None:
        persist_shingles = True
    if persist_shingles:
        sh = sh.persist()
    sig = minhash_signatures(
        df, id_col, text_col, n_hashes, shingle_size,
        shingles_df=sh, with_size=True,
    )
    pairs = lsh_candidate_pairs(sig, id_col, n_hashes, bands)
    scored = ngram_jaccard(
        df, pairs, id_col, text_col, shingle_size,
        shingles_df=sh, sizes_df=sig.select(id_col, "n_shingles"),
    )
    return scored.filter(F.col("jaccard") >= threshold)
