"""Text-analysis operators for training-data pipelines (north-star surface).

All metrics are built-in string/array expressions — codegen'd, no UDFs —
and every formula has a 1:1 ANSI-SQL equivalent for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny default stopword list (shared with oracles; order irrelevant)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(col) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(tokens(c))
    )


#: BPE-ish pre-tokenization classes (GPT-2-style, dialect-portable subset):
#: letter runs, single digits, non-space punctuation runs. Subword counts
#: track this within a few % for English; it is deterministic, engine-
#: portable (Java regex ↔ RE2 agree on this subset), and runs at scan
#: speed — the point of an estimator feeding a 100 TB token budget.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def token_estimate(col, chars_per_word: float = 4.0) -> Column:
    """BPE-ish token-count estimate: regex pre-token matches, plus one
    extra token per started ``chars_per_word`` block beyond the fourth
    character of each long letter-run (long words split into subwords in
    a real BPE; short ones don't). Pure JVM expression.
    """
    c = F.col(col) if isinstance(col, str) else col
    pre = F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))
    # extra subword splits from letter runs longer than chars_per_word
    runs = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+"), F.lit(0))
    extra = F.aggregate(
        runs,
        F.lit(0),
        lambda acc, w: acc
        + F.floor(
            (F.length(w) - 1) / F.lit(chars_per_word)
        ).cast("int"),
    )
    return (pre + extra).cast("long")


def text_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-document quality metrics: lengths, token stats, ratios.

    Columns: n_chars_calc, n_tokens, n_distinct_tokens, distinct_ratio,
    avg_token_len, stopword_ratio, alpha_ratio.
    """
    sw = stopwords or STOPWORDS
    # two batched selectExpr calls (stage 1 computes shared subterms once)
    # — the Column-object tree with a per-stopword literal array cost
    # ~0.3 s of py4j/analysis per plan build
    sw_lits = ", ".join("'" + s.replace("'", "''") + "'" for s in sw)
    toks_sql = rf"split(trim({text_col}), '\\s+')"
    staged = df.selectExpr(
        id_col,
        f"length({text_col}) AS _len",
        f"{toks_sql} AS _toks",
        rf"length(regexp_replace({text_col}, '\\s+', '')) AS _nws",
        f"length(regexp_replace({text_col}, '[^A-Za-z]', '')) AS _alpha",
    )
    # counts as longs — matches the BIGINT the oracle engines produce
    return staged.selectExpr(
        id_col,
        "CAST(_len AS BIGINT) AS n_chars_calc",
        "CAST(size(_toks) AS BIGINT) AS n_tokens",
        "CAST(size(array_distinct(_toks)) AS BIGINT) AS n_distinct_tokens",
        "size(array_distinct(_toks)) / CAST(size(_toks) AS DOUBLE)"
        " AS distinct_ratio",
        "CAST(_nws AS DOUBLE) / size(_toks) AS avg_token_len",
        f"size(filter(_toks, t -> array_contains(array({sw_lits}), t)))"
        " / CAST(size(_toks) AS DOUBLE) AS stopword_ratio",
        "_alpha / CAST(_len AS DOUBLE) AS alpha_ratio",
    )


def doc_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic content fingerprints.

    - ``fp_md5``: md5 of normalized text (exact-dup key)
    - ``fp_sorted``: md5 of the sorted distinct token list (bag-of-words
      fingerprint — order-insensitive, catches shuffled duplicates)
    """
    from obsplus_spark.operators.dedup import normalize_text

    norm = normalize_text(text_col)
    sorted_toks = F.array_join(F.array_sort(F.array_distinct(F.split(norm, " "))), " ")
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.md5(sorted_toks).alias("fp_sorted"),
    )


def language_id_heuristic(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    profiles: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Marker-token language scoring (n-gram heuristic, deterministic).

    Scores each language by its marker-token hit count over the token
    list; predicts the argmax (ties → lexicographically first language).
    The marker profiles are plan-build constants, so the whole scorer
    compiles to **narrow array expressions** — per-language hit counts via
    ``filter``/``size`` over the token array, argmax via ``array_min`` on
    (−hits, lang) structs. Zero shuffles and zero joins at any scale (the
    earlier explode → broadcast-join → window formulation paid three
    shuffles for the same answer).
    """
    profiles = profiles or {
        "en": ["the", "and", "of", "is"],
        "es": ["el", "la", "de", "que"],
        "fr": ["le", "la", "et", "que"],
        "de": ["der", "die", "und", "ist"],
        "zh": ["de", "shi", "le", "bu"],
    }
    from obsplus_spark.util import ensure_parallelism

    df = ensure_parallelism(df)
    toks = tokens(text_col)
    scored = []
    for lang in sorted(profiles):
        marker_arr = F.array(*[F.lit(m) for m in profiles[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        scored.append(F.struct((-hits).alias("neg"), F.lit(lang).alias("lang")))
    best = F.array_min(F.array(*scored))
    hits_best = (-best["neg"]).cast("long")
    return df.select(
        F.col(id_col),
        F.when(hits_best > 0, best["lang"]).otherwise(F.lit("unknown")).alias(
            "predicted_lang"
        ),
        hits_best.alias("marker_hits"),
    )


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.3,
    max_dup_line_ratio: float = 0.5,
) -> DataFrame:
    """Gopher/C4-style pretraining quality rules as boolean flag columns.

    Each rule is a pure per-row JVM expression over the document — the
    filter runs at scan speed on any corpus size, and the flags stay
    inspectable (a pipeline tunes thresholds by aggregating flags before
    committing to a drop). Rules (public Gopher §A.1.1 / C4 heuristics,
    re-expressed):

    - ``ok_word_count``: word count in [min_words, max_words]
    - ``ok_mean_word_len``: mean word length in [min, max]
    - ``ok_symbol_ratio``: non-alphanumeric-non-space chars / chars ≤ max
    - ``ok_dup_lines``: chars in repeated lines / chars ≤ max
    - ``keep``: conjunction of all rules

    Output: (id, n_words, mean_word_len, symbol_ratio, dup_line_ratio,
    ok_* flags, keep).
    """
    t = F.col(text_col)
    toks = tokens(text_col)
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(toks))
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(
            toks, F.lit(0), lambda a, w: a + F.length(w)
        ) / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    n_chars = F.length(t)
    n_sym = n_chars - F.length(
        F.regexp_replace(t, r"[^A-Za-z0-9\s]", "")
    )
    sym_ratio = F.when(n_chars > 0, n_sym / n_chars.cast("double")).otherwise(
        F.lit(0.0)
    )
    # duplicate-line mass: chars in lines whose exact text appears more
    # than once in the doc, over total line chars — per-row array math,
    # no explode (lines = split on newline, trimmed, empties dropped)
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    dup_chars = F.aggregate(
        lines,
        F.lit(0),
        lambda a, x: a
        + F.when(
            F.size(F.filter(lines, lambda y: y == x)) > 1, F.length(x)
        ).otherwise(F.lit(0)),
    )
    line_chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    dup_ratio = F.when(
        line_chars > 0, dup_chars / line_chars.cast("double")
    ).otherwise(F.lit(0.0))

    ok_wc = (n_words >= min_words) & (n_words <= max_words)
    ok_mwl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    ok_sym = sym_ratio <= max_symbol_ratio
    ok_dup = dup_ratio <= max_dup_line_ratio
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(dup_ratio, 6).alias("dup_line_ratio"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_dup.alias("ok_dup_lines"),
        (ok_wc & ok_mwl & ok_sym & ok_dup).alias("keep"),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition signals: the mass of the most frequent
    word bigram, and the fraction of bigram occurrences that are
    repeats (occurrences beyond each distinct bigram's first).

    Shape: explode bigrams → count per (doc, bigram) → one aggregate per
    doc. Two map-side-combinable aggregations keyed by doc — the
    scale-correct formulation (a per-row nested-loop count is O(len²)
    per document, which a 100 TB corpus cannot pay; the explode shuffles
    each bigram once).

    Output: (id, n_bigrams, top_bigram_n, top_bigram_frac, dup_bigram_frac).
    Documents with < 2 words emit zero counts.
    """
    toks = tokens(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select(
        F.col(id_col), F.explode_outer(bigrams).alias("_bg")
    )
    per_bg = exploded.groupBy(id_col, "_bg").agg(
        F.count(F.lit(1)).alias("_n")
    )
    agg = per_bg.groupBy(id_col).agg(
        F.coalesce(
            F.sum(F.when(F.col("_bg").isNotNull(), F.col("_n"))), F.lit(0)
        ).alias("n_bigrams"),
        F.coalesce(
            F.max(F.when(F.col("_bg").isNotNull(), F.col("_n"))), F.lit(0)
        ).alias("top_bigram_n"),
        F.coalesce(
            F.sum(F.when(F.col("_bg").isNotNull(), F.col("_n") - 1)),
            F.lit(0),
        ).alias("_dups"),
    )
    return agg.select(
        F.col(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("top_bigram_n").cast("long").alias("top_bigram_n"),
        F.when(
            F.col("n_bigrams") > 0,
            F.round(F.col("top_bigram_n") / F.col("n_bigrams").cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        F.when(
            F.col("n_bigrams") > 0,
            F.round(F.col("_dups") / F.col("n_bigrams").cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
    )


def packing_plan(
    df: DataFrame,
    context_len: int,
    n_groups: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence-packing plan: assign each document a (group, bin, offset)
    inside fixed token-budget context windows — the step before writing
    packed training batches.

    Scalable shape: documents hash into ``n_groups`` independent packing
    groups (md5-derived — deterministic, engine-portable), and within a
    group a window cumsum of token counts lays documents head-to-tail;
    ``bin = floor(cum_before / context_len)`` cuts the stream into
    windows. Each group is one window partition — parallelism = n_groups,
    never a global sort (the greedy first-fit packers are sequential; the
    cumsum layout is the standard distributed approximation — documents
    straddling a boundary are truncated/split downstream). Deterministic:
    same corpus → same plan, any cluster size.

    Output: (id, grp, n_tokens, bin, bin_offset).
    """
    n = token_count(text_col)
    grp = F.expr(
        f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 8), 16, 10)"
        f" AS BIGINT) % {int(n_groups)}"
    )
    base = df.select(
        F.col(id_col), grp.alias("grp"), n.cast("long").alias("n_tokens")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        id_col,
        "grp",
        "n_tokens",
        F.floor(cum_before / F.lit(int(context_len))).cast("long").alias("bin"),
        (cum_before % F.lit(int(context_len))).cast("long").alias("bin_offset"),
    )
