"""Degenerate-corpus regression net for the TEXT family — the analogue
of tests/test_zero_norm_oracle.py for documents: a real crawl grows
blank, whitespace-only, NULL, and single-token documents, and the r6
sweep showed such rows turn engine/oracle divergences (or ANSI aborts)
into correctness-gate false alarms. This suite re-runs a representative
slice of the text-family ``queries()`` entries AND their DuckDB
``oracle_sql()`` twins over sf0.001 extended with four degenerate rows
and asserts cell-level agreement.
"""

from __future__ import annotations

import math
import shutil

import pytest

SRC = "/root/testdata/sf0.001"

TEXT_QUERIES = [
    "token_entropy",
    "ngram_diversity",
    "stratified_split",
    "vocab_top",
    "lang_id",
    "quality_flags",
    "repetition_stats",
    "unigram_lp",
    "bigram_lp",
    "chunk_text",
    "exact_dedup",
    "bool_search",
    "contamination_frac",
    "readability",
    "dup_leakage",
    "fuzzy_decontam",
    "minhash_near_dup",
    "decontaminate",
    "token_budget",
    "source_overlap",
    "leak_safe_split",
    "prefix_templates",
    "zipf_fit",
    "lang_mix",
    "curation_funnel",
    "dup_rate_by_source",
    "lsh_recall",
    "chunk_dedup",
    "within_doc_dedup",
    "score_auc",
    "edit_near_dup",
    "winnow_overlap",
    "containment",
    "dup_threshold_hist",
    # r10 additions over documents
    "stitch_pairs",
    "curriculum",
    "group_sample",
    # r11 additions over documents
    "exact_spans",
    "rebalance",
    "cut_spans",
    "apply_mixture",
    "script_mix",
    "dedup_eval",
    "gram_freq_hist",
    "gram_novelty",
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
def degenerate_docs_sf_dir(tmp_path_factory):
    """sf0.001 with five degenerate document rows appended (fresh max
    ids): empty text, whitespace-only, NULL text, single token, and a
    NULL language tag (the lang_mix 'und' fold)."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_degen_text")
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copyfile(f"{SRC}/{t}.parquet", str(d / f"{t}.parquet"))
    con = duckdb.connect()
    (maxid,) = con.execute(
        f"SELECT max(doc_id) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()
    base = int(maxid)
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/documents.parquet')
          UNION ALL SELECT {base + 1}, '', 'en', 'src0', 0
          UNION ALL SELECT {base + 2}, '   ', 'en', 'src1', 3
          UNION ALL SELECT {base + 3}, NULL, 'en', 'src2', 0
          UNION ALL SELECT {base + 4}, 'hello', 'en', 'src3', 5
          UNION ALL SELECT {base + 5}, 'tag herr schmidt', NULL,
                           'src4', 16
        ) TO '{d / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_query_matches_oracle_with_degenerate_docs(
    spark, degenerate_docs_sf_dir, name
):
    import duckdb

    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    sdf = fn(spark, degenerate_docs_sf_dir)
    srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{degenerate_docs_sf_dir}/{t}.parquet')"
            )
        res = con.execute(sql)
        ocols = [dsc[0] for dsc in res.description]
        orows = _normalize(res.fetchall(), ocols)
    finally:
        con.close()

    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), (len(srows), len(orows))
    for i, (a, b) in enumerate(zip(srows, orows)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert abs(x - y) <= 1e-6 + 1e-6 * abs(y), (name, i, a, b)
            else:
                assert x == y, (name, i, a, b)
