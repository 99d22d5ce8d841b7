"""VERDICT r7 #2: the engine defines zero-norm vectors as cosine 0
(`similarity.cosine` coalesce/nullif guard), but until round 8 the
DuckDB oracle twins still used the unguarded ``dot/(sqrt·sqrt)`` ratio —
so a fixture growing a zero-norm row would turn the correctness gate
into a false alarm (oracle NULL/inf vs engine 0) instead of a
regression catch. This suite re-runs the cosine-family queries() AND
their oracle_sql() twins over a corpus extended with one zero vector
and asserts they still agree cell-for-cell.
"""

from __future__ import annotations

import math
import shutil

import pytest

SRC = "/root/testdata/sf0.001"

# every queries() entry whose oracle contains a cosine ratio
COSINE_QUERIES = [
    "knn_cosine",
    "embed_near_dup",
    "ivf_flat",
    "lsh_ann",
    "ann_recall",
    "kmeans_step",
    "ivf_pq",
    "semantic_dedup",
    "hard_negatives",
    "embed_quantize",
    "pq_codes",
    "embed_outliers",
    "centroid_drift",
    "cluster_quality",
    "dim_trunc",  # r10: zero-norm truncated prefixes -> NULL, excluded
    "standardize",  # r11: zero vector standardizes fine (per-dim stats)
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
def zero_norm_sf_dir(tmp_path_factory):
    """sf0.001 with three degenerate embedding rows appended (fresh max
    ids, outside the query sets so expected ranks are unchanged unless
    a twin crashes or NULL-ranks a new row differently): a ZERO-NORM
    vector (a padding row), a NULL embedding and an EMPTY embedding
    (failed-encoder rows — both defined as similarity 0)."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_zero_norm")
    for t in TABLES:
        if t == "embeddings":
            continue
        shutil.copyfile(f"{SRC}/{t}.parquet", str(d / f"{t}.parquet"))
    con = duckdb.connect()
    dim, maxid = con.execute(
        "SELECT max(len(embedding)), max(vec_id)"
        f" FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()
    zeros = "[" + ",".join(["0.0"] * int(dim)) + "]::FLOAT[]"
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/embeddings.parquet')
          UNION ALL
          SELECT {int(maxid) + 1} AS vec_id, {zeros} AS embedding,
                 0 AS label
          UNION ALL
          SELECT {int(maxid) + 2}, NULL::FLOAT[], 0
          UNION ALL
          SELECT {int(maxid) + 3}, []::FLOAT[], 0
        ) TO '{d / "embeddings.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", COSINE_QUERIES)
def test_cosine_query_matches_oracle_with_zero_vector(
    spark, zero_norm_sf_dir, name
):
    import duckdb

    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    sdf = fn(spark, zero_norm_sf_dir)
    srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{zero_norm_sf_dir}/{t}.parquet')"
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
