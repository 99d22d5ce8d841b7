"""Degenerate-graph regression net for the iterative-graph family —
the fourth leg of the sweep trilogy (zero-norm cosine, degenerate text,
degenerate events): real link graphs grow self-loops, NULL endpoints
(unresolved ids), exact duplicate edges, and sometimes arrive empty,
and the engine and its DuckDB twin must agree on every one of them
BEFORE a driver fixture does. Extends sf0.001 orders/lineitem with
rows that induce each degeneracy in the DERIVED graphs of the five
queries() entries (pagerank, hits_auth, k_core, bfs_hops,
triangle_count), plus an all-empty-fact-table variant.
"""

from __future__ import annotations

import math
import shutil

import pytest

SRC = "/root/testdata/sf0.001"

GRAPH_QUERIES = [
    "pagerank",
    "hits_auth",
    "k_core",
    "bfs_hops",
    "triangle_count",
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


def _compare(spark, sf_dir, name):
    import duckdb

    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    sdf = fn(spark, sf_dir)
    srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{sf_dir}/{t}.parquet')"
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
    return len(srows)


@pytest.fixture(scope="module")
def degenerate_graph_sf_dir(tmp_path_factory):
    """sf0.001 with orders/lineitem rows inducing, in the derived
    graphs: NULL endpoints (NULL o_custkey / NULL l_suppkey), a k_core
    self-loop (custkey ≡ 7·orderkey+3 mod 4001), a triangle self-loop
    (custkey ≡ orderkey mod 5003), a pagerank/bfs self-loop
    (l_suppkey = o_custkey), and exact duplicate edges (orderkeys
    congruent mod 4001·5003 under the same custkey, plus a doubled
    lineitem row)."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_degen_graph")
    for t in TABLES:
        if t in ("orders", "lineitem"):
            continue
        shutil.copyfile(f"{SRC}/{t}.parquet", str(d / f"{t}.parquet"))
    con = duckdb.connect()
    (b,) = con.execute(
        f"SELECT max(o_orderkey) FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()
    b = int(b)
    kc_loop_cust = (7 * (b + 2) + 3) % 4001  # k_core self-loop fold
    dup_stride = 4001 * 5003  # same folded edge in BOTH orders graphs
    new_orders = [
        # (o_orderkey, o_custkey expr) — NULL custkey first
        (b + 1, "NULL"),
        (b + 2, str(kc_loop_cust)),
        (b + 3, str(b + 3)),          # triangle self-loop
        (b + 4, "17"),
        (b + 4 + dup_stride, "17"),   # duplicate folded edge
        (b + 5, "3"),                 # pagerank self-loop (supp 3 below)
    ]
    union = "".join(
        f"""
        UNION ALL
        SELECT * REPLACE ({ok} AS o_orderkey, {ck} AS o_custkey)
        FROM read_parquet('{SRC}/orders.parquet') LIMIT 1
        """
        for ok, ck in new_orders
    )
    # UNION ALL ... LIMIT binds per-SELECT in DuckDB only with
    # parentheses; wrap each arm explicitly
    arms = [
        f"SELECT * FROM read_parquet('{SRC}/orders.parquet')"
    ] + [
        f"(SELECT * REPLACE (CAST({ok} AS BIGINT) AS o_orderkey,"
        f" CAST({ck} AS BIGINT) AS o_custkey)"
        f" FROM read_parquet('{SRC}/orders.parquet') LIMIT 1)"
        for ok, ck in new_orders
    ]
    del union
    con.execute(
        f"COPY ({' UNION ALL '.join(arms)})"
        f" TO '{d / 'orders.parquet'}' (FORMAT PARQUET)"
    )
    li_arms = [
        f"SELECT * FROM read_parquet('{SRC}/lineitem.parquet')"
    ] + [
        # NULL-custkey order shipped by supplier 5 → NULL-dst edge
        f"(SELECT * REPLACE (CAST({b + 1} AS BIGINT) AS l_orderkey,"
        f" CAST(5 AS BIGINT) AS l_suppkey)"
        f" FROM read_parquet('{SRC}/lineitem.parquet') LIMIT 1)",
        # NULL supplier on a valid order → NULL-src edge
        f"(SELECT * REPLACE (CAST({b + 4} AS BIGINT) AS l_orderkey,"
        f" CAST(NULL AS BIGINT) AS l_suppkey)"
        f" FROM read_parquet('{SRC}/lineitem.parquet') LIMIT 1)",
        # pagerank/bfs self-loop: supplier 3 ships order of customer 3
        f"(SELECT * REPLACE (CAST({b + 5} AS BIGINT) AS l_orderkey,"
        f" CAST(3 AS BIGINT) AS l_suppkey)"
        f" FROM read_parquet('{SRC}/lineitem.parquet') LIMIT 1)",
        # exact duplicate edge (same order, same supplier, twice)
        f"(SELECT * REPLACE (CAST({b + 2} AS BIGINT) AS l_orderkey,"
        f" CAST(9 AS BIGINT) AS l_suppkey)"
        f" FROM read_parquet('{SRC}/lineitem.parquet') LIMIT 1)",
        f"(SELECT * REPLACE (CAST({b + 2} AS BIGINT) AS l_orderkey,"
        f" CAST(9 AS BIGINT) AS l_suppkey)"
        f" FROM read_parquet('{SRC}/lineitem.parquet') LIMIT 1)",
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(li_arms)})"
        f" TO '{d / 'lineitem.parquet'}' (FORMAT PARQUET)"
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def empty_graph_sf_dir(tmp_path_factory):
    """sf0.001 with ZERO-row orders and lineitem (schema preserved):
    every derived graph is empty — the operators must return their
    documented empty-graph shape, matching the oracle, without error."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_empty_graph")
    for t in TABLES:
        if t in ("orders", "lineitem"):
            continue
        shutil.copyfile(f"{SRC}/{t}.parquet", str(d / f"{t}.parquet"))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            f" WHERE 1 = 0) TO '{d / (t + '.parquet')}' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", GRAPH_QUERIES)
def test_graph_query_matches_oracle_with_degenerate_edges(
    spark, degenerate_graph_sf_dir, name
):
    _compare(spark, degenerate_graph_sf_dir, name)


@pytest.mark.parametrize("name", GRAPH_QUERIES)
def test_graph_query_matches_oracle_on_empty_graph(
    spark, empty_graph_sf_dir, name
):
    n = _compare(spark, empty_graph_sf_dir, name)
    # bfs still reports its two seed nodes at distance 0; every other
    # query has nothing to rank on an empty graph
    assert n == (2 if name == "bfs_hops" else 0)
