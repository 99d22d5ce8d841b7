"""Targeted degenerate sweep for the r10 operators (VERDICT r10 "Next
round" #7) — every prior sweep of this pattern caught real bugs, so
each new operator gets its named edge shapes checked ENGINE vs a DuckDB
replay of the registered oracle's conventions:

- ``stitch_pairs``: documents with EXACTLY 2k tokens (the participation
  boundary) and an all-boilerplate corpus (every seam window hot).
- ``curriculum_key``: score exactly 1.0 (must clamp into the top bin,
  not bin=bins), negative scores (clamp to 0), NULL scores.
- ``group_sample``: k larger than the group and NULL group keys.
- ``dim_truncation_eval``: requested dims beyond the vector width and
  a single-row corpus (no consecutive pair).
"""

from __future__ import annotations

import math

import duckdb
import pytest


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        cells = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 9)
            cells.append(v)
        out.append(tuple(cells))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def _compare(sdf, con, sql):
    srows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = _norm(res.fetchall(), ocols)
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), (len(srows), len(orows), srows, orows)
    for a, b in zip(srows, orows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert abs(x - y) <= 1e-6 + 1e-6 * abs(y), (a, b)
            else:
                assert x == y, (a, b)


# ---------------------------------------------------------------- stitch


def test_stitch_pairs_exactly_2k_tokens(spark):
    """k=2: 4-token docs sit ON the participation boundary (>= 2k) —
    the tail window of doc 1 equals the head window of doc 2; a
    3-token doc must NOT participate even though it contains the seam."""
    from obsplus_spark.operators.dedup import stitch_pairs

    rows = [
        (1, "a b x y"),        # exactly 2k; tail = "x y"
        (2, "x y c d"),        # exactly 2k; head = "x y"
        (3, "x y c"),          # 3 tokens < 2k: out, despite head "x y"
        (4, "p q r s t"),      # no seam partner
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = stitch_pairs(df, k=2).collect()
    assert [(r.prev_id, r.next_id) for r in out] == [(1, 2)]

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", rows)
        sdf = stitch_pairs(df, k=2)
        _compare(
            sdf,
            con,
            r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                         trim(lower(coalesce(text, ''))), '\s+'),
                         x -> x != '') AS w
              FROM d
            ),
            wins AS (
              SELECT doc_id,
                     array_to_string(list_slice(w, 1, 2), ' ') AS hk,
                     array_to_string(list_slice(w, len(w) - 1, len(w)),
                                     ' ') AS tk
              FROM t WHERE len(w) >= 4
            ),
            hot AS (
              SELECT hk AS key FROM wins GROUP BY hk HAVING count(*) > 32
              UNION
              SELECT tk FROM wins GROUP BY tk HAVING count(*) > 32
            ),
            heads AS (SELECT doc_id, hk FROM wins
                      WHERE hk NOT IN (SELECT key FROM hot)),
            tails AS (SELECT doc_id, tk FROM wins
                      WHERE tk NOT IN (SELECT key FROM hot))
            SELECT t.doc_id AS prev_id, h.doc_id AS next_id
            FROM tails t JOIN heads h
              ON t.tk = h.hk AND t.doc_id != h.doc_id
            """,
        )
    finally:
        con.close()


def test_stitch_pairs_all_boilerplate_corpus(spark):
    """Every document shares the same head AND tail window: with
    max_bucket below the corpus size both windows go hot and ZERO
    pairs come back — template chrome must not explode into ~n^2
    seam pairs."""
    from obsplus_spark.operators.dedup import stitch_pairs

    rows = [(i, "nav bar body text here nav bar") for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert stitch_pairs(df, k=2, max_bucket=3).count() == 0
    # raising max_bucket above the corpus size re-admits the windows
    # (head 'nav bar' == tail 'nav bar' → all ordered cross pairs)
    n = len(rows)
    assert stitch_pairs(df, k=2, max_bucket=99).count() == n * (n - 1)


def test_stitch_pairs_self_seam_excluded(spark):
    """A doc whose own tail equals its own head never pairs with
    itself (id != id guard), but still seams with others."""
    from obsplus_spark.operators.dedup import stitch_pairs

    rows = [(1, "x y m m x y"), (2, "x y q r s t")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = stitch_pairs(df, k=2).collect()
    assert [(r.prev_id, r.next_id) for r in out] == [(1, 2)]


# ----------------------------------------------------------- curriculum


def test_curriculum_key_boundary_scores(spark):
    """score=1.0 lands in the TOP bin (bins-1, not bins); negative
    scores clamp to bin 0; NULL scores yield NULL bin AND key."""
    from obsplus_spark.operators.dedup import curriculum_key

    rows = [
        (1, 1.0),     # exact top boundary
        (2, -0.5),    # negative
        (3, None),    # NULL
        (4, 0.0),     # exact bottom
        (5, 2.5),     # above range
        (6, 0.999999999),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = {r.doc_id: (r.bin, r.curriculum_key)
           for r in curriculum_key(df, "score", bins=4).collect()}
    assert got[1][0] == 3
    assert got[2][0] == 0
    assert got[3] == (None, None)
    assert got[4][0] == 0
    assert got[5][0] == 3
    assert got[6][0] == 3
    # key = bin + u with u in [0, 1): the integer part IS the bin
    for d, (b, key) in got.items():
        if b is not None:
            assert b <= key < b + 1

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE d(doc_id BIGINT, score DOUBLE)")
        con.executemany("INSERT INTO d VALUES (?, ?)", rows)
        _compare(
            curriculum_key(df, "score", bins=4),
            con,
            """
            SELECT doc_id,
                   CASE WHEN score IS NULL THEN NULL
                        ELSE CAST(least(3, greatest(0,
                            CAST(floor(score * 4) AS INTEGER)))
                          AS INTEGER) END AS bin,
                   CASE WHEN score IS NULL THEN NULL
                        ELSE round(CAST(least(3, greatest(0,
                            CAST(floor(score * 4) AS INTEGER)))
                          + (('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                              || ''), 1, 8))::BIGINT)
                            / CAST(4294967296 AS DOUBLE) AS DOUBLE), 6)
                   END AS curriculum_key
            FROM d
            """,
        )
    finally:
        con.close()


# ----------------------------------------------------------- group_sample


def test_group_sample_k_exceeds_group_and_null_groups(spark):
    """k > group size keeps the whole group (ranks 1..n); NULL group
    keys form their OWN group — never merged into a named group,
    never dropped."""
    from obsplus_spark.operators.dedup import group_sample

    rows = [
        (1, "a"), (2, "a"),            # group of 2, k=5
        (3, None), (4, None), (5, None),  # NULL group of 3
        (6, "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = group_sample(df, "grp", k=5).collect()
    assert len(out) == 6  # nothing dropped anywhere
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r.sample_rank)
    assert sorted(by_grp["a"]) == [1, 2]
    assert sorted(by_grp[None]) == [1, 2, 3]
    assert by_grp["b"] == [1]

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE d(doc_id BIGINT, grp VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", rows)
        _compare(
            group_sample(df, "grp", k=2),
            con,
            """
            SELECT doc_id, grp, sample_rank FROM (
              SELECT doc_id, grp,
                     row_number() OVER (PARTITION BY grp
                       ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                           || ''), 1, 8))::BIGINT, doc_id) AS sample_rank
              FROM d
            ) WHERE sample_rank <= 2
            """,
        )
    finally:
        con.close()


# ------------------------------------------------------------- dim_trunc


def test_dim_truncation_dims_beyond_width(spark):
    """A requested dim wider than the vectors degrades to the full
    cosine on BOTH engines (Spark slice caps at size; the oracle's
    series is gated on len) — mae exactly 0, sign_agree exactly 1."""
    from obsplus_spark.operators.similarity import dim_truncation_eval

    rows = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [2.0, 1.0, 0.0, 1.0]),
        (3, [0.5, 0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.dim: r for r in
           dim_truncation_eval(df, dims=(2, 64)).collect()}
    assert out[64].n_pairs == 2
    assert out[64].mae == 0.0
    assert out[64].sign_agree == 1.0
    assert out[2].n_pairs == 2

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE e(vec_id BIGINT, embedding DOUBLE[])")
        con.executemany("INSERT INTO e VALUES (?, ?)", rows)
        _compare(
            dim_truncation_eval(df, dims=(2, 64)),
            con,
            """
            WITH p AS (
              SELECT a.vec_id AS pid, a.embedding AS va, b.embedding AS vb
              FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
            ),
            x AS (
              SELECT p.pid, g.i,
                     CAST(va[CAST(g.i AS INTEGER)] AS DOUBLE) AS xa,
                     CAST(vb[CAST(g.i AS INTEGER)] AS DOUBLE) AS xb
              FROM p, generate_series(1, 4096) AS g(i)
              WHERE g.i <= len(va)
            ),
            s AS (
              SELECT x.pid, d.dim,
                     sum(CASE WHEN x.i <= d.dim THEN xa * xb END) AS dot_d,
                     sum(CASE WHEN x.i <= d.dim THEN xa * xa END) AS na_d,
                     sum(CASE WHEN x.i <= d.dim THEN xb * xb END) AS nb_d,
                     sum(xa * xb) AS dot_f,
                     sum(xa * xa) AS na_f,
                     sum(xb * xb) AS nb_f
              FROM x, (VALUES (2), (64)) AS d(dim)
              GROUP BY x.pid, d.dim
            ),
            c AS (
              SELECT dim,
                     dot_d / nullif(sqrt(na_d) * sqrt(nb_d), 0e0) AS c_d,
                     dot_f / nullif(sqrt(na_f) * sqrt(nb_f), 0e0) AS c_full
              FROM s
            )
            SELECT CAST(dim AS INTEGER) AS dim,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   round(avg(abs(c_d - c_full)), 6) AS mae,
                   round(avg(CASE WHEN (c_d >= 0) = (c_full >= 0)
                                  THEN 1e0 ELSE 0e0 END), 6) AS sign_agree
            FROM c
            WHERE c_d IS NOT NULL AND c_full IS NOT NULL
            GROUP BY dim ORDER BY dim
            """,
        )
    finally:
        con.close()


def test_dim_truncation_single_row_corpus(spark):
    """One vector → no consecutive-id pair → EMPTY result (never a
    NULL-row or a division error)."""
    from obsplus_spark.operators.similarity import dim_truncation_eval

    df = spark.createDataFrame(
        [(7, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    assert dim_truncation_eval(df, dims=(2,)).count() == 0


def test_dim_truncation_zero_norm_pair_dropped(spark):
    """A zero vector poisons its pair's cosine to NULL via the house
    nullif rule — the pair drops from every width, it never divides
    by zero or emits NaN."""
    from obsplus_spark.operators.similarity import dim_truncation_eval

    rows = [
        (1, [0.0, 0.0, 0.0]),
        (2, [1.0, 1.0, 1.0]),
        (3, [2.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.dim: r for r in dim_truncation_eval(df, dims=(3,)).collect()}
    # only the (2, 3) pair survives; (1, 2) has a zero-norm side
    assert out[3].n_pairs == 1
