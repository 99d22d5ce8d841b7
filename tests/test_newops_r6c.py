"""Round-6 fourth-wave operators: HITS, k-core peeling, OLS trends,
bigram LM scoring, conjunctive search, cascade delete, image phash
near-dup, audio activity segments."""

from __future__ import annotations

import pytest


def test_hits_hand_graph(spark):
    """c1→{s1,s2}, c2→s1: two exact integer half-round updates."""
    from obsplus_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [("c1", "s1"), ("c1", "s2"), ("c2", "s1"), ("c1", "s1")],
        "src string, dst string",
    )
    rows = [tuple(r) for r in hits_scores(edges, iterations=2, k=10).collect()]
    # a1: s1=2, s2=1; h1: c1=3, c2=2; a2: s1=5, s2=3; h2: c1=8, c2=5
    assert rows == [
        ("s1", 5, 0),
        ("s2", 3, 0),
        ("c1", 0, 8),
        ("c2", 0, 5),
    ]


def test_hits_single_iteration_and_validation(spark):
    from obsplus_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    rows = {r["node"]: (r["auth"], r["hub"]) for r in
            hits_scores(edges, iterations=1, k=10).collect()}
    # a1: b=1, c=1; h1: a=auth(b)=1, b=auth(c)=1
    assert rows == {"a": (0, 1), "b": (1, 1), "c": (1, 0)}
    with pytest.raises(ValueError, match="iterations"):
        hits_scores(edges, iterations=0)
    # VERDICT r7 #4: >3 iterations can overflow BIGINT mid-job under
    # ANSI mode ((max degree)^(2*its)); must fail fast at validation
    with pytest.raises(ValueError, match="at most 3"):
        hits_scores(edges, iterations=4)
    # depth 3 remains available (upper edge of the validated range)
    assert hits_scores(edges, iterations=3, k=2).count() == 2


def test_k_core_triangle_with_pendant_chain(spark):
    """Triangle {1,2,3} + chain 3-4-5: the 2-core is the triangle, and
    reaching it needs the cascade (5 peels, THEN 4 peels)."""
    from obsplus_spark.operators.graph import k_core_peel

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 1)],
        "src long, dst long",
    )
    rows = {r["node"]: r["degree"] for r in
            k_core_peel(edges, k=2, rounds=3).collect()}
    assert rows == {1: 2, 2: 2, 3: 2}


def test_k_core_bounded_rounds_leave_unconverged_tail(spark):
    """Fixed-round semantics: one round on a 6-chain peels only the
    endpoints — the surviving frame still has degree-1 nodes, exactly
    as documented (min degree < k reveals the unconverged peel)."""
    from obsplus_spark.operators.graph import k_core_peel

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "src long, dst long"
    )
    rows = {r["node"]: r["degree"] for r in
            k_core_peel(edges, k=2, rounds=1).collect()}
    assert rows == {2: 1, 3: 2, 4: 2, 5: 1}
    # converged: the chain has no 2-core at all
    assert k_core_peel(edges, k=2, rounds=4).count() == 0


def test_k_core_validates(spark):
    from obsplus_spark.operators.graph import k_core_peel

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="k must"):
        k_core_peel(edges, k=0)
    with pytest.raises(ValueError, match="rounds"):
        k_core_peel(edges, k=2, rounds=0)


def test_ols_trends_hand_cases(spark):
    from obsplus_spark.operators.sessions import ols_trends

    day = 86_400_000_000_000
    rows = [
        # perfect line y = x + 1
        ("a", 0 * day, 1.0), ("a", 1 * day, 2.0), ("a", 2 * day, 3.0),
        # single point: no slope
        ("b", 5 * day, 7.0),
        # two points on the same day: integer denominator exactly 0
        ("c", 0, 1.0), ("c", 1000, 9.0),
        # constant y across days: slope 0, r2 undefined
        ("d", 0 * day, 4.0), ("d", 3 * day, 4.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, y double")
    out = {r["k"]: r for r in ols_trends(df, "k", "t", "y").collect()}
    assert out["a"]["slope"] == 1.0
    assert out["a"]["intercept"] == 1.0
    assert out["a"]["r2"] == 1.0
    assert out["b"]["slope"] is None and out["b"]["r2"] is None
    assert out["c"]["slope"] is None
    assert out["d"]["slope"] == 0.0 and out["d"]["intercept"] == 4.0
    assert out["d"]["r2"] is None
    with pytest.raises(ValueError, match="day_ns"):
        ols_trends(df, "k", "t", "y", day_ns=0)


def test_ols_trends_matches_numpy_polyfit(spark):
    import numpy as np

    from obsplus_spark.operators.sessions import ols_trends

    rng_vals = [((i * 37 + 11) % 100) / 7.0 for i in range(40)]
    day = 86_400_000_000_000
    rows = [("u", (i % 13) * day + i, float(v))
            for i, v in enumerate(rng_vals)]
    df = spark.createDataFrame(rows, "k string, t long, y double")
    got = ols_trends(df, "k", "t", "y").collect()[0]
    x = np.array([i % 13 for i in range(40)], dtype=float)
    y = np.array(rng_vals)
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert got["slope"] == pytest.approx(slope, abs=2e-6)
    assert got["intercept"] == pytest.approx(intercept, abs=2e-6)
    assert got["r2"] == pytest.approx(r * r, abs=2e-6)


def test_bigram_logprob_matches_python_model(spark):
    import math

    docs = [
        (1, "a b a b c"),
        (2, "b a b a"),
        (3, "c c a"),
        (4, "solo"),          # < 2 tokens: absent
        (5, "   "),           # blank: absent
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from obsplus_spark.operators.text import bigram_logprob

    out = {r["doc_id"]: r for r in bigram_logprob(df, alpha=0.5).collect()}
    assert set(out) == {1, 2, 3}

    # python reference model
    corpus = {1: "a b a b c", 2: "b a b a", 3: "c c a"}
    bgs: dict[tuple[str, str], int] = {}
    left: dict[str, int] = {}
    vocab = set()
    for t in corpus.values():
        ws = t.split()
        for w1, w2 in zip(ws, ws[1:]):
            bgs[(w1, w2)] = bgs.get((w1, w2), 0) + 1
            left[w1] = left.get(w1, 0) + 1
            vocab.update((w1, w2))
    v = len(vocab)
    for did, t in corpus.items():
        ws = t.split()
        pairs = list(zip(ws, ws[1:]))
        bits = -sum(
            math.log2((bgs[p] + 0.5) / (left[p[0]] + 0.5 * v))
            for p in pairs
        ) / len(pairs)
        assert out[did]["n_bigrams"] == len(pairs)
        assert out[did]["bits_per_bigram"] == pytest.approx(bits, abs=2e-6)

    with pytest.raises(ValueError, match="alpha"):
        bigram_logprob(df, alpha=0.0)


def test_conjunctive_search_all_terms_required(spark):
    from obsplus_spark.operators.text import conjunctive_search

    docs = [
        (1, "Spark and merge and VECTOR"),     # all 3, tf 3
        (2, "spark spark merge vector vector"),  # all 3, tf 5
        (3, "spark merge"),                     # missing vector
        (4, "sparkly merge vector"),            # substring is not a match
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = [tuple(r) for r in
            conjunctive_search(df, ["Spark", "merge", "vector"]).collect()]
    assert rows == [(2, 5), (1, 3)]
    # k caps the list after the deterministic (tf DESC, id) order
    rows = conjunctive_search(df, ["spark", "merge", "vector"], k=1).collect()
    assert [tuple(r) for r in rows] == [(2, 5)]
    with pytest.raises(ValueError, match="terms"):
        conjunctive_search(df, [])
    with pytest.raises(ValueError, match="k must"):
        conjunctive_search(df, ["a"], k=0)


def test_cascade_delete_hand_chain(spark):
    from obsplus_spark.operators.joins import cascade_delete

    users = spark.createDataFrame(
        [(1,), (2,), (3,)], "uid long"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, None)],
        "oid long, uid long",
    )
    items = spark.createDataFrame(
        [(100, 10), (101, 10), (102, 12), (103, 13), (104, 99)],
        "iid long, oid long",
    )
    roots = spark.createDataFrame([(1,), (9,), (1,)], "uid long")
    out = {r["table_name"]: (r["n_purged"], r["n_kept"]) for r in
           cascade_delete(
               roots,
               [("users", users, "uid", "uid"),
                ("orders", orders, "uid", "oid"),
                ("items", items, "oid", None)],
           ).collect()}
    # user 1 → orders 10, 11 → items 100, 101; NULL-fk order 13 kept
    assert out == {
        "users": (1, 2),
        "orders": (2, 2),
        "items": (2, 3),
    }


def test_cascade_delete_validates(spark):
    from obsplus_spark.operators.joins import cascade_delete

    roots = spark.createDataFrame([(1, 2)], "a long, b long")
    one = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="one column"):
        cascade_delete(roots, [("t", one, "a", None)])
    with pytest.raises(ValueError, match="chain"):
        cascade_delete(one, [])


def test_average_hash_halves():
    import numpy as np

    from obsplus_spark.operators.codecs import average_hash

    img = np.zeros((8, 16), dtype=np.uint8)
    img[:4, :] = 200  # bright top half -> first two bands all 1s
    lo, hi = average_hash(img)
    assert lo == 0xFFFFFFFF and hi == 0
    # too small for one cell per axis
    assert average_hash(np.zeros((3, 16), dtype=np.uint8)) == (None, None)
    with pytest.raises(ValueError, match="grid"):
        average_hash(img, grid_rows=9, grid_cols=9)
    with pytest.raises(ValueError, match="2-D"):
        average_hash(np.zeros((4, 4, 3), dtype=np.uint8))


def test_average_hash_integer_rule_matches_float_means():
    import numpy as np

    from obsplus_spark.operators.codecs import average_hash

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(12, 16), dtype=np.int64)
    lo, hi = average_hash(img)
    # ch = 3 -> all 12 rows used; cell (r, c) sums 3 rows of column c
    cells = img.reshape(4, 3, 16, 1).sum(axis=(1, 3)).reshape(-1)
    total = cells.sum()
    for k in range(64):
        want = 1 if cells[k] * 64 > total else 0
        got = (lo >> k) & 1 if k < 32 else (hi >> (k - 32)) & 1
        assert got == want


def test_phash_near_dup_banding_and_verify(spark):
    from obsplus_spark.operators.dedup import phash_near_dup

    rows = [
        (1, 0b1010_1100_1111_0000, 0),        # base
        (2, 0b1010_1100_1111_0000, 0),        # identical -> hamming 0
        # differs only inside band 0 (5 low bits): bands 1-3 equal
        (3, 0b1010_1100_1110_1111, 0),
        # 1 bit flipped in EVERY band: no band collides with 1 despite
        # hamming 4 (the documented pigeonhole miss above d=3)
        (4, 0b1010_1100_1111_0000 ^ (1 | (1 << 16)), 1 | (1 << 16)),
    ]
    df = spark.createDataFrame(rows, "id long, h_lo long, h_hi long")
    pairs = {(r["id1"], r["id2"]): r["hamming"] for r in
             phash_near_dup(df, max_hamming=8).collect()}
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 5  # 1_0000 vs 0_1111: 5 flipped bits
    assert pairs[(2, 3)] == 5
    assert (1, 4) not in pairs and (2, 4) not in pairs
    with pytest.raises(ValueError, match="max_hamming"):
        phash_near_dup(df, max_hamming=-1)


def test_activity_segments_runs_and_gaps(spark):
    from obsplus_spark.operators.multimodal import activity_segments

    frames = spark.createDataFrame(
        [
            ("a", 0, 100), ("a", 1, 100), ("a", 2, 5),   # run 0-1
            ("a", 3, 100),                                # run 3
            ("a", 5, 100), ("a", 6, 100),                 # index gap breaks
            ("b", 0, 5),                                  # never active
        ],
        "signal_id string, frame_idx long, energy long",
    )
    rows = sorted(
        tuple(r) for r in activity_segments(frames, threshold=50).collect()
    )
    assert rows == [
        ("a", 0, 1, 2, 200),
        ("a", 3, 3, 1, 100),
        ("a", 5, 6, 2, 200),
    ]


def test_activity_segments_threshold_is_strict(spark):
    from obsplus_spark.operators.multimodal import activity_segments

    frames = spark.createDataFrame(
        [("a", 0, 50)], "signal_id string, frame_idx long, energy long"
    )
    assert activity_segments(frames, threshold=50).count() == 0
    assert activity_segments(frames, threshold=49).count() == 1


def test_duplicated_spans_hand_case(spark):
    from obsplus_spark.operators.dedup import duplicated_spans

    docs = [
        # "x y z w" appears in docs 1 and 2 -> 2 consecutive dup 3-grams
        (1, "a x y z w b"),
        (2, "c x y z w d"),
        (3, "nothing shared here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           duplicated_spans(df, n=3, min_run=2).collect()}
    assert set(out) == {1, 2}
    for did in (1, 2):
        assert out[did]["n_runs"] == 1
        assert out[did]["max_run_grams"] == 2
        assert out[did]["max_span_tokens"] == 4  # "x y z w"
    with pytest.raises(ValueError, match="min_run"):
        duplicated_spans(df, min_run=0)


def test_duplicated_spans_intra_doc_repeat_counts(spark):
    """A phrase repeated INSIDE one doc is duplicated text too."""
    from obsplus_spark.operators.dedup import duplicated_spans

    df = spark.createDataFrame(
        [(1, "p q r s p q r s")], "doc_id long, text string"
    )
    out = duplicated_spans(df, n=3, min_run=1).collect()
    # grams: pqr qrs rsp spq pqr qrs -> pqr, qrs duplicated at
    # positions 0,1 and 4,5 -> two runs of length 2
    assert len(out) == 1
    assert out[0]["n_runs"] == 2
    assert out[0]["max_run_grams"] == 2


def test_column_correlations_hand_case(spark):
    import numpy as np

    from obsplus_spark.operators.sessions import column_correlations

    x = [1.0, 2.0, 3.0, 4.0, 5.0]
    y = [2.0, 4.1, 5.9, 8.2, 10.0]       # nearly 2x
    z = [5.0, 5.0, 5.0, 5.0, 5.0]        # constant -> NULL r
    rows = list(zip(x, y, z))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r["col_x"], r["col_y"]): r for r in
           column_correlations(df, ["x", "y", "z"]).collect()}
    r_xy = np.corrcoef(x, y)[0, 1]
    assert out[("x", "y")]["r"] == pytest.approx(r_xy, abs=2e-6)
    assert out[("x", "y")]["n"] == 5
    assert out[("x", "z")]["r"] is None
    assert out[("y", "z")]["r"] is None
    with pytest.raises(ValueError, match="two distinct"):
        column_correlations(df, ["x"])


def test_column_correlations_listwise_null_drop(spark):
    from obsplus_spark.operators.sessions import column_correlations

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, None), (None, 4.0)],
        "x double, y double",
    )
    out = column_correlations(df, ["x", "y"]).collect()[0]
    assert out["n"] == 2
    assert out["r"] == 1.0


def test_mad_outliers_hand_case(spark):
    from obsplus_spark.operators.sessions import mad_outliers

    # key "a": values 1..9 plus one wild 1000. n=10, discrete median
    # (rank ceil(10/2)=5 under (value,id)) = 5. devs: |v-5| ->
    # 4,3,2,1,0,1,2,3,4,995; sorted devs rank 5 = 2 -> mad 2.
    # outliers: dev > 3*2=6 -> only 995.
    rows = [("a", i, float(v)) for i, v in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    df = spark.createDataFrame(rows, "k string, rid long, v double")
    out = mad_outliers(df, "k", "v", "rid", k=3.0).collect()[0]
    assert out["n"] == 10
    assert out["med"] == 5.0
    assert out["mad"] == 2.0
    assert out["n_outliers"] == 1
    with pytest.raises(ValueError, match="k must"):
        mad_outliers(df, "k", "v", "rid", k=0)


def test_mad_outliers_constant_group(spark):
    """Constant values: MAD 0, nothing exceeds 3*0 unless dev > 0."""
    from obsplus_spark.operators.sessions import mad_outliers

    rows = [("c", i, 7.0) for i in range(5)] + [("c", 99, 8.0)]
    df = spark.createDataFrame(rows, "k string, rid long, v double")
    out = mad_outliers(df, "k", "v", "rid").collect()[0]
    assert out["med"] == 7.0 and out["mad"] == 0.0
    assert out["n_outliers"] == 1  # the single 8.0 has dev 1 > 0


def test_k_core_matches_python_peel_on_random_graphs(spark):
    """Fixed-round peel == a pure-python replication of the same
    semantics on random graphs (property check)."""
    import collections
    import random

    from obsplus_spark.operators.graph import k_core_peel

    rng = random.Random(42)
    for _ in range(3):
        edges = set()
        for _ in range(60):
            a, b = rng.randrange(15), rng.randrange(15)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        k, rounds = 3, 4
        es = set(edges)
        for _ in range(rounds):
            deg = collections.Counter()
            for a, b in es:
                deg[a] += 1
                deg[b] += 1
            keep = {n for n, d in deg.items() if d >= k}
            es = {(a, b) for a, b in es if a in keep and b in keep}
        expect = collections.Counter()
        for a, b in es:
            expect[a] += 1
            expect[b] += 1
        df = spark.createDataFrame(list(edges), "src long, dst long")
        got = {r["node"]: r["degree"]
               for r in k_core_peel(df, k=k, rounds=rounds).collect()}
        assert got == dict(expect)


def test_duplicated_spans_matches_python_brute_force(spark):
    import collections

    from obsplus_spark.operators.dedup import duplicated_spans

    docs = {
        1: "a b c d e f a b c d",   # intra-doc repeated chain
        2: "x a b c d y",           # shares the 'a b c d' grams
        3: "q w e r t y u",         # nothing duplicated
        4: "a b",                   # < n tokens
    }
    n = 3
    grams = collections.Counter()
    pos = {}
    for d, t in docs.items():
        ws = t.split()
        gs = [tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)]
        pos[d] = gs
        grams.update(gs)
    expect = {}
    for d, gs in pos.items():
        dup = [i for i, g in enumerate(gs) if grams[g] > 1]
        runs = []
        for i in dup:
            if runs and i == runs[-1][1] + 1:
                runs[-1][1] = i
            else:
                runs.append([i, i])
        lens = [(b - a + 1) for a, b in runs if (b - a + 1) >= 2]
        if lens:
            expect[d] = (len(lens), max(lens), max(lens) + n - 1)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_runs"], r["max_run_grams"],
                         r["max_span_tokens"])
           for r in duplicated_spans(df, n=3, min_run=2).collect()}
    assert got == expect


def test_cosine_family_survives_zero_norm_vectors(spark):
    """Degenerate-corpus sweep finding (r6): ONE zero vector (a padding
    row, a failed encoder) used to DIVIDE_BY_ZERO-abort every
    cosine-based operator under ANSI. The rule is now defined:
    zero-norm vectors are similarity 0 to everything."""
    from obsplus_spark.operators.similarity import (
        cosine,
        cosine_topk,
        ivf_assign,
    )
    from pyspark.sql import functions as F

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    # scalar helper: zero-norm pair -> exactly 0, no error
    out = vecs.select(
        cosine(F.col("embedding"), F.array(F.lit(0.0), F.lit(0.0)))
        .alias("c")
    ).collect()
    assert [r.c for r in out] == [0.0, 0.0, 0.0]
    # top-k with a zero query vector and a zero corpus vector
    qs = spark.createDataFrame(
        [(10, [1.0, 1.0]), (11, [0.0, 0.0])],
        "query_id long, query_vec array<float>",
    )
    rows = cosine_topk(vecs, qs, k=3).collect()
    assert len(rows) > 0  # completed without DIVIDE_BY_ZERO
    # IVF assignment with a zero vector in the corpus
    asg, _cents = ivf_assign(vecs, n_clusters=2)
    assert asg.count() == 3
