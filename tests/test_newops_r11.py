"""Round-11 operators: span-granularity exact-substring dedup
(exact_substring_spans) and post-dedup mixture rebalancing
(mixture_rebalance)."""

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------- exact_substring_spans


def test_exact_spans_hand_corpus(spark):
    """Two docs sharing a 6-token substring: each reports ONE maximal
    run of 4 duplicated 3-grams = a 6-token span, at the right start
    offset; the unrelated doc reports nothing."""
    from obsplus_spark.operators.dedup import exact_substring_spans

    df = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta unique1 tail1"),
        (2, "pre2 alpha beta gamma delta epsilon zeta post2 q r"),
        (3, "nothing shared here at all in this one document"),
    ])
    out = sorted(
        tuple(r) for r in exact_substring_spans(df, n=3, min_run=2).collect()
    )
    assert out == [(1, 0, 4, 6), (2, 1, 4, 6)]


def test_exact_spans_multiple_runs_per_doc(spark):
    """Two disjoint duplicated regions in one doc emit two span ROWS
    (duplicated_spans would fold them into one stats row)."""
    from obsplus_spark.operators.dedup import exact_substring_spans

    df = _docs(spark, [
        (1, "a b c d X Y Z p q r s W"),
        (2, "a b c d m1 m2 m3 p q r s m4"),
    ])
    out = sorted(
        tuple(r) for r in exact_substring_spans(df, n=3, min_run=2).collect()
    )
    # "a b c d" = grams at pos 0,1 (run 2 -> 4 tokens); "p q r s" =
    # grams at pos 7,8 in doc1 / pos 7,8 in doc2
    assert out == [(1, 0, 2, 4), (1, 7, 2, 4), (2, 0, 2, 4), (2, 7, 2, 4)]


def test_exact_spans_min_count_raises_bar(spark):
    """min_count=3: a substring shared by only TWO docs stops
    qualifying; one shared by three still reports."""
    from obsplus_spark.operators.dedup import exact_substring_spans

    df = _docs(spark, [
        (1, "t u v w only2a x1 x2"),
        (2, "t u v w only2b y1 y2"),
        (3, "k l m n o p3a z1"),
        (4, "k l m n o p3b z2"),
        (5, "k l m n o p3c z3"),
    ])
    out = sorted(
        tuple(r)
        for r in exact_substring_spans(
            df, n=3, min_run=2, min_count=3
        ).collect()
    )
    # only the "k l m n o" family (3 docs, grams pos 0-2) survives
    assert out == [(3, 0, 3, 5), (4, 0, 3, 5), (5, 0, 3, 5)]


def test_exact_spans_degenerate_docs(spark):
    """NULL / empty / sub-n-token docs emit nothing and crash nothing."""
    from obsplus_spark.operators.dedup import exact_substring_spans

    df = _docs(spark, [
        (1, None), (2, ""), (3, "  "), (4, "one two"),
        (5, "one two"),  # 2 tokens < n=3: no grams even though duplicated
    ])
    assert exact_substring_spans(df, n=3, min_run=2).count() == 0


def test_exact_spans_validates(spark):
    from obsplus_spark.operators.dedup import exact_substring_spans

    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="n must be"):
        exact_substring_spans(df, n=0)
    with pytest.raises(ValueError, match="min_run must be"):
        exact_substring_spans(df, min_run=0)
    with pytest.raises(ValueError, match="min_count must be"):
        exact_substring_spans(df, min_count=1)


def test_exact_spans_two_keyed_exchanges(spark):
    """Same shuffle contract as duplicated_spans: ONE gram-keyed window
    exchange + ONE doc-keyed exchange shared by the run window and the
    (doc, run) roll-up — no joins."""
    from obsplus_spark.operators.dedup import exact_substring_spans

    df = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
    plan = (
        exact_substring_spans(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


# ----------------------------------------------------- mixture_rebalance


def _fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),
            (2, "a b c d", "s1"),
            (3, "x y", "s2"),
            (4, "z w q", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1)], "id long, cluster_id long"
    )
    return docs, labels


def test_mixture_rebalance_survivor_math(spark):
    """Cluster {1,2} keeps min-id 1; unpaired docs survive untouched;
    rates re-plan against KEPT tokens (s1: 0.5*10/4 = 1.25 > 1, the
    repetition a post-dedup plan needs)."""
    from obsplus_spark.operators.dedup import mixture_rebalance

    docs, labels = _fixture(spark)
    out = {r.source: r for r in mixture_rebalance(
        docs, labels, {"s1": 0.5, "s2": 0.5}, 10
    ).collect()}
    s1, s2 = out["s1"], out["s2"]
    assert (s1.n_docs, s1.kept_docs, s1.n_tokens, s1.kept_tokens) == (
        2, 1, 8, 4)
    assert (s1.sample_rate, s1.expected_tokens) == (1.25, 5)
    assert (s2.n_docs, s2.kept_docs, s2.kept_tokens) == (2, 2, 5)
    assert (s2.sample_rate, s2.expected_tokens) == (1.0, 5)


def test_mixture_rebalance_cap_and_missing_weight(spark):
    """The repeat cap clamps runaway rates; a source absent from the
    weight dict gets weight 0 / rate 0."""
    from obsplus_spark.operators.dedup import mixture_rebalance

    docs, labels = _fixture(spark)
    out = {r.source: r for r in mixture_rebalance(
        docs, labels, {"s1": 1.0}, 1000, max_repeat=2.0
    ).collect()}
    assert out["s1"].sample_rate == 2.0          # uncapped would be 250
    assert out["s1"].expected_tokens == 8        # 2.0 * 4 kept tokens
    assert out["s2"].weight == 0.0
    assert out["s2"].sample_rate == 0.0


def test_mixture_rebalance_all_dupes_source(spark):
    """A source whose every doc deduped away reports kept 0 and a NULL
    rate (0-token division), never a crash or an Inf."""
    from obsplus_spark.operators.dedup import mixture_rebalance

    docs = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "a b", "s1"), (3, "c", "s2")],
        "doc_id long, text string, source string",
    )
    # labels electing a NON-member id: neither doc 1 nor 2 survives
    labels = spark.createDataFrame(
        [(1, 0), (2, 0)], "id long, cluster_id long"
    )
    out = {r.source: r for r in mixture_rebalance(
        docs, labels, {"s1": 0.5, "s2": 0.5}, 10
    ).collect()}
    assert (out["s1"].kept_docs, out["s1"].kept_tokens) == (0, 0)
    assert out["s1"].sample_rate is None
    assert out["s1"].expected_tokens is None


def test_mixture_rebalance_validates(spark):
    from obsplus_spark.operators.dedup import mixture_rebalance

    docs, labels = _fixture(spark)
    with pytest.raises(ValueError, match="max_repeat must be"):
        mixture_rebalance(docs, labels, {"s1": 1.0}, 10, max_repeat=0)


def test_mixture_rebalance_one_join_one_agg(spark):
    """Plan contract: one equi-join against the label frame and one
    source-keyed aggregate — the corpus is never shuffled twice."""
    from obsplus_spark.operators.dedup import mixture_rebalance

    docs, labels = _fixture(spark)
    plan = (
        mixture_rebalance(docs, labels, {"s1": 0.5}, 10)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Join LeftOuter") == 1
    assert plan.count("Aggregate") == 1
