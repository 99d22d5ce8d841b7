"""Round-8 operator wave: token entropy (information-density quality),
per-source n-gram diversity (collapse detection), and exact-proportion
stratified splits."""

import math

import pytest


def test_token_entropy_hand_values(spark):
    from obsplus_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a a b"),          # H of (2/3, 1/3) = 0.918296 bits
            (2, "x"),              # single token: H = 0
            (3, "  "),             # blank: zero counts, NULL ratios
            (4, "p q r s"),        # uniform over 4: H = 2 bits
            (5, None),             # NULL text behaves like blank
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.type_token_ratio,
                   r.entropy_bits)
        for r in token_entropy(docs).collect()
    }
    assert got[1][:2] == (3, 2)
    assert got[1][2] == pytest.approx(2 / 3, abs=1e-6)
    h = math.log2(3) - (2 * math.log2(2)) / 3
    assert got[1][3] == pytest.approx(h, abs=1e-6)
    assert got[2] == (1, 1, 1.0, 0.0)
    assert got[3] == (0, 0, None, None)
    assert got[4][3] == pytest.approx(2.0, abs=1e-6)
    assert got[5] == (0, 0, None, None)


def test_token_entropy_is_map_only(spark):
    """The entropy fold happens in-row over the run-length pairs — the
    plan must carry NO exchange at all (scan-speed at any corpus
    size)."""
    from obsplus_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        [(1, "a b a")], "doc_id long, text string"
    )
    p = (
        token_entropy(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p, "token_entropy grew a shuffle"


def test_ngram_diversity_hand_values(spark):
    from obsplus_spark.operators.text import ngram_diversity

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c", "A"),  # grams: abc, bca, cab, abc
            (2, "x y", "B"),          # < n tokens: contributes nothing
            (3, "u v w", "B"),        # exactly one gram
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: (r.n_ngrams, r.n_distinct, r.distinct_ratio,
                   r.top_share)
        for r in ngram_diversity(docs, n=3).collect()
    }
    assert got["A"] == (4, 3, 0.75, 0.5)
    assert got["B"] == (1, 1, 1.0, 1.0)
    with pytest.raises(ValueError, match="n must be"):
        ngram_diversity(docs, n=0)


def test_stratified_split_exact_proportions(spark):
    """Per-stratum counts are exactly floor-quantized to the weights —
    the property hash_split only delivers in expectation."""
    from obsplus_spark.operators.dedup import stratified_split

    rows = [(i, "big") for i in range(40)] + [
        (100 + i, "small") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_split(
        df, weights={"train": 50, "val": 25, "test": 25}
    ).collect()
    counts: dict = {}
    for r in out:
        counts.setdefault(r.source, {}).setdefault(r.split, 0)
        counts[r.source][r.split] += 1
    assert counts["big"] == {"train": 20, "val": 10, "test": 10}
    # 3 rows at 50/25/25: floor(1.5)=1 train, floor(2.25)-1=1 val, 1 test
    assert counts["small"] == {"train": 1, "val": 1, "test": 1}
    # deterministic: identical assignment on a second build
    again = stratified_split(
        df, weights={"train": 50, "val": 25, "test": 25}
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    with pytest.raises(ValueError, match="sum to 100"):
        stratified_split(df, weights={"train": 60, "val": 20})


def test_stratified_split_small_stratum_quantization(spark):
    """90/5/5 over a 3-row stratum: floor boundaries give train 2,
    val 0, test 1 — quantized but never an accidental empty LAST
    split, and all rows assigned."""
    from obsplus_spark.operators.dedup import stratified_split

    df = spark.createDataFrame(
        [(i, "s") for i in range(3)], "doc_id long, source string"
    )
    out = stratified_split(df).collect()
    splits = sorted(r.split for r in out)
    assert len(out) == 3 and splits.count("train") == 2
    assert splits.count("test") == 1 and splits.count("val") == 0


def test_contamination_fraction_hand_values(spark):
    """Doc sharing half its distinct grams with the benchmark gets
    frac 0.5; a clean doc gets 0.0 with contaminated=False; gramless
    docs are absent; threshold validated."""
    from obsplus_spark.operators.dedup import contamination_fraction

    # n=2 grams; corpus doc 1: grams {a b, b c, c d} — 'a b' and 'b c'
    # appear in the benchmark doc → 2/3 shared
    corpus = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "x y z"),       # grams {x y, y z}: clean
            (3, "solo"),        # one token: no 2-grams, absent
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_grams, r.n_shared,
                   r.contamination_frac, r.contaminated)
        for r in contamination_fraction(
            corpus, bench, n=2, threshold=0.5
        ).collect()
    }
    assert got[1] == (3, 2, round(2 / 3, 6), True)
    assert got[2] == (2, 0, 0.0, False)
    assert 3 not in got
    with pytest.raises(ValueError, match="threshold"):
        contamination_fraction(corpus, bench, threshold=1.5)


def test_action_transitions_hand_values(spark):
    """Markov matrix: counts and P(next|cur) over per-user ordered
    streams; NULL-ts and NULL-type events dropped by contract."""
    from obsplus_spark.operators.sessions import action_transitions

    rows = [
        # user 1: a -> b -> a -> b
        (1, "a", 10, 100), (1, "b", 11, 200), (1, "a", 12, 300),
        (1, "b", 13, 400),
        # user 2: a -> c
        (2, "a", 20, 100), (2, "c", 21, 200),
        # degenerate: no ts / no type — must not create transitions
        (1, "z", 14, None), (2, None, 22, 300),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, t_ns long"
    )
    got = {
        (r.cur_action, r.next_action): (r.n_transitions, r.p_next)
        for r in action_transitions(ev, k=10,
                                    tiebreak_col="event_id").collect()
    }
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 3  # no z- or NULL-derived transitions


def test_readability_hand_values(spark):
    """Flesch on hand-checkable rows: syllable = vowel group, sentence
    floor 1; blank/NULL rows keep zero counts and NULL score."""
    from obsplus_spark.operators.text import readability_scores

    docs = spark.createDataFrame(
        [
            (1, "the cat sat."),     # 3 words, 1 sentence, 3 syllables
            (2, "no punctuation"),   # sentence floor 1
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.flesch)
        for r in readability_scores(docs).collect()
    }
    w, s_, syl = 3, 1, 3
    want = round(206.835 - 1.015 * (w / s_) - 84.6 * (syl / w), 6)
    assert got[1] == (3, 1, 3, want)
    # "no punctuation": vowel groups o, u, ua, io -> 1 + 3 = 4
    assert got[2][:3] == (2, 1, 4)
    assert got[3] == (0, 1, 0, None)
    assert got[4] == (0, 1, 0, None)


def test_cross_source_leakage_hand_values(spark):
    """Leakage matrix: identical normalized text across sources counts
    its digest once per source pair; same-source dups don't leak;
    prefix mode digests only the head."""
    from obsplus_spark.operators.dedup import cross_source_leakage

    docs = spark.createDataFrame(
        [
            (1, "Shared   text here", "A"),
            (2, "shared text HERE", "B"),      # same after normalize
            (3, "shared text here", "C"),
            (4, "unique text", "A"),
            (5, "unique text", "A"),           # same-source dup: no pair
            (6, None, "B"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source_a, r.source_b): r.n_shared_digests
        for r in cross_source_leakage(docs).collect()
    }
    assert got == {("A", "B"): 1, ("A", "C"): 1, ("B", "C"): 1}
    # prefix mode: docs sharing only the first tokens now pair up
    docs2 = spark.createDataFrame(
        [
            (1, "same head tail one", "A"),
            (2, "same head tail two", "B"),
        ],
        "doc_id long, text string, source string",
    )
    assert cross_source_leakage(docs2).count() == 0
    got2 = {
        (r.source_a, r.source_b): r.n_shared_digests
        for r in cross_source_leakage(docs2, prefix_tokens=3).collect()
    }
    assert got2 == {("A", "B"): 1}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="prefix_tokens"):
        cross_source_leakage(docs, prefix_tokens=0)
