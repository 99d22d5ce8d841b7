"""Round-9 operator wave: fuzzy (MinHash-LSH + exact-Jaccard)
benchmark decontamination."""

import pytest


def test_fuzzy_decontaminate_hand_values(spark):
    """A near-verbatim rewrap of an eval doc is flagged with its exact
    Jaccard; unrelated docs are not; the best (highest-jaccard) match
    wins when several eval docs collide."""
    from obsplus_spark.operators.dedup import fuzzy_decontaminate

    base = "the quick brown fox jumps over the lazy dog again and again"
    benchmark = spark.createDataFrame(
        [(1000, base), (1001, "completely different benchmark text here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # identical → jaccard 1.0
            (1, base),
            # truncated copy: shares a long prefix of shingles
            (2, "the quick brown fox jumps over the lazy dog"),
            # unrelated
            (3, "nothing in common with any eval document at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in fuzzy_decontaminate(
            corpus, benchmark, threshold=0.3
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1].bench_id == 1000
    assert out[1].jaccard == pytest.approx(1.0)
    assert out[1].n_inter == out[1].n_corpus == out[1].n_bench
    # doc 2: 7 of base's 10 distinct trigrams (9-token doc → 7 shingles,
    # all shared); union = 10
    assert out[2].bench_id == 1000
    assert out[2].n_corpus == 7 and out[2].n_bench == 10
    assert out[2].n_inter == 7
    assert out[2].jaccard == pytest.approx(0.7)


def test_fuzzy_decontaminate_threshold_and_validation(spark):
    """The threshold gates the VERIFY stage (LSH only proposes): the
    0.7-jaccard truncated-copy pair — which this deterministic lane
    family bands together — survives threshold=0.7 exactly and dies at
    0.71. A low-jaccard pair (1/3) is typically never even proposed
    (the documented banding recall trade), so thresholds are exercised
    on a colliding pair."""
    from obsplus_spark.operators.dedup import fuzzy_decontaminate

    base = "the quick brown fox jumps over the lazy dog again and again"
    bench = spark.createDataFrame(
        [(1000, base)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    got = fuzzy_decontaminate(docs, bench, threshold=0.7).collect()
    assert len(got) == 1 and got[0].jaccard == pytest.approx(0.7)
    assert fuzzy_decontaminate(docs, bench, threshold=0.71).count() == 0
    with pytest.raises(ValueError, match="threshold"):
        fuzzy_decontaminate(docs, bench, threshold=0.0)
