"""Property-based tests for the round-9 session-5 operators vs pure-
Python reference models: chunk_dedup's first-occurrence/reconstruction
invariants, within_doc_dedup's order-preserving set semantics, and the
AUC/KS metrics against direct O(n²)/ECDF computations on random data."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small vocabulary forces chunk collisions within and across docs
token = st.sampled_from(["a", "b", "c"])
doc = st.lists(token, min_size=0, max_size=9).map(" ".join)
corpus_strategy = st.lists(doc, min_size=1, max_size=8)


def _chunks(text: str, w: int):
    toks = [t for t in text.split() if t]
    return [
        " ".join(toks[i: i + w]) for i in range(0, len(toks), w)
    ]


@given(corpus=corpus_strategy, w=st.integers(min_value=1, max_value=3))
@settings(**SETTINGS)
def test_chunk_dedup_matches_first_occurrence_model(spark, corpus, w):
    from obsplus_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.clean_text)
        for r in chunk_dedup(df, chunk_tokens=w).collect()
    }
    seen: set = set()
    for i, text in enumerate(corpus):
        chunks = _chunks(text, w)
        kept = []
        for c in chunks:
            if c.lower() not in seen:
                seen.add(c.lower())
                kept.append(c)
        assert got[i] == (len(chunks), len(kept), " ".join(kept)), (
            i, corpus
        )


@given(corpus=corpus_strategy, w=st.integers(min_value=1, max_value=3))
@settings(**SETTINGS)
def test_within_doc_dedup_matches_ordered_set_model(spark, corpus, w):
    from obsplus_spark.operators.text import within_doc_dedup

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.clean_text)
        for r in within_doc_dedup(df, chunk_tokens=w).collect()
    }
    for i, text in enumerate(corpus):
        chunks = _chunks(text, w)
        kept, seen = [], set()
        for c in chunks:
            if c.lower() not in seen:
                seen.add(c.lower())
                kept.append(c)
        assert got[i] == (len(chunks), len(kept), " ".join(kept))


scored_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # score (heavy ties)
        st.booleans(),
    ),
    min_size=2,
    max_size=40,
)


@given(rows=scored_strategy)
@settings(**SETTINGS)
def test_auc_matches_pair_model(spark, rows):
    from obsplus_spark.operators.evaluation import score_auc

    df = spark.createDataFrame(
        [(float(s), y) for s, y in rows], "s double, y boolean"
    )
    got = score_auc(df, "s", "y").collect()[0]
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))
    if not pos or not neg:
        assert got["auc"] is None
        return
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert got["auc"] == pytest.approx(want, abs=1e-9)


@given(rows=scored_strategy)
@settings(**SETTINGS)
def test_ks_matches_ecdf_model(spark, rows):
    from obsplus_spark.operators.evaluation import ks_statistic

    df = spark.createDataFrame(
        [(float(v), g) for v, g in rows], "v double, g boolean"
    )
    got = ks_statistic(df, "v", "g").collect()[0]
    a = [v for v, g in rows if g]
    b = [v for v, g in rows if not g]
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    if not a or not b:
        assert got["ks"] is None
        return
    grid = sorted(set(a) | set(b))
    want = max(
        abs(
            sum(1 for v in a if v <= g) / len(a)
            - sum(1 for v in b if v <= g) / len(b)
        )
        for g in grid
    )
    assert got["ks"] == pytest.approx(want, abs=1e-9)
