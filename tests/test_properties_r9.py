"""Property-based tests for the round-9 operators vs pure-Python
reference models: the token-budget prefix rule, the fuzzy-decontam
exact-Jaccard verify, and the leakage-safe-split component invariant
under random pair graphs."""

from __future__ import annotations

import hashlib

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _md5key(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)


docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.integers(min_value=0, max_value=8),  # token count
    ),
    min_size=1,
    max_size=20,
)


@given(docs=docs_strategy, budget=st.integers(min_value=0, max_value=30))
@settings(**SETTINGS)
def test_token_budget_matches_prefix_model(spark, docs, budget):
    from obsplus_spark.operators.text import token_budget_sample

    rows = [
        (i, " ".join(f"w{j}" for j in range(n)) if n else "", src)
        for i, (src, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.doc_id: (r.n_tokens, r.cum_tokens)
        for r in token_budget_sample(
            df, {"s1": budget, "s2": budget}
        ).collect()
    }
    expect = {}
    for src in ("s1", "s2"):
        members = sorted(
            (i for i, (s, _n) in enumerate(docs) if s == src),
            key=lambda i: (_md5key(i), i),
        )
        cum = 0
        for i in members:
            cum += docs[i][1]
            if cum <= budget:
                expect[i] = (docs[i][1], cum)
    assert got == expect


pairs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ).filter(lambda t: t[0] != t[1]),
    min_size=0,
    max_size=12,
)


@given(pairs=pairs_strategy)
@settings(**SETTINGS)
def test_leakage_safe_split_component_invariant(spark, pairs):
    """Whatever the pair graph, every connected component shares one
    split_key (its min id) and one split; singletons key by their own
    id. Reference model: union-find over the same pairs."""
    from obsplus_spark.operators.dedup import leakage_safe_split

    ids = list(range(15))
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in ids], "doc_id long, text string"
    )
    pdf = spark.createDataFrame(
        pairs or [(99, 98)],  # createDataFrame needs >=1 row; harmless ids
        "id1 long, id2 long",
    )
    if not pairs:
        pdf = pdf.filter("id1 < 0")
    out = {
        r.doc_id: (r.split_key, r.split)
        for r in leakage_safe_split(
            docs, pdf, max_iterations=15
        ).collect()
    }
    # union-find reference
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    # min-of-component = find root after full path compression with
    # min-root union; recompute exactly
    for root, members in comp.items():
        key = min(members)
        splits = {out[i][1] for i in members}
        keys = {out[i][0] for i in members}
        assert keys == {key}, (members, keys)
        assert len(splits) == 1


@given(
    a=st.lists(st.integers(0, 30), min_size=3, max_size=15),
    b=st.lists(st.integers(0, 30), min_size=3, max_size=15),
)
@settings(**SETTINGS)
def test_fuzzy_decontam_jaccard_matches_set_model(spark, a, b):
    """Whenever LSH proposes the (corpus doc, bench doc) pair, the
    reported jaccard equals the exact Python set-Jaccard of the two
    docs' distinct trigram shingles (threshold 0 keeps every proposed
    pair; LSH recall misses are allowed — only false VALUES are not)."""
    from obsplus_spark.operators.dedup import fuzzy_decontaminate

    ta = " ".join(f"w{x}" for x in a)
    tb = " ".join(f"w{x}" for x in b)
    corpus = spark.createDataFrame([(1, ta)], "doc_id long, text string")
    bench = spark.createDataFrame([(2, tb)], "doc_id long, text string")
    got = fuzzy_decontaminate(corpus, bench, threshold=1e-9).collect()

    def shingles(toks):
        return {
            " ".join(map(str, toks[i : i + 3]))
            for i in range(len(toks) - 2)
        }

    sa = shingles([f"w{x}" for x in a])
    sb = shingles([f"w{x}" for x in b])
    jac = len(sa & sb) / len(sa | sb)
    if got:
        (r,) = got
        assert r.n_corpus == len(sa) and r.n_bench == len(sb)
        assert r.n_inter == len(sa & sb)
        assert abs(r.jaccard - jac) < 1e-6
    else:
        # LSH may miss low-similarity pairs — but never a FULL match
        assert jac < 1.0


samples_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),   # t
        st.integers(min_value=-50, max_value=50),  # v (integral doubles)
    ),
    min_size=2,
    max_size=12,
    unique_by=lambda s: s[0],
)


@given(samples=samples_strategy, step=st.sampled_from([7, 10, 16]))
@settings(**SETTINGS)
def test_resample_linear_matches_numpy_interp(spark, samples, step):
    """resample_linear == numpy.interp on every emitted grid point, and
    the emitted grid is exactly the multiples of ``step`` in
    [ceil(t_min/step)*step, t_max] minus an off-grid t_max."""
    import numpy as np

    from obsplus_spark.operators.sessions import resample_linear

    df = spark.createDataFrame(
        [("k", t, float(v)) for t, v in samples],
        "key string, t long, v double",
    )
    got = {
        r.grid_ts: r.value
        for r in resample_linear(
            df, key_col="key", ts_col="t", value_col="v", step=step
        ).collect()
    }
    ts = sorted(t for t, _ in samples)
    vs = [dict(samples)[t] for t in ts]
    lo = -(-ts[0] // step) * step  # ceil to grid
    expect = {
        g: float(np.interp(g, ts, vs))
        for g in range(lo, ts[-1] + 1, step)
        if g < ts[-1] or ts[-1] % step == 0
    }
    assert set(got) == set(expect)
    for g, v in expect.items():
        assert got[g] == pytest.approx(v, abs=1e-6), (g, samples, step)
