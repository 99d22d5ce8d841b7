"""Property-based reference models for the round-10 operators:
stitch_pairs vs a pure-python seam scan, curriculum_key vs the md5
recipe, phash_near_dup_wide vs brute-force banding+Hamming, and
dim_truncation_eval vs numpy cosines — random inputs, exact agreement.
"""

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@st.composite
def _corpus(draw):
    n_docs = draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        n = draw(st.integers(0, 14))
        toks = [
            _WORDS[draw(st.integers(0, len(_WORDS) - 1))] for _ in range(n)
        ]
        docs.append((i, " ".join(toks)))
    return docs


def _ref_stitch(docs, k, max_bucket):
    wins = []
    for i, text in docs:
        toks = [t for t in text.lower().split() if t]
        if len(toks) < 2 * k:
            continue
        wins.append((i, " ".join(toks[:k]), " ".join(toks[-k:])))
    from collections import Counter

    hc = Counter(h for _, h, _ in wins)
    tc = Counter(t for _, _, t in wins)
    hot = {w for w, c in hc.items() if c > max_bucket}
    hot |= {w for w, c in tc.items() if c > max_bucket}
    out = set()
    for i, _, t in wins:
        if t in hot:
            continue
        for j, h, _ in wins:
            if h in hot or i == j:
                continue
            if t == h:
                out.add((i, j))
    return out


@SET
@given(_corpus(), st.integers(1, 3), st.integers(1, 4))
def test_stitch_pairs_matches_reference(spark, docs, k, max_bucket):
    from obsplus_spark.operators.dedup import stitch_pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.prev_id, r.next_id)
           for r in stitch_pairs(df, k=k, max_bucket=max_bucket).collect()}
    assert got == _ref_stitch(docs, k, max_bucket)


def _md5_u32(x: int, salt: str = "") -> int:
    return int(hashlib.md5(f"{x}{salt}".encode()).hexdigest()[:8], 16)


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000),
                  st.one_of(st.none(), st.floats(-1, 2, allow_nan=False))),
        min_size=1, max_size=20, unique_by=lambda t: t[0],
    ),
    st.integers(1, 6),
)
def test_curriculum_key_matches_recipe(spark, rows, bins):
    from obsplus_spark.operators.dedup import curriculum_key

    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = {r.doc_id: (r.bin, r.curriculum_key)
           for r in curriculum_key(df, "score", bins=bins).collect()}
    for i, score in rows:
        if score is None:
            assert got[i] == (None, None)
            continue
        b = min(bins - 1, max(0, math.floor(score * bins)))
        key = round(b + _md5_u32(i) / 2**32, 6)
        assert got[i][0] == b
        assert math.isclose(got[i][1], key, abs_tol=1e-9)


@st.composite
def _wide_hashes(draw):
    n = draw(st.integers(2, 12))
    rows = []
    for i in range(n):
        words = [draw(st.integers(0, 2**32 - 1)) for _ in range(4)]
        rows.append((i, words))
    return rows


def _ref_wide(rows, max_hamming):
    out = {}
    for i, (ia, wa) in enumerate(rows):
        for ib, wb in rows[i + 1:]:
            if not any(a == b for a, b in zip(wa, wb)):
                continue  # no shared band -> never proposed
            ham = sum(bin(a ^ b).count("1") for a, b in zip(wa, wb))
            if ham <= max_hamming:
                out[(ia, ib)] = ham
    return out


@SET
@given(_wide_hashes(), st.integers(0, 128))
def test_phash_wide_matches_bruteforce_banding(spark, rows, max_hamming):
    from obsplus_spark.operators.dedup import phash_near_dup_wide

    df = spark.createDataFrame(rows, "id long, words array<long>")
    got = {(r.id1, r.id2): r.hamming
           for r in phash_near_dup_wide(df, max_hamming=max_hamming).collect()}
    assert got == _ref_wide(rows, max_hamming)


@SET
@given(
    st.lists(
        st.lists(st.floats(-3, 3, allow_nan=False, width=32),
                 min_size=6, max_size=6),
        min_size=2, max_size=12,
    )
)
def test_dim_truncation_matches_numpy(spark, vecs):
    import numpy as np

    from obsplus_spark.operators.similarity import dim_truncation_eval

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r.dim: r for r in dim_truncation_eval(df, dims=(3,)).collect()}
    v = np.array(vecs, dtype="float32").astype("float64")

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na * nb == 0:
            return None
        return float(a @ b / (na * nb))

    pairs = [(cos(v[i][:3], v[i + 1][:3]), cos(v[i], v[i + 1]))
             for i in range(len(vecs) - 1)]
    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    if not pairs:
        assert 3 not in got
        return
    mae = sum(abs(a - b) for a, b in pairs) / len(pairs)
    agree = sum((a >= 0) == (b >= 0) for a, b in pairs) / len(pairs)
    assert got[3].n_pairs == len(pairs)
    assert math.isclose(got[3].mae, mae, abs_tol=3e-6)
    assert math.isclose(got[3].sign_agree, agree, abs_tol=1e-6)
