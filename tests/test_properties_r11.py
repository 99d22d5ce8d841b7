"""Property-based reference models for the round-11 operators:
exact_substring_spans vs a pure-python gram-run scan, cut_spans vs a
position-set filter, and mixture_rebalance vs decimal arithmetic —
random inputs, exact agreement."""

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["a", "b", "c", "d", "e"]


@st.composite
def _corpus(draw):
    n_docs = draw(st.integers(2, 7))
    docs = []
    for i in range(n_docs):
        n = draw(st.integers(0, 12))
        toks = [
            _WORDS[draw(st.integers(0, len(_WORDS) - 1))] for _ in range(n)
        ]
        docs.append((i, " ".join(toks)))
    return docs


def _ref_spans(docs, n, min_run, min_count):
    """Pure-python exact_substring_spans: gram tuples, corpus counts,
    maximal runs of duplicated positions."""
    grams = {}
    for i, text in docs:
        toks = [t for t in text.lower().split() if t]
        grams[i] = [tuple(toks[p:p + n]) for p in range(len(toks) - n + 1)]
    freq = Counter(g for gs in grams.values() for g in gs)
    spans = set()
    for i, gs in grams.items():
        dup = [p for p, g in enumerate(gs) if freq[g] >= min_count]
        run = []
        for p in dup + [None]:
            if run and (p is None or p != run[-1] + 1):
                if len(run) >= min_run:
                    spans.add((i, run[0], len(run), len(run) + n - 1))
                run = []
            if p is not None:
                run.append(p)
    return spans


@SET
@given(_corpus(), st.integers(2, 3), st.integers(2, 3), st.integers(2, 3))
def test_exact_spans_matches_reference(spark, docs, n, min_run, min_count):
    from obsplus_spark.operators.dedup import exact_substring_spans

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        tuple(r)
        for r in exact_substring_spans(
            df, n=n, min_run=min_run, min_count=min_count
        ).collect()
    }
    assert got == _ref_spans(docs, n, min_run, min_count)


def _ref_cut(docs, spans):
    out = {}
    by_doc = {}
    for i, s, ln in spans:
        by_doc.setdefault(i, []).append((s, ln))
    for i, text in docs:
        if text is None:
            out[i] = (None, None)
            continue
        toks = [t for t in text.lower().split() if t]
        cov = set()
        for s, ln in by_doc.get(i, []):
            cov |= set(range(s, s + ln))
        kept = [t for p, t in enumerate(toks) if p not in cov]
        out[i] = (" ".join(kept), len(toks) - len(kept))
    return out


@SET
@given(_corpus(), st.data())
def test_cut_spans_matches_reference(spark, docs, data):
    from obsplus_spark.operators.dedup import cut_spans

    # arbitrary span lists, including out-of-range and overlapping
    spans = []
    for i, _ in docs:
        for _ in range(data.draw(st.integers(0, 2))):
            spans.append((
                i,
                data.draw(st.integers(0, 10)),
                data.draw(st.integers(1, 5)),
            ))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sdf = spark.createDataFrame(
        spans or [(-1, 0, 1)],
        "doc_id long, span_start long, span_tokens long",
    )
    got = {r.doc_id: (r.text, r.n_removed)
           for r in cut_spans(df, sdf).collect()}
    assert got == _ref_cut(docs, spans)


def _round6(x):
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


@SET
@given(st.data())
def test_mixture_rebalance_matches_reference(spark, data):
    from obsplus_spark.operators.dedup import mixture_rebalance
    import math

    n_docs = data.draw(st.integers(1, 10))
    docs, labels = [], []
    for i in range(n_docs):
        ntok = data.draw(st.integers(0, 6))
        src = f"s{data.draw(st.integers(0, 2))}"
        docs.append((i, " ".join("w%d" % k for k in range(ntok)), src))
        if data.draw(st.booleans()):
            labels.append((i, data.draw(st.integers(0, n_docs))))
    weights = {"s0": 0.5, "s1": 0.3}
    target = data.draw(st.integers(1, 200))
    cap = 4.0

    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    lf = spark.createDataFrame(
        labels or [(-1, -1)], "id long, cluster_id long"
    )
    got = {r.source: tuple(r) for r in mixture_rebalance(
        df, labels and lf or lf.where("id >= 0"), weights, target
    ).collect()}

    lab = dict(labels)
    ref = {}
    for i, text, src in docs:
        nt = len([t for t in text.split() if t])
        keep = i not in lab or lab[i] == i
        d = ref.setdefault(src, [0, 0, 0, 0])
        d[0] += 1
        d[1] += keep
        d[2] += nt
        d[3] += nt if keep else 0
    for src, (nd, kd, ntok, ktok) in ref.items():
        w = weights.get(src, 0.0)
        if ktok == 0:
            rate, exp = None, None
        else:
            rate = _round6(min(cap, w * target / ktok))
            exp = int(math.floor(rate * ktok))
        row = got[src]
        assert row[1:5] == (nd, kd, ntok, ktok), (src, row)
        assert row[5] == w
        if rate is None:
            assert row[6] is None and row[7] is None, (src, row)
        else:
            assert row[6] == pytest.approx(rate, abs=2e-6), (src, row)
            assert abs(row[7] - exp) <= 1, (src, row)


def _u32(i, salt=""):
    import hashlib

    return int(hashlib.md5((str(i) + salt).encode()).hexdigest()[:8], 16)


@SET
@given(st.data())
def test_apply_mixture_matches_reference(spark, data):
    from obsplus_spark.operators.dedup import apply_mixture
    import math

    n_docs = data.draw(st.integers(1, 12))
    docs = [(i, f"s{i % 3}") for i in range(n_docs)]
    rates = {
        "s0": data.draw(st.one_of(st.none(), st.floats(0, 3))),
        "s1": data.draw(st.floats(0, 3)),
    }
    plan = [(s, r) for s, r in rates.items()]
    df = spark.createDataFrame(docs, "doc_id long, source string")
    pf = spark.createDataFrame(plan, "source string, sample_rate double")
    got = {(r.doc_id, r.epoch) for r in apply_mixture(df, pf).collect()}

    ref = set()
    for i, src in docs:
        r = rates.get(src)
        if r is None:
            continue
        n = int(math.floor(r)) + (1 if _u32(i) / 4294967296.0 < r - math.floor(r) else 0)
        for e in range(1, n + 1):
            ref.add((i, e))
    assert got == ref
