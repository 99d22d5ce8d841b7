"""Property-based tests: Spark operators vs pure-Python reference models.

The reference repo has no property tests (SURVEY §5); these close that gap
for the operators with the subtlest semantics — gaps-and-islands under
overlapping intervals, and the bucketed interval join. Each property runs
a handful of examples (Spark jobs are ~0.5 s each); shrinking still works.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from obsplus_spark.operators.gaps import gaps_df, segments_df
from obsplus_spark.operators.joins import interval_overlap_join

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),
        st.integers(min_value=1, max_value=80),
    ).map(lambda t: (t[0], t[0] + t[1])),
    min_size=1,
    max_size=25,
)


def ref_gaps(rows: list[tuple[int, int]], min_gap: int) -> list[tuple[int, int]]:
    """Reference model: the wavebank.py:427-485 algorithm, verbatim."""
    rows = sorted(rows)
    out = []
    cum_end = rows[0][1]
    for (s0, e0), (s1, _e1) in zip(rows, rows[1:]):
        if cum_end + min_gap < s1:
            out.append((cum_end, s1))
        cum_end = max(cum_end, _e1)
    return out


def ref_islands(rows: list[tuple[int, int]], min_gap: int) -> list[tuple[int, int]]:
    rows = sorted(rows)
    out = []
    cur_s, cur_e = rows[0]
    for s, e in rows[1:]:
        if cur_e + min_gap < s:
            out.append((cur_s, cur_e))
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    out.append((cur_s, cur_e))
    return out


@given(rows=intervals_strategy, min_gap=st.integers(min_value=0, max_value=40))
@settings(**SETTINGS)
def test_gaps_matches_reference_model(spark, rows, min_gap):
    df = spark.createDataFrame(
        [("k",) + r for r in rows], "key string, starttime long, endtime long"
    )
    got = sorted(
        (r.gap_start, r.gap_end)
        for r in gaps_df(
            df, keys=["key"], min_gap=min_gap, sampling_period_col=None
        ).collect()
    )
    assert got == ref_gaps(rows, min_gap)


@given(rows=intervals_strategy, min_gap=st.integers(min_value=0, max_value=40))
@settings(**SETTINGS)
def test_segments_matches_reference_model(spark, rows, min_gap):
    df = spark.createDataFrame(
        [("k",) + r for r in rows], "key string, starttime long, endtime long"
    )
    got = sorted(
        (r.seg_start, r.seg_end)
        for r in segments_df(
            df, keys=["key"], min_gap=min_gap, sampling_period_col=None
        ).collect()
    )
    assert got == ref_islands(rows, min_gap)


@given(
    left=intervals_strategy,
    right=intervals_strategy,
    bucket=st.integers(min_value=1, max_value=200),
)
@settings(**SETTINGS)
def test_bucketed_interval_join_matches_bruteforce(spark, left, right, bucket):
    ldf = spark.createDataFrame(
        [(i,) + r for i, r in enumerate(left)],
        "lid long, starttime long, endtime long",
    )
    rdf = spark.createDataFrame(
        [(j,) + r for j, r in enumerate(right)],
        "rid long, starttime long, endtime long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(ldf, rdf, bucket=bucket)
        .selectExpr("l.lid AS lid", "r.rid AS rid")
        .collect()
    )
    expected = sorted(
        (i, j)
        for i, (ls, le) in enumerate(left)
        for j, (rs, re_) in enumerate(right)
        if ls < re_ and le > rs
    )
    assert got == expected


def ref_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node → min id of its component."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


pairs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=25,
)


@given(pairs=pairs_strategy)
@settings(**SETTINGS)
def test_dedup_clusters_matches_union_find(spark, pairs):
    from obsplus_spark.operators.dedup import dedup_clusters

    df = spark.createDataFrame(pairs, "id1 long, id2 long")
    got = {
        r.id: r.cluster_id
        for r in dedup_clusters(df, max_iterations=31).collect()
    }
    assert got == ref_components(pairs)


# ---------------------------------------------------------------------------
# round-5 operators vs pure-Python reference models
# ---------------------------------------------------------------------------


def ref_pagerank(edges, iterations=2, d=0.85):
    """Textbook simplified-dangling PageRank over a distinct edge set."""
    edges = sorted(set(edges))
    srcs = {}
    for s, t in edges:
        srcs.setdefault(s, set()).add(t)
    nodes = {n for e in edges for n in e}
    rank = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        contrib = {}
        for s, outs in srcs.items():
            w = rank[s] / len(outs)
            for t in outs:
                contrib[t] = contrib.get(t, 0.0) + w
        rank = {n: (1 - d) + d * contrib.get(n, 0.0) for n in nodes}
    return rank


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=30,
    ),
    iterations=st.integers(min_value=1, max_value=3),
)
@settings(**SETTINGS)
def test_pagerank_matches_reference(spark, edges, iterations):
    from obsplus_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank
        for r in pagerank(df, iterations=iterations, k=100).collect()
    }
    want = ref_pagerank(edges, iterations)
    assert set(got) == set(want)
    for n, r in want.items():
        assert abs(got[n] - r) < 1e-5, (n, got[n], r)


@given(
    docs=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=30),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_bpe_pair_counts_matches_reference(spark, docs):
    from obsplus_spark.operators.text import bpe_pair_counts

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.pair: (r.n_words, r.total)
           for r in bpe_pair_counts(df, k=1000).collect()}

    freq = {}
    for t in docs:
        for w in t.strip().lower().split():
            freq[w] = freq.get(w, 0) + 1
    want = {}
    for w, f in freq.items():
        for i in range(len(w) - 1):
            p = w[i:i + 2]
            nw, tot = want.get(p, (set(), 0))
            nw = nw | {w}
            want[p] = (nw, tot + f)
    want = {p: (len(nw), tot) for p, (nw, tot) in want.items()}
    assert got == want


@given(
    docs=st.lists(
        st.text(alphabet="pq r", min_size=0, max_size=20),
        min_size=1,
        max_size=15,
    ),
    min_df=st.integers(min_value=1, max_value=4),
    sample_k=st.integers(min_value=1, max_value=5),
)
@settings(**SETTINGS)
def test_posting_lists_matches_reference(spark, docs, min_df, sample_k):
    from obsplus_spark.operators.text import posting_lists

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.token: (r.df_docs, r.sample_docs)
           for r in posting_lists(df, min_df=min_df,
                                  sample_k=sample_k).collect()}

    postings = {}
    for i, t in enumerate(docs):
        for w in set(t.strip().lower().split()):
            postings.setdefault(w, []).append(i)
    want = {
        w: (len(ids), ",".join(str(x) for x in sorted(ids)[:sample_k]))
        for w, ids in postings.items()
        if len(ids) >= min_df
    }
    assert got == want


def ref_funnel(events, stages):
    """Earliest-progression open funnel, per pure-Python model."""
    by_user = {}
    for u, ty, t in events:
        by_user.setdefault(u, []).append((t, ty))
    counts = [0] * len(stages)
    for evs in by_user.values():
        anchor = None
        for k, stage in enumerate(stages):
            cands = [t for t, ty in evs if ty == stage
                     and (anchor is None if k == 0 else t > anchor)]
            if not cands:
                break
            anchor = min(cands)
            counts[k] += 1
    return {k + 1: c for k, c in enumerate(counts)}


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # user
            st.sampled_from(["a", "b", "c", "x"]),   # type
            st.integers(min_value=0, max_value=20),  # ts
        ),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(min_value=1, max_value=3),
)
@settings(**SETTINGS)
def test_funnel_matches_reference(spark, events, k):
    from obsplus_spark.operators.sessions import funnel_counts

    stages = ["a", "b", "c"][:k]
    df = spark.createDataFrame(
        events, "user_id long, event_type string, t_ns long"
    )
    got = {r.stage: r.n_users for r in funnel_counts(df, stages).collect()}
    assert got == ref_funnel(events, stages)


# ---------------------------------------------------------------------------
# events_to_df: quality `value or default`, preferred fallback,
# arrival-linked station counts — vs a pure-Python model
# ---------------------------------------------------------------------------

_ev_tree_strategy = st.lists(
    st.tuples(
        # origins: list of (has_quality, used, assoc, n_arrivals)
        st.lists(
            st.tuples(
                st.booleans(),
                st.one_of(st.none(), st.integers(0, 5)),
                st.one_of(st.none(), st.integers(0, 5)),
                st.integers(0, 3),
            ),
            min_size=0,
            max_size=3,
        ),
        # picks: list of (phase in P/S/other, rejected?, station 0-2)
        st.lists(
            st.tuples(
                st.sampled_from(["P", "S", "X"]),
                st.sampled_from([None, "reviewed", "rejected"]),
                st.integers(0, 2),
            ),
            min_size=0,
            max_size=6,
        ),
        # preferred index: -1 = missing id, None = null, else index
        st.one_of(st.none(), st.integers(-1, 2)),
    ),
    min_size=1,
    max_size=6,
)


@given(trees=_ev_tree_strategy)
@settings(**SETTINGS)
def test_events_to_df_quality_matches_model(spark, trees):
    from obsplus_spark.operators.event_tree import (
        NESTED_EVENT_SCHEMA,
        events_to_df,
    )

    rows, expected = [], {}
    for ei, (origins, picks, pref) in enumerate(trees):
        eid = f"e{ei}"
        pick_rows = [
            {
                "resource_id": f"{eid}:p{i}",
                "time": 100 + i,
                "phase_hint": ph,
                "evaluation_status": status,
                "station": f"S{sta}",
            }
            for i, (ph, status, sta) in enumerate(picks)
        ]
        origin_rows = []
        for oi, (has_q, used, assoc, n_arr) in enumerate(origins):
            origin_rows.append(
                {
                    "resource_id": f"{eid}:o{oi}",
                    "time": 50 + oi,
                    "quality": (
                        {"used_phase_count": used, "associated_phase_count": assoc}
                        if has_q
                        else None
                    ),
                    "arrivals": [
                        {
                            "resource_id": f"{eid}:a{ai}",
                            "pick_id": f"{eid}:p{ai}",
                            "phase": "P" if ai % 2 == 0 else "S",
                        }
                        for ai in range(n_arr)
                    ],
                }
            )
        if pref is None:
            pref_id = None
        elif pref == -1 or pref >= len(origins):
            pref_id = f"{eid}:oMISSING"
        else:
            pref_id = f"{eid}:o{pref}"
        rows.append(
            {
                "event_id": eid,
                "preferred_origin_id": pref_id,
                "origins": origin_rows,
                "picks": pick_rows,
                "magnitudes": [],
            }
        )
        # model: effective preferred index
        eff = pref if (pref is not None and 0 <= pref < len(origins)) else None
        po = origins[eff] if eff is not None else (origins[-1] if origins else None)
        arrivals = po[3] if po else 0
        arr_p = sum(1 for i in range(arrivals) if i % 2 == 0)
        arr_s = arrivals - arr_p
        linked = {i for i in range(arrivals) if i < len(pick_rows)}
        expected[eid] = dict(
            p_phase_count=arr_p,
            s_phase_count=arr_s,
            p_pick_count=sum(
                1 for ph, status, _ in picks
                if ph == "P" and status != "rejected"
            ),
            s_pick_count=sum(
                1 for ph, status, _ in picks
                if ph == "S" and status != "rejected"
            ),
            used_phase_count=(
                po[1] if (po and po[0] and po[1] not in (None, 0))
                else arr_p + arr_s
            ),
            associated_phase_count=(
                po[2] if (po and po[0] and po[2] not in (None, 0)) else 0
            ),
            station_count=len({picks[i][2] for i in linked}),
        )
    df = spark.createDataFrame(rows, NESTED_EVENT_SCHEMA)
    got = {r.event_id: r for r in events_to_df(df).collect()}
    for eid, exp in expected.items():
        r = got[eid]
        for k, v in exp.items():
            assert getattr(r, k) == v, (eid, k, getattr(r, k), v)


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=40,
)


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_triangle_counts_matches_bruteforce(spark, edges):
    """Degree-ordered wedge closure == brute-force per-node triangle
    membership over the canonical undirected simple graph."""
    from itertools import combinations

    from obsplus_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"]
           for r in triangle_counts(df, k=100).collect()}

    adj = set()
    nodes = set()
    for s, d in edges:
        if s != d:
            adj.add((min(s, d), max(s, d)))
            nodes.update((s, d))
    want: dict[int, int] = {}
    for a, b, c in combinations(sorted(nodes), 3):
        if ((a, b) in adj and (a, c) in adj and (b, c) in adj):
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["w%d" % i for i in range(8)]),
        min_size=3,
        max_size=12,
    ),
    min_size=2,
    max_size=10,
)


@given(docs=docs_strategy, threshold=st.sampled_from([0.3, 0.5, 0.8, 1.0]))
@settings(**SETTINGS)
def test_set_similarity_join_matches_bruteforce(spark, docs, threshold):
    """Prefix-filtered similarity join == brute-force all-pairs Jaccard
    over trigram shingle sets (no false negatives at any threshold)."""
    from obsplus_spark.operators.dedup import set_similarity_join

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id1"], r["id2"]): (r["n_inter"], r["n1"], r["n2"])
        for r in set_similarity_join(
            df, threshold=threshold, persist_shingles=False
        ).collect()
    }

    def sh(toks):
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    sets = {i: sh(t) for i, t in enumerate(docs) if len(t) >= 3}
    want = {}
    ids = sorted(sets)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                want[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert got == want
