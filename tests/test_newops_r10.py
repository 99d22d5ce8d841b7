"""Round-10 operators: shard-stitch seam detection, curriculum ordering
key, and matryoshka dim-truncation evaluation."""

import math

import pytest


def test_stitch_pairs_finds_seams(spark):
    """tail-k(A) == head-k(B) must pair (A, B); unrelated docs must
    not; docs under 2k tokens are excluded."""
    from obsplus_spark.operators.dedup import stitch_pairs

    a_body = "a1 a2 a3 a4 a5 a6"
    seam = "s1 s2 s3 s4"
    b_body = "b1 b2 b3 b4 b5 b6"
    docs = spark.createDataFrame(
        [
            (1, f"{a_body} {seam}"),
            (2, f"{seam} {b_body}"),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )
    got = {(r.prev_id, r.next_id)
           for r in stitch_pairs(docs, k=4).collect()}
    assert got == {(1, 2)}


def test_stitch_pairs_boilerplate_guard(spark):
    """A head window shared by > max_bucket docs is template chrome,
    not a seam — excluded on both sides."""
    from obsplus_spark.operators.dedup import stitch_pairs

    chrome = "nav home about contact"
    rows = [(i, f"{chrome} body{i} x{i} y{i} z{i}") for i in range(10)]
    rows.append((100, f"tail1 tail2 tail3 tail4 {chrome}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # chrome heads appear 10 > max_bucket=4 times -> no pairs at all
    assert stitch_pairs(docs, k=4, max_bucket=4).count() == 0
    # with a generous bucket the seam resolves (doc 100's tail == chrome)
    got = {(r.prev_id, r.next_id)
           for r in stitch_pairs(docs, k=4, max_bucket=32).collect()}
    assert got == {(100, i) for i in range(10)}


def test_stitch_pairs_rejects_bad_args(spark):
    from obsplus_spark.operators.dedup import stitch_pairs

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must"):
        stitch_pairs(docs, k=0)
    with pytest.raises(ValueError, match="max_bucket"):
        stitch_pairs(docs, max_bucket=0)


def test_curriculum_key_bins_and_determinism(spark):
    from obsplus_spark.operators.dedup import curriculum_key

    docs = spark.createDataFrame(
        [(1, 0.0), (2, 0.3), (3, 0.99), (4, 1.7), (5, -0.2), (6, None)],
        "doc_id long, score double",
    )
    rows = {r.doc_id: r for r in
            curriculum_key(docs, "score", bins=4).collect()}
    assert rows[1].bin == 0 and rows[2].bin == 1 and rows[3].bin == 3
    assert rows[4].bin == 3 and rows[5].bin == 0  # clamped
    assert rows[6].bin is None and rows[6].curriculum_key is None
    for d, r in rows.items():
        if r.bin is not None:
            assert r.bin <= r.curriculum_key < r.bin + 1
    again = {r.doc_id: r.curriculum_key for r in
             curriculum_key(docs, "score", bins=4).collect()}
    assert again == {d: r.curriculum_key for d, r in rows.items()}
    # sorting by the key streams bins in order
    ordered = [r.bin for r in
               curriculum_key(docs.where("score IS NOT NULL"), "score",
                              bins=4).orderBy("curriculum_key").collect()]
    assert ordered == sorted(ordered)


def test_curriculum_key_is_map_only(spark):
    from obsplus_spark.operators.dedup import curriculum_key

    docs = spark.createDataFrame([(1, 0.5)], "doc_id long, score double")
    plan = curriculum_key(docs, "score")._jdf.queryExecution().toString()
    assert "Exchange" not in plan


def test_dim_truncation_eval_matches_numpy(spark):
    import numpy as np

    from obsplus_spark.operators.similarity import dim_truncation_eval

    rng = np.random.RandomState(3)
    vecs = rng.randn(21, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(21)],
        "vec_id long, embedding array<float>",
    )
    got = {r.dim: r for r in dim_truncation_eval(df, dims=(4, 8)).collect()}
    v = vecs.astype("float64")

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for d in (4, 8):
        full = [cos(v[i], v[i + 1]) for i in range(20)]
        trunc = [cos(v[i][:d], v[i + 1][:d]) for i in range(20)]
        mae = sum(abs(a - b) for a, b in zip(trunc, full)) / 20
        agree = sum((a >= 0) == (b >= 0)
                    for a, b in zip(trunc, full)) / 20
        assert got[d].n_pairs == 20
        assert math.isclose(got[d].mae, round(mae, 6), abs_tol=2e-6)
        assert math.isclose(got[d].sign_agree, round(agree, 6),
                            abs_tol=1e-9)


def test_dim_truncation_excludes_zero_norm_prefix(spark):
    """A pair whose truncated prefix has zero norm contributes nothing
    at that width but still counts at widths where it is defined."""
    from obsplus_spark.operators.similarity import dim_truncation_eval

    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 1.0, 2.0]),
            (2, [0.0, 1.0, 2.0, 1.0]),
            (3, [1.0, 1.0, 1.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r.dim: r for r in
           dim_truncation_eval(df, dims=(2, 4)).collect()}
    assert got[4].n_pairs == 2
    # pair (1,2): vec 1's prefix-2 is all-zero -> NULL cos, excluded
    assert got[2].n_pairs == 1
    with pytest.raises(ValueError):
        dim_truncation_eval(df, dims=())


def test_group_sample_bottom_k_properties(spark):
    """k rows per group in hash order; subset-stability: the sample of
    a grown group only changes where smaller hashes arrived; the plan
    compiles to WindowGroupLimit."""
    import hashlib

    from obsplus_spark.operators.dedup import group_sample

    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = group_sample(df, "source", k=4).collect()
    assert len(out) == 12
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
    for src, members in by_src.items():
        ids = {r.doc_id for r in members}
        all_ids = [i for i, s in rows if s == src]
        expect = set(sorted(all_ids, key=h)[:4])
        assert ids == expect, src
        ranks = sorted(r.sample_rank for r in members)
        assert ranks == [1, 2, 3, 4]
    plan = group_sample(df, "source", k=4)._jdf.queryExecution().toString()
    assert "WindowGroupLimit" in plan

    import pytest as _p
    with _p.raises(ValueError, match="k must"):
        group_sample(df, "source", k=0)
