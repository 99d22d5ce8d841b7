"""Optimization-round (r12) contracts: changes that alter operator
internals for performance must keep results identical and keep
undersized bounds LOUD."""

import pytest
from pyspark.sql import functions as F


def test_k_core_require_converged_passes_at_fixed_point(spark):
    """A converged peel (every survivor degree >= k) passes the guard
    and matches the unguarded output exactly."""
    from obsplus_spark.operators.graph import k_core_peel

    # a 4-clique plus a pendant chain: k=2 peels the chain in 2 rounds
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "src int, dst int",
    )
    plain = k_core_peel(edges, k=2, rounds=3).collect()
    guarded = k_core_peel(
        edges, k=2, rounds=3, require_converged=True
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, guarded))
    assert {r.node for r in guarded} == {1, 2, 3, 4}
    assert all(r.degree >= 2 for r in guarded)


@pytest.mark.parametrize("broadcast_degrees", [False, True])
def test_k_core_require_converged_raises_on_truncation(
    spark, broadcast_degrees
):
    """An undersized round budget must raise at runtime, never emit a
    still-cascading survivor set (both peel implementations)."""
    from obsplus_spark.operators.graph import k_core_peel

    # a path graph cascades one node per round under k=2: rounds=1
    # leaves interior nodes with degree 1 — the guard must fire
    n = 8
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "src int, dst int"
    )
    out = k_core_peel(
        edges, k=2, rounds=1,
        broadcast_degrees=broadcast_degrees,
        require_converged=True,
    )
    with pytest.raises(Exception, match="not converged"):
        out.write.mode("overwrite").format("noop").save()


def test_k_core_rounds2_matches_rounds4_on_bench_graph(spark):
    """The q_k_core optimization contract: on the hash-folded orders
    graph the 2-round guarded peel equals the 4-round peel row-for-row
    (the oracle twin still runs 4 rounds)."""
    import __spark_entry__ as em
    from obsplus_spark.operators.graph import k_core_peel

    o = em._t(spark, "/root/testdata/sf0.01", "orders")
    edges = o.selectExpr(
        "o_custkey % 4001 AS src", "(o_orderkey * 7 + 3) % 4001 AS dst"
    )
    r4 = k_core_peel(edges, k=3, rounds=4, broadcast_degrees=True)
    r2 = k_core_peel(
        edges, k=3, rounds=2, broadcast_degrees=True,
        require_converged=True,
    )
    assert r4.exceptAll(r2).count() == 0
    assert r2.exceptAll(r4).count() == 0
