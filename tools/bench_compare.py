"""Side-by-side engine-vs-DuckDB timing at one scale factor.

Runs the SAME protocol on both engines in the same process window (the
shared host drifts 2× between hours — a ratio is only meaningful when
both sides are measured back-to-back): warmup pass, then best-of-N per
query. Prints per-query and total ratios.

Usage: python tools/bench_compare.py [sf_dir] [reps] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb

    import __spark_entry__ as m
    from obsplus_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    only = set(sys.argv[3:])

    # --- engine side (bench.py protocol) ---
    import os

    # partitions sized to the DATA, not the bench constant: 4 is the
    # sf0.1 sweep minimum, but a 10-80× synthetic dir needs shuffle
    # width to follow the fact tables (the r9 phash harness lesson,
    # pinned by VERDICT r9 #7). Override via SPARK_GRAFT_SHUFFLE.
    spark = get_spark(
        "bench_compare",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "4")),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs = m.queries()
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    for fn in qs.values():  # warmup at the bench SF (JIT + caches)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    # keep in lockstep with bench.py's rebuild_each_rep: every query
    # whose construction persists a derived frame re-builds per rep so
    # the rep re-materializes that persist (steady-state, not result
    # caching)
    rebuild = {"minhash_near_dup", "prune_orphans", "common_coverage",
               "dedup_clusters", "canonical_docs", "jaccard_join", "rebalance", "dedup_eval",
               "bcubed", "mix_audit",
               "incremental_dedup", "semantic_dedup", "bfs_hops",
               "hits_auth", "pagerank", "k_core", "bigram_lp",
               "cascade_delete", "image_phash", "phash_wide", "fuzzy_decontam",
               "leak_safe_split", "lsh_recall", "cluster_quality"}
    eng: dict[str, float] = {}
    for name, fn in qs.items():
        df = None if name in rebuild else fn(spark, sf_dir)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            (fn(spark, sf_dir) if df is None else df).write.mode(
                "overwrite"
            ).format("noop").save()
            best = min(best, time.perf_counter() - t0)
        eng[name] = best

    # --- oracle side (same warmup + best-of protocol) ---
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    sqls = m.oracle_sql()
    if only:
        sqls = {n: s for n, s in sqls.items() if n in only}
    for s in sqls.values():
        con.execute(s).fetchall()
    duck: dict[str, float] = {}
    for name, s in sqls.items():
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(s).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck[name] = best

    rows = sorted(
        ((n, eng[n], duck.get(n)) for n in eng),
        key=lambda r: -(r[1] - (r[2] or 0.0)),
    )
    for n, e, d in rows:
        ratio = f"{e / d:5.1f}x" if d else "   — "
        print(f"{n:24s} engine {e:7.3f}  duckdb {d if d else float('nan'):7.3f}  {ratio}")
    te = sum(eng.values())
    td = sum(v for v in duck.values())
    print(f"\nTOTAL engine {te:.2f}s  duckdb {td:.2f}s  ratio {te / td:.2f}x"
          f"  ({len(eng)} queries, best-of-{reps}, {sf_dir})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
