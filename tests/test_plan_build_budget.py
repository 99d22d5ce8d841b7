"""Plan-construction budget (VERDICT r10 "Next round" #6): registry
growth must not silently regress the driver-side cost of DEFINING the
query set. bench.py reports the same quantity as plan_build_sec; this
test pins per-query budgets so a hot build shows up at the offending
query, not as a slow drift of the bench total.

Calibration (quiet host, 208-query registry, BENCH_FULL.json builds):
median 0.036 s, p90 0.136 s, max 0.48 s (leak_safe_split — 27 deep
single-statement analyses + a ~34 ms/query py4j floor are the honest
mass). Budgets below carry ~2× slack for shared-host scheduler noise
and the pytest local[4] session; the MEAN budget is per-query, so the
total scales with the registry instead of re-basing every round.
"""

import time

SF_DIR = "/root/testdata/sf0.001"

MEDIAN_BUDGET = 0.08   # s — 2.2x the quiet-host median
MAX_BUDGET = 1.0       # s — ~2x the quiet-host max build
MEAN_BUDGET = 0.11     # s/query — 2x the quiet-host mean (~0.055)


def test_plan_build_budget(spark):
    import __spark_entry__ as em

    builds = {}
    for name, fn in em.queries().items():
        # best-of-2, the bench's own rule: construction is driver-side
        # Python + Catalyst analysis; single runs swing ±50% with
        # scheduler noise, the min is the reproducible cost
        t0 = time.perf_counter()
        fn(spark, SF_DIR)
        b1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, SF_DIR)
        builds[name] = min(b1, time.perf_counter() - t0)

    v = sorted(builds.values())
    n = len(v)
    median = v[n // 2]
    mean = sum(v) / n
    worst = max(builds, key=builds.get)
    assert median <= MEDIAN_BUDGET, (
        f"median plan build {median:.3f}s > {MEDIAN_BUDGET}s over {n}"
        f" queries — a systematic construction regression"
    )
    assert builds[worst] <= MAX_BUDGET, (
        f"hottest plan build {worst}={builds[worst]:.3f}s > {MAX_BUDGET}s"
        f" — shrink its expression tree (data-driven lambdas, one"
        f" sql_over statement) like the r10 minhash-lane fix"
    )
    assert mean <= MEAN_BUDGET, (
        f"mean plan build {mean:.4f}s/query > {MEAN_BUDGET}s over {n}"
        f" queries (total {sum(v):.1f}s) — the registry-proportional"
        f" budget; find the new hot family before growing further"
    )
