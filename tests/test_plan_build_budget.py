"""Plan-construction budget (VERDICT r10 "Next round" #6): registry
growth must not silently regress the driver-side cost of DEFINING the
query set. bench.py reports the same quantity as plan_build_sec; this
test pins per-query budgets so a hot build shows up at the offending
query, not as a slow drift of the bench total.

Calibration (quiet host, 208-query registry, BENCH_FULL.json builds):
median 0.036 s, p90 0.136 s, max 0.48 s (leak_safe_split — 27 deep
single-statement analyses + a ~34 ms/query py4j floor are the honest
mass). The shared host throttles some windows 2-4× (NOTES r11 §9), so
the sharp assertions are SHAPE-relative — a hot build must stand out
against the same-window median, which absorbs uniform host slowdown —
and the absolute ceilings carry throttle headroom on top of the 2×
noise slack.
"""

import time

SF_DIR = "/root/testdata/sf0.001"

# shape budgets (host-load invariant: numerator and denominator share
# the window)
MAX_OVER_MEDIAN = 25.0   # quiet-host ratio ~13x (0.48 / 0.036)
MEAN_OVER_MEDIAN = 3.0   # quiet-host ratio ~1.5x

# absolute ceilings (throttle headroom included)
MEDIAN_BUDGET = 0.25     # s — quiet-host median 0.036; 3-4x throttle + slack
MAX_BUDGET = 2.5         # s — quiet-host max 0.48
MEAN_BUDGET = 0.35       # s/query — quiet-host mean ~0.055


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
    # shape: one query's build towering over the same-window median is
    # a per-query regression regardless of host state
    assert builds[worst] <= MAX_OVER_MEDIAN * max(median, 0.02), (
        f"hottest plan build {worst}={builds[worst]:.3f}s is"
        f" {builds[worst] / median:.0f}x the window median"
        f" ({median:.3f}s) — shrink its expression tree (data-driven"
        f" lambdas, one sql_over statement) like the r10 minhash fix"
    )
    assert mean <= MEAN_OVER_MEDIAN * max(median, 0.02), (
        f"mean plan build {mean:.4f}s is {mean / median:.1f}x the"
        f" window median ({median:.3f}s) over {n} queries — a heavy"
        f" build FAMILY crept in"
    )
    # absolutes: systematic regressions that scale the whole
    # distribution (headroom for documented host throttle)
    assert median <= MEDIAN_BUDGET, (
        f"median plan build {median:.3f}s > {MEDIAN_BUDGET}s over {n}"
        f" queries — systematic construction regression (quiet-host"
        f" median is 0.036s; even throttled windows sit under 0.15s)"
    )
    assert builds[worst] <= MAX_BUDGET, (
        f"hottest plan build {worst}={builds[worst]:.3f}s > {MAX_BUDGET}s"
    )
    assert mean <= MEAN_BUDGET, (
        f"mean plan build {mean:.4f}s/query > {MEAN_BUDGET}s over {n}"
        f" queries (total {sum(v):.1f}s)"
    )
