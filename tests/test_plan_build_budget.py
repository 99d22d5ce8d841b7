"""Plan-construction budget (VERDICT r10 "Next round" #6): registry
growth must not silently regress the driver-side cost of DEFINING the
query set. bench.py reports the same quantity as plan_build_sec; this
test pins per-query budgets so a hot build shows up at the offending
query, not as a slow drift of the bench total.

r12 recalibration: the original worst≤25×median SHAPE assert was
rotation-order-fragile — the driver window rotates every round by
design, and whichever heavy pipeline builds FIRST pays the one-time
analysis/cache-population cost later positions reuse (cold `rebalance`
3.85 s at window position 2 vs 0.95 s steady-state; `exact_spans`
1.13 s cold vs 0.11 s warm). On top of that, `k_core`'s build is
bimodal on this host (0.58 / 1.14 / 1.91 s across three same-day
runs — JVM GC tail, untouched code). So the test now (a) measures
STEADY STATE — one untimed warm pass over the whole registry, then
best-of-2 — making it invariant to the rotation, and (b) pins robust
aggregates (p90 shape, mean shape, absolute ceilings) instead of the
single GC-noisy worst. The regression this exists to catch (the r10
minhash case: an exponentially-growing expression tree, >10 s to
analyze) still trips the 3 s worst ceiling by a wide margin.

Calibration (this host, 220-query registry, steady state): median
0.058 s, mean 0.119 s, p90 ~0.30 s, worst 1.9 s (k_core's bad-GC
draw; its good draw is 0.6 s).
"""

import time

SF_DIR = "/root/testdata/sf0.001"

# shape budgets (host-load invariant: numerator and denominator share
# the window; p90 and mean are robust to one GC-noisy tail draw)
P90_OVER_MEDIAN = 12.0   # steady-state ratio ~5x (0.30 / 0.058)
MEAN_OVER_MEDIAN = 4.0   # steady-state ratio ~2.1x

# absolute ceilings (throttle headroom included)
MEDIAN_BUDGET = 0.25     # s — steady-state median 0.058
MAX_BUDGET = 3.0         # s — steady-state worst 1.9 (k_core GC draw);
#                            the r10-minhash failure mode is >10 s
MEAN_BUDGET = 0.35       # s/query — steady-state mean 0.119


def test_plan_build_budget(spark):
    import __spark_entry__ as em

    qs = em.queries()
    # untimed warm pass: rotation-invariant steady state (first-build
    # positions otherwise pay one-time analysis/cache-population costs
    # that later positions reuse)
    for fn in qs.values():
        fn(spark, SF_DIR)

    builds = {}
    for name, fn in qs.items():
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
    p90 = v[(9 * n) // 10]
    mean = sum(v) / n
    worst = max(builds, key=builds.get)
    # shape: the build-cost DISTRIBUTION towering over its own median
    # is a regression regardless of host state; p90 (not the worst)
    # so one GC-noisy tail draw can't flake the assert
    assert p90 <= P90_OVER_MEDIAN * max(median, 0.02), (
        f"p90 plan build {p90:.3f}s is {p90 / median:.0f}x the window"
        f" median ({median:.3f}s) — a heavy build family crept in;"
        f" hottest is {worst}={builds[worst]:.3f}s (shrink its"
        f" expression tree: data-driven lambdas, one sql_over"
        f" statement, like the r10 minhash fix)"
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
        f" queries — systematic construction regression (steady-state"
        f" median is 0.058s; even throttled windows sit under 0.15s)"
    )
    assert builds[worst] <= MAX_BUDGET, (
        f"hottest plan build {worst}={builds[worst]:.3f}s > {MAX_BUDGET}s"
        f" — the r10-minhash failure mode (an exploding expression"
        f" tree) lands an order of magnitude above this ceiling"
    )
    assert mean <= MEAN_BUDGET, (
        f"mean plan build {mean:.4f}s/query > {MEAN_BUDGET}s over {n}"
        f" queries (total {sum(v):.1f}s)"
    )
