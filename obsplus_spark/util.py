"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the plan has fewer partitions than the cluster can use.

    Compute-heavy narrow stages (trig cross joins, shingle explodes, hash
    fan-outs) inherit the scan's partitioning; a small single-file input
    serializes them onto one core. This guard repartitions **only when
    under-partitioned** — on a real cluster reading many files/splits it is
    a no-op, so it never introduces a shuffle at scale.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
