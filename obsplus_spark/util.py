"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def is_local_master(df: DataFrame) -> bool:
    """True when the session runs a ``local[...]`` master."""
    return df.sparkSession.sparkContext.master.startswith("local")


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition under-partitioned inputs ahead of compute-heavy stages.

    Compute-heavy narrow stages (trig cross joins, shingle explodes, hash
    fan-outs) inherit the scan's partitioning; a small single-file input
    serializes them onto one core. On a cluster master the scan's split
    planning already yields parallelism, so this is an identity — no
    ``df.rdd`` probe (which would force physical planning on the driver)
    ever runs in cluster plans. On a local master the probe is a cheap
    driver-side plan conversion (no job) and the repartition it gates moves
    only the compact pre-fan-out rows.
    """
    if not is_local_master(df) and min_partitions is None:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
