"""Parallelism guard for Arrow/Python kernels fed by narrow scans.

A ``mapInPandas`` / ``mapInArrow`` pass inherits its input's partition
count. A small-file parquet scan (one row group -> ONE split) therefore
runs the whole Python kernel on a single task — a 100k-doc batch at
~0.6 ms/doc serializes to ~60 s on a 32-core executor that could do it
in ~2 s. ``applyInPandas`` is immune (its groupBy shuffle repartitions
to ``spark.sql.shuffle.partitions``); only the bare map kernels need
the guard.

``fan_out`` widens the input to the session's default parallelism
ONLY when it is narrower — an already-wide scan (the normal case at
100 TB, where maxPartitionBytes yields thousands of splits) passes
through untouched, so no gratuitous shuffle is added on the scale
path. The round-robin repartition costs one exchange of the kernel's
input columns; for per-row kernels of >= ~0.1 ms/row it pays for
itself immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition ``df`` to defaultParallelism*min_factor if it has
    fewer partitions than that; otherwise return it unchanged."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
