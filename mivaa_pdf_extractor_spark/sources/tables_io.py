"""Table catalog for the engine's three persistent tables.

The design targets Iceberg (`documents` source, `extracted` sink,
`checkpoints`/`lineage` bookkeeping — SURVEY.md §1.2); this sandbox has no
Iceberg runtime jar, so the catalog transparently falls back to plain parquet
directories with append semantics. Everything the pipeline relies on —
appends, snapshot reads, idempotent re-runs via the checkpoint anti-join —
works identically on both backends; Iceberg additionally gives MERGE and
snapshot isolation for free when the jar is present.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.catalog.Catalog")
        # the jar alone is not enough — a spark catalog must be configured
        return spark.conf.get("spark.sql.catalog.local", None) is not None
    except Exception:
        return False


class Catalog:
    """Warehouse of named tables, Iceberg when available, parquet otherwise."""

    def __init__(self, spark: SparkSession, warehouse: str,
                 prefer_iceberg: bool = True):
        self.spark = spark
        self.warehouse = warehouse
        self.use_iceberg = prefer_iceberg and iceberg_available(spark)
        os.makedirs(warehouse, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"local.db.{name}")
        p = self._path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p))

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(f"local.db.{name}")
        return self.spark.read.parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.use_iceberg:
            df.writeTo(f"local.db.{name}").append()
        else:
            df.write.mode("append").parquet(self._path(name))

    def overwrite(self, df: DataFrame, name: str) -> None:
        if self.use_iceberg:
            df.writeTo(f"local.db.{name}").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._path(name))
