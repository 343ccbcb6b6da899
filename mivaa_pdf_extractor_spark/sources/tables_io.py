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
import shutil

from pyspark.sql import DataFrame, SparkSession


def merge_into_sql(table: str, key: str) -> str:
    """The Iceberg MERGE-on-write statement the upsert path issues (shape
    pinned by tests/test_resume.py even though the sandbox lacks the jar):
    row-level upsert keyed on ``key``, full-row update/insert."""
    return (f"MERGE INTO {table} t USING __updates s "
            f"ON t.{key} = s.{key} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *")


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

    def upsert(self, df: DataFrame, name: str, key: str = "doc_id") -> None:
        """Row-level upsert keyed on ``key`` — Iceberg MERGE INTO when the
        runtime is present; on parquet, an anti-join + rewrite staged
        through a temp dir (never overwrite a path mid-read). Keeps the
        `extracted` table one-row-per-doc so snapshot reads need no
        latest-row window compaction."""
        if self.use_iceberg:
            table = f"local.db.{name}"
            if not self.exists(name):
                df.writeTo(table).create()
                return
            df.createOrReplaceTempView("__updates")
            self.spark.sql(merge_into_sql(table, key))
            return
        if not self.exists(name):
            self.append(df, name)
            return
        kept = self.read(name).join(df.select(key).distinct(), key,
                                    "left_anti")
        merged = kept.unionByName(df)
        tmp = self._path(name + "__tmp")
        merged.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(
            self._path(name))
        shutil.rmtree(tmp, ignore_errors=True)
