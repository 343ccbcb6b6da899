"""Table profiling — one-pass column statistics for corpus management.

A 100 TB warehouse needs ANALYZE-style statistics to plan curation
(null-heavy columns, cardinality for bucketing keys, length budgets for
tokenization). This operator computes them in ONE aggregation pass over
the scan — every per-column statistic is an aggregate expression in a
single ``agg``, so the table is read once and the only shuffle is the
final single-row reduce (plus the distinct-count expansions).

Per column: row/null counts, null fraction, distinct count (exact by
default for the contract; ``exact=False`` switches to
``approx_count_distinct`` (HyperLogLog++), the scale path — one pass, no
distinct expansion, ±~2% error), min/max (as strings for string columns,
as rounded doubles for numerics — cross-engine double-to-string
formatting is not stable, numeric stays numeric), and mean string
length.

The profile is the engine-side analogue of the reference's admin
introspection endpoints (row counts and health metrics per table,
`app/api/admin.py`); the statistics themselves are standard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType, StringType


def profile_table(df: DataFrame, exact: bool = True) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls, null_frac,
    n_distinct, min_str, max_str, min_num, max_num, avg_len)."""
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("bigint")
    structs = []
    for field in df.schema.fields:
        c = F.col(field.name)
        is_str = isinstance(field.dataType, StringType)
        is_num = isinstance(field.dataType, NumericType)
        distinct = (F.count_distinct(c) if exact
                    else F.approx_count_distinct(c))
        structs.append(F.struct(
            F.lit(field.name).alias("column"),
            F.lit(field.dataType.simpleString()).alias("dtype"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias("n_nulls"),
            distinct.alias("n_distinct"),
            (F.min(c) if is_str else null_s).alias("min_str"),
            (F.max(c) if is_str else null_s).alias("max_str"),
            (F.round(F.min(c).cast("double"), 6) if is_num
             else null_d).alias("min_num"),
            (F.round(F.max(c).cast("double"), 6) if is_num
             else null_d).alias("max_num"),
            (F.sum(F.length(c)) if is_str else null_l).alias("sum_len"),
            (F.count(c) if is_str else null_l).alias("n_str"),
        ).alias(f"__{field.name}"))
    one = df.agg(*structs)
    stacked = one.select(F.explode(F.array(
        *[F.col(f"__{field.name}") for field in df.schema.fields]))
        .alias("s")).select("s.*")
    return stacked.select(
        "column", "dtype", "n_rows", "n_nulls",
        F.round(F.col("n_nulls").cast("double")
                / F.greatest(F.col("n_rows"), F.lit(1)).cast("double"),
                6).alias("null_frac"),
        "n_distinct", "min_str", "max_str", "min_num", "max_num",
        F.when(F.col("n_str") > 0,
               F.round(F.col("sum_len").cast("double")
                       / F.col("n_str").cast("double"), 6))
         .alias("avg_len"))
