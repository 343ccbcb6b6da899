"""Table parse/classify as a Spark stage (SURVEY.md §2.5 G1-G6).

The parsers are per-string state machines (HTMLParser, line scanning), so
they run in an Arrow-batched ``mapInPandas`` pass — one batch of texts in,
one row per successfully-parsed table out. Everything downstream (filtering,
joins against products, aggregation over table types) is native.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..core.tables import (classify_table, grid_to_pipe_table,
                           parse_table_content, table_to_record)

TABLE_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("table_type", T.StringType()),
    T.StructField("headers", T.StringType()),     # comma-joined (G6)
    T.StructField("num_rows", T.IntegerType()),
    T.StructField("num_cols", T.IntegerType()),
    T.StructField("pipe_table", T.StringType()),  # canonical serialization
])


def _parse_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for i, text in zip(pdf["id"], pdf["text"]):
        grid = parse_table_content(text)
        if grid is None:
            continue  # "None is not an empty table" (G3)
        rec = table_to_record(grid)
        rows.append((i, classify_table(grid), ",".join(rec["headers"]),
                     rec["num_rows"], rec["num_cols"],
                     grid_to_pipe_table(grid)))
    return pd.DataFrame(rows, columns=[f.name for f in TABLE_SCHEMA.fields])


def parse_and_classify_tables(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Parse each text as a table (HTML or markdown, G3 dispatch); emit one
    classified record per parseable table."""
    slim = df.selectExpr(f"cast({id_col} as string) as id",
                         f"{text_col} as text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _parse_batch(pdf)

    from mivaa_pdf_extractor_spark.core.fanout import fan_out
    return fan_out(slim).mapInPandas(run, schema=TABLE_SCHEMA)


# --- G7 table-metadata mining (core/table_metadata.py semantics) ---------

_NUM_FIELDS = ("thickness_mm", "pieces_per_box", "boxes_per_pallet",
               "weight_per_box_kg", "coverage_per_box_m2",
               "pallet_weight_kg", "pieces_per_m2")
_STR_FIELDS = ("water_absorption", "slip_resistance", "frost_resistance",
               "breaking_strength", "abrasion_resistance",
               "chemical_resistance", "fire_rating")

MINED_SCHEMA = T.StructType(
    [T.StructField("id", T.StringType()),
     T.StructField("table_type", T.StringType()),
     T.StructField("sizes", T.StringType())]      # sorted, comma-joined
    + [T.StructField(f, T.DoubleType()) for f in _NUM_FIELDS]
    + [T.StructField(f, T.StringType()) for f in _STR_FIELDS])


def _mine_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..core.table_metadata import mine_table

    rows = []
    for i, text in zip(pdf["id"], pdf["text"]):
        grid = parse_table_content(text)
        if grid is None:
            continue
        rec = table_to_record(grid)
        ttype = classify_table(grid)
        mined = mine_table(ttype, rec["headers"], rec["rows"])
        rows.append((i, ttype,
                     ",".join(mined["available_sizes"]) or None,
                     mined["thickness_mm"],
                     *[mined["packaging"].get(f)
                       for f in _NUM_FIELDS if f != "thickness_mm"],
                     *[mined["performance"].get(f) for f in _STR_FIELDS]))
    return pd.DataFrame(rows, columns=[f.name for f in MINED_SCHEMA.fields])


def aggregate_product_metadata(mined: DataFrame,
                               product_col: str = "product_id",
                               order_col: str = "page") -> DataFrame:
    """The reference's per-product merge across a product's tables
    (table_metadata_extractor.py:96-171), restated as ONE native groupBy
    (plus a tiny thickness-mode aggregate) over ``mine_table_metadata``
    output joined with a product key and a table order (page):

    - packaging fields: FIRST non-null in table order ('may have multiple
      packaging tables' — a later table never overwrites, :136-139);
    - performance specs: LAST non-null (dict .update semantics, :148-149);
    - sizes: sorted distinct union of every table's size strings (:163-165);
    - thickness: modal value across tables, ties to the smallest
      (deterministic version of :168-171).

    No UDF, no window over the full table — min_by/max_by with
    null-masked ordering keys do first/last-non-null inside the
    aggregation. The mined input is referenced by two subplans (the main
    merge and the thickness mode), so it is persisted through the
    operator cache registry — release with ``release_cached()`` /
    ``cache_scope()`` after materializing."""
    from ..core.cache import track

    mined = track(mined)
    first_keys = [f for f in _NUM_FIELDS if f != "thickness_mm"]
    o = F.col(order_col)

    def first_nn(c: str):
        col = F.col(c)
        return F.min_by(col, F.when(col.isNotNull(), o)).alias(c)

    def last_nn(c: str):
        col = F.col(c)
        return F.max_by(col, F.when(col.isNotNull(), o)).alias(c)

    agg = mined.groupBy(product_col).agg(
        F.array_join(F.array_sort(F.array_distinct(F.flatten(
            F.collect_list(F.split(F.col("sizes"), ","))))), ",")
        .alias("sizes"),
        *[first_nn(c) for c in first_keys],
        *[last_nn(c) for c in _STR_FIELDS],
    ).withColumn("sizes", F.nullif(F.col("sizes"), F.lit("")))

    th = (mined.filter(F.col("thickness_mm").isNotNull())
          .groupBy(product_col, "thickness_mm").count()
          .groupBy(product_col)
          .agg(F.max_by(
              "thickness_mm",
              # mode with deterministic ties: highest count, then the
              # SMALLEST thickness — negate it in the ordering key
              F.struct(F.col("count"), (-F.col("thickness_mm"))
                       .alias("neg"))).alias("thickness_mm")))
    return agg.join(th, product_col, "left").select(
        product_col, "sizes", "thickness_mm", *first_keys, *_STR_FIELDS)


def mine_table_metadata(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """G7: parse + classify + mine each text as a table in ONE Arrow pass
    (no re-parse between stages); one flat row per parseable table with
    the mined dimensions/packaging/performance fields, null where the
    table doesn't carry them. Per-product aggregation (the reference's
    merge across a product's tables) is then a plain groupBy on the
    caller's product key — native, no UDF."""
    slim = df.selectExpr(f"cast({id_col} as string) as id",
                         f"{text_col} as text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _mine_batch(pdf)

    from mivaa_pdf_extractor_spark.core.fanout import fan_out
    return fan_out(slim).mapInPandas(run, schema=MINED_SCHEMA)
