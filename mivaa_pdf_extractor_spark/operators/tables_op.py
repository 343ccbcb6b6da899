"""Table parse/classify as a Spark stage (SURVEY.md §2.5 G1-G6).

The parsers are per-string state machines (HTMLParser, line scanning), so
they run in an Arrow-batched ``mapInPandas`` pass — one batch of texts in,
one row per successfully-parsed table out. Everything downstream (filtering,
joins against products, aggregation over table types) is native.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T

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

    return slim.mapInPandas(run, schema=TABLE_SCHEMA)
