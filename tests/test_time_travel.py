"""Snapshot time travel on the bucketed-manifest warehouse.

Round-4 verdict ("What's missing" #1) listed time travel as a gap of
the parquet fallback vs real Iceberg. Each committed generation is now
retained as an immutable ``_MANIFEST.v<N>`` for the last
``snapshot_retention`` commits, its data dirs pinned from GC;
``read(name, version=N)`` reproduces that generation exactly and
expiry is a loud error naming the retained versions.
"""

import os

import pytest
from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.sources.tables_io import Catalog


def _df(spark, lo, hi, tag):
    return (spark.range(lo, hi)
            .select(F.col("id").alias("doc_id"),
                    F.lit(tag).alias("payload")))


def test_read_past_generations(tmp_path, spark):
    cat = Catalog(spark, str(tmp_path / "wh"), num_buckets=4,
                  snapshot_retention=3)
    cat.overwrite(_df(spark, 0, 10, "g1"), "t")          # v1
    cat.upsert(_df(spark, 5, 15, "g2"), "t")             # v2
    cat.upsert(_df(spark, 0, 3, "g3"), "t")              # v3

    assert cat.versions("t") == [1, 2, 3]

    v1 = {r["doc_id"]: r["payload"] for r in cat.read("t", version=1).collect()}
    assert v1 == {i: "g1" for i in range(10)}

    v2 = {r["doc_id"]: r["payload"] for r in cat.read("t", version=2).collect()}
    assert v2 == {**{i: "g1" for i in range(5)},
                  **{i: "g2" for i in range(5, 15)}}

    v3 = {r["doc_id"]: r["payload"] for r in cat.read("t", version=3).collect()}
    assert v3 == {**{i: "g3" for i in range(3)},
                  **{i: "g1" for i in range(3, 5)},
                  **{i: "g2" for i in range(5, 15)}}
    # default read == newest
    assert {r["doc_id"]: r["payload"]
            for r in cat.read("t").collect()} == v3


def test_expiry_is_loud(tmp_path, spark):
    cat = Catalog(spark, str(tmp_path / "wh"), num_buckets=4,
                  snapshot_retention=2)
    for g in range(1, 5):                                # v1..v4
        cat.upsert(_df(spark, 0, 5, f"g{g}"), "t")
    assert cat.versions("t") == [3, 4]
    with pytest.raises(ValueError, match=r"no readable snapshot v1.*\[3, 4\]"):
        cat.read("t", version=1)
    # retained one still reads: generation 3's payload
    assert {r["payload"] for r in
            cat.read("t", version=3).collect()} == {"g3"}


def test_snapshot_dirs_survive_gc_until_expiry(tmp_path, spark):
    cat = Catalog(spark, str(tmp_path / "wh"), num_buckets=4,
                  snapshot_retention=2)
    cat.overwrite(_df(spark, 0, 8, "g1"), "t")           # v1
    cat.overwrite(_df(spark, 0, 8, "g2"), "t")           # v2 (full rewrite)
    # v1 retained -> its dirs must still exist even though v2 replaced
    # every bucket
    assert {r["payload"] for r in
            cat.read("t", version=1).collect()} == {"g1"}
    cat.overwrite(_df(spark, 0, 8, "g3"), "t")           # v3 -> v1 expires
    assert cat.versions("t") == [2, 3]
    root = str(tmp_path / "wh" / "t")
    assert not os.path.exists(os.path.join(root, "_MANIFEST.v1"))


def test_versioned_read_of_missing_table_is_file_not_found(tmp_path,
                                                           spark):
    """ADVICE r5 #4: read(name, version=N) on a table that does not
    exist at all raises FileNotFoundError (like the unversioned path),
    not the snapshot-expired ValueError."""
    cat = Catalog(spark, str(tmp_path / "wh"), num_buckets=4)
    with pytest.raises(FileNotFoundError):
        cat.read("nope", version=1)
    # but an EXISTING table with an expired/never-committed snapshot
    # still raises the loud snapshot error
    cat.overwrite(_df(spark, 0, 4, "g1"), "t")
    with pytest.raises(ValueError, match="no readable snapshot"):
        cat.read("t", version=99)
