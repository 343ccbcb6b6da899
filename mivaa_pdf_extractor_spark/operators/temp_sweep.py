"""System temp-file sweep classifier
(app/services/utilities/cleanup_service.py:36-41,1042-1250,
``cleanup_system_temp_files``).

The storage-bucket sweeps are covered by ``operators/storage_cleanup``;
this folds the five-tier filesystem scope ladder (I/O arrives as a
listing of (directory, name, is_dir, age, size) entries — the walk
itself is host I/O, the CLASSIFICATION is the fold):

1. ``/tmp`` FILES ending ``.pdf`` with age STRICTLY > max_age (pin:
   exact-age files survive);
2. ``/tmp`` DIRECTORIES whose lowercased name contains
   ``pdf_processor`` or ``pdf_processing``, age-gated the same way
   (a /tmp FILE named pdf_processor_x is NOT tier 2 — isdir gate);
3. the output directory's FILES — deleted with NO age check at all
   (pin: a second-old output file is swept);
4. ``__pycache__`` directories anywhere under the app base — also
   ageless (pin);
5. items (files OR directories) directly inside the four temp
   processing dirs, age-gated.

The docstring advertises an "empty temp/uploads/logs folders" tier
and the stats dict carries ``empty_folders_deleted`` — but NO code
path increments it; it is forever 0 (doc-vs-code pin, kept in the
summary). ``total_size_freed_mb`` sums the five size counters;
dry-run classifies identically and deletes nothing (the fold IS the
dry run).

Scale: one map-side classification + a five-counter rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TEMP_DIRS = ("/tmp/pdf_processing", "/tmp/image_extraction",
             "/tmp/huggingface_cache", "/tmp/claude_cache")
OUTPUT_DIR = "/var/www/mivaa-pdf-extractor/output"
BASE_DIR = "/var/www/mivaa-pdf-extractor"


def classify_entries(entries: DataFrame, *,
                     max_age_hours: int = 24) -> DataFrame:
    """entries: (entry_id, parent_dir, name, is_dir, age_s,
    size_mb). Emits the delete classification per entry."""
    max_age_s = max_age_hours * 3600
    old = F.col("age_s") > max_age_s          # strictly older
    in_tmp = F.col("parent_dir") == "/tmp"
    lname = F.lower("name")
    tier = (
        F.when(in_tmp & ~F.col("is_dir") & F.col("name").endswith(".pdf")
               & old, "pdf_files")
        .when(in_tmp & F.col("is_dir")
              & (lname.contains("pdf_processor")
                 | lname.contains("pdf_processing")) & old,
              "pdf_processor_folders")
        .when((F.col("parent_dir") == OUTPUT_DIR) & ~F.col("is_dir"),
              "output_files")                 # ageless (pin)
        .when(F.col("parent_dir").startswith(BASE_DIR)
              & F.col("is_dir") & (F.col("name") == "__pycache__"),
              "pycache_folders")              # ageless (pin)
        .when(F.col("parent_dir").isin(*TEMP_DIRS) & old,
              "temp_processing"))
    return entries.select(
        "entry_id", "parent_dir", "name",
        tier.alias("tier"),
        F.when(tier.isNotNull(), F.col("size_mb"))
        .alias("freed_mb"))


def sweep_summary(classified: DataFrame) -> DataFrame:
    """The stats dict: per-tier counts + sizes, the forever-zero
    empty_folders_deleted, and the five-way total."""
    def n(t):
        return F.sum((F.col("tier") == t).cast("int")).cast("long")

    def s(t):
        return F.round(F.sum(F.when(F.col("tier") == t,
                                    F.col("freed_mb"))
                             .otherwise(F.lit(0.0))), 4)
    return classified.agg(
        n("pdf_files").alias("pdf_files_deleted"),
        s("pdf_files").alias("pdf_files_size_mb"),
        n("pdf_processor_folders")
        .alias("pdf_processor_folders_deleted"),
        s("pdf_processor_folders").alias("pdf_processor_size_mb"),
        n("output_files").alias("output_files_deleted"),
        s("output_files").alias("output_size_mb"),
        F.lit(0).cast("long").alias("empty_folders_deleted"),
        n("pycache_folders").alias("pycache_folders_deleted"),
        s("pycache_folders").alias("pycache_size_mb"),
        n("temp_processing").alias("temp_processing_files_deleted"),
        s("temp_processing").alias("temp_processing_size_mb"),
        F.round(F.sum(F.coalesce("freed_mb", F.lit(0.0))), 4)
        .alias("total_size_freed_mb"))


# ---------------------------------------------------------------------------
# synthesizer + DuckDB twins
# ---------------------------------------------------------------------------


def synth_fs_entries(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    parent = (F.when(e % 6 == 0, "/tmp")
              .when(e % 6 == 1, OUTPUT_DIR)
              .when(e % 6 == 2, BASE_DIR + "/app/services")
              .when(e % 6 == 3, TEMP_DIRS[0])
              .when(e % 6 == 4, TEMP_DIRS[2])
              .otherwise("/home/elsewhere"))
    name = (F.when(e % 7 == 0,
                   F.concat(F.lit("doc"), e.cast("string"),
                            F.lit(".pdf")))
            .when(e % 7 == 1,
                  F.concat(F.lit("PDF_Processor_"),
                           (e % 9).cast("string")))
            .when(e % 7 == 2, F.lit("__pycache__"))
            .when(e % 7 == 3,
                  F.concat(F.lit("pdf_processing_run"),
                           (e % 5).cast("string")))
            .otherwise(F.concat(F.lit("item"), (e % 31).cast("string"))))
    return events.select(
        e.cast("long").alias("entry_id"),
        parent.alias("parent_dir"),
        name.alias("name"),
        (e % 3 == 1).alias("is_dir"),
        # exact-boundary ages included: 24h exactly at e%5==0
        F.when(e % 5 == 0, F.lit(86400))
        .otherwise(((e % 50) * 3600 + 7).cast("long")).cast("long")
        .alias("age_s"),
        F.round((e % 37) * 0.25 + 0.1, 2).alias("size_mb"))


SYNTH_FS_ENTRIES_SQL = f"""
    SELECT CAST(event_id AS BIGINT) AS entry_id,
           CASE event_id % 6 WHEN 0 THEN '/tmp'
                WHEN 1 THEN '{OUTPUT_DIR}'
                WHEN 2 THEN '{BASE_DIR}/app/services'
                WHEN 3 THEN '{TEMP_DIRS[0]}'
                WHEN 4 THEN '{TEMP_DIRS[2]}'
                ELSE '/home/elsewhere' END AS parent_dir,
           CASE event_id % 7
                WHEN 0 THEN 'doc' || CAST(event_id AS VARCHAR)
                            || '.pdf'
                WHEN 1 THEN 'PDF_Processor_'
                            || CAST(event_id % 9 AS VARCHAR)
                WHEN 2 THEN '__pycache__'
                WHEN 3 THEN 'pdf_processing_run'
                            || CAST(event_id % 5 AS VARCHAR)
                ELSE 'item' || CAST(event_id % 31 AS VARCHAR) END
               AS name,
           event_id % 3 = 1 AS is_dir,
           CAST(CASE WHEN event_id % 5 = 0 THEN 86400
                ELSE (event_id % 50) * 3600 + 7 END AS BIGINT)
               AS age_s,
           round((event_id % 37) * 0.25 + 0.1, 2) AS size_mb
    FROM events
"""


def _tier_sql(max_age_hours: int) -> str:
    max_age_s = max_age_hours * 3600
    temp_dirs = ", ".join(f"'{d}'" for d in TEMP_DIRS)
    return f"""
        CASE WHEN parent_dir = '/tmp' AND NOT is_dir
                  AND name LIKE '%.pdf' AND age_s > {max_age_s}
             THEN 'pdf_files'
             WHEN parent_dir = '/tmp' AND is_dir
                  AND (contains(lower(name), 'pdf_processor')
                       OR contains(lower(name), 'pdf_processing'))
                  AND age_s > {max_age_s}
             THEN 'pdf_processor_folders'
             WHEN parent_dir = '{OUTPUT_DIR}' AND NOT is_dir
             THEN 'output_files'
             WHEN starts_with(parent_dir, '{BASE_DIR}') AND is_dir
                  AND name = '__pycache__'
             THEN 'pycache_folders'
             WHEN parent_dir IN ({temp_dirs})
                  AND age_s > {max_age_s}
             THEN 'temp_processing' END
"""


def classify_sql(*, max_age_hours: int = 24) -> str:
    return f"""
        WITH e AS ({SYNTH_FS_ENTRIES_SQL}),
        t AS (SELECT *, {_tier_sql(max_age_hours)} AS tier FROM e)
        SELECT entry_id, parent_dir, name, tier,
               CASE WHEN tier IS NOT NULL THEN size_mb END
                   AS freed_mb
        FROM t
    """


def summary_sql(*, max_age_hours: int = 24) -> str:
    def n(t):
        return (f"CAST(sum(CASE WHEN tier = '{t}' THEN 1 ELSE 0 END)"
                f" AS BIGINT)")

    def s(t):
        return (f"round(sum(CASE WHEN tier = '{t}' THEN size_mb"
                f" ELSE 0 END), 4)")
    return f"""
        WITH e AS ({SYNTH_FS_ENTRIES_SQL}),
        t AS (SELECT *, {_tier_sql(max_age_hours)} AS tier FROM e)
        SELECT {n('pdf_files')} AS pdf_files_deleted,
               {s('pdf_files')} AS pdf_files_size_mb,
               {n('pdf_processor_folders')}
                   AS pdf_processor_folders_deleted,
               {s('pdf_processor_folders')}
                   AS pdf_processor_size_mb,
               {n('output_files')} AS output_files_deleted,
               {s('output_files')} AS output_size_mb,
               CAST(0 AS BIGINT) AS empty_folders_deleted,
               {n('pycache_folders')} AS pycache_folders_deleted,
               {s('pycache_folders')} AS pycache_size_mb,
               {n('temp_processing')}
                   AS temp_processing_files_deleted,
               {s('temp_processing')} AS temp_processing_size_mb,
               round(sum(CASE WHEN tier IS NOT NULL THEN size_mb
                         ELSE 0 END), 4) AS total_size_freed_mb
        FROM t
    """
