"""Document-management job administration folds
(app/api/documents/management_routes.py) as Spark plans — storage
downloads / background re-triggering are out of scope (network); the
deterministic decision ladders around them are reproduced:

- job-status fold (:59-193): the DB row is the source of truth; when the
  job is also in memory, matches_db = (status equal AND progress equal)
  where BOTH sides read .get('progress', 0) — but a present-NULL db
  progress stays None (Python .get returns the stored None, the default
  only covers ABSENT keys), so a NULL db progress never matches the
  memory default 0 (pin); a job in memory but NOT in the DB is the
  'sync_failure' 500 branch; neither → 404;
- delete mode (:551-570): preserve_outputs iff status == 'completed';
  a missing/failed status read folds to 'unknown' → wipe;
- restart ladder (:221-436): no checkpoint → 404; checkpoint data
  verification fails → 400; job row missing → 404; document row
  missing → 404; then the file-path resolution ladder — a '/tmp/'
  file_path is replaced by metadata.file_url (missing url → 400) and
  the REPLACED value flows through the rest of the ladder (pin); falsy
  file_path → 400; http(s) prefix → URL download; otherwise bucket =
  split('/')[0] with storage_path the remainder, and a slash-less path
  falls to bucket 'pdf-documents' with the whole string as the path
  (pin); resume parameters come from job metadata via .get — absent
  keys default (discovery_model 'claude-opus-4-8', categories
  ['products'], prompt enhancement False) while present-NULL keys pass
  None through (pin); workspace = doc workspace or the default
  (falsy-or);
- list fold (:446-505): sort 'field:direction' splits on ':' — asc iff
  lower(direction)=='asc', so 'created_at:DESC' sorts desc and
  'progress:Asc' asc (pin); a sort value with TWO colons raises
  ValueError into the 500 handler (pin); no colon → created_at desc;
  status filter is an exact eq; range(offset, offset+limit-1) is
  INCLUSIVE (supabase .range) → limit rows.

Scale: status/delete/restart folds are map-side; the list fold ranks
jobs ONCE per (status_filter, field, direction) combination — a bounded
28-way expansion — then requests broadcast-join onto their combo's rank
range, so adding requests never re-sorts the jobs table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_BUCKET = "pdf-documents"
DEFAULT_MODEL = "claude-opus-4-8"
DEFAULT_WORKSPACE = "ws-default"

STATUSES = ("pending", "processing", "completed", "failed",
            "interrupted", "cancelled")
SORTS = ("created_at:desc", "created_at:asc", "progress:desc",
         "progress:Asc", "created_at:DESC", "progress",
         "created_at:desc:extra")


def status_fold(jobs: DataFrame) -> DataFrame:
    """get_job_status memory comparison + delete_job mode
    (:59-193, :551-570)."""
    in_db = F.col("exists_db")
    in_mem = F.col("in_memory")
    outcome = (F.when(in_db, F.lit("ok"))
               .when(in_mem, F.lit("sync_failure"))
               .otherwise(F.lit("not_found")))
    # .get('progress', 0): the default only covers ABSENT keys; a
    # present-NULL db progress stays None and never equals the memory 0
    db_prog = F.col("db_progress")
    matches = (F.col("mem_status").eqNullSafe(F.col("db_status"))
               & F.coalesce(F.col("mem_progress"), F.lit(0))
               .eqNullSafe(db_prog))
    status_read = F.when(in_db, F.coalesce(F.col("db_status"),
                                           F.lit("unknown"))) \
        .otherwise(F.lit("unknown"))
    return jobs.select(
        "job_id", outcome.alias("outcome"),
        F.when(in_db & in_mem, matches).cast("int").alias("matches_db"),
        (status_read == "completed").cast("int").alias("preserve_outputs"),
        status_read.alias("status_read"))


def restart_plan(jobs: DataFrame) -> DataFrame:
    """restart_job_from_checkpoint's decision ladder (:221-436)."""
    fp = F.when(
        F.startswith(F.col("file_path"), F.lit("/tmp/")),
        F.col("file_url")).otherwise(F.col("file_path"))
    tmp_no_url = (F.startswith(F.col("file_path"), F.lit("/tmp/"))
                  & (F.col("file_url").isNull() | (F.col("file_url")
                                                   == "")))
    no_fp = fp.isNull() | (fp == "")
    is_url = F.startswith(fp, F.lit("http://")) | \
        F.startswith(fp, F.lit("https://"))
    has_slash = F.instr(fp, "/") > 0
    bucket = F.when(has_slash, F.split(fp, "/", -1)[0]) \
        .otherwise(F.lit(DEFAULT_BUCKET))
    storage_path = F.when(
        has_slash,
        F.array_join(F.slice(F.split(fp, "/", -1), 2, 1_000_000), "/")) \
        .otherwise(fp)
    outcome = (F.when(F.col("checkpoint_stage").isNull(),
                      F.lit("no_checkpoint"))
               .when(~F.col("verify_ok"), F.lit("verify_failed"))
               .when(~F.col("job_exists"), F.lit("job_not_found"))
               .when(~F.col("doc_exists"), F.lit("doc_not_found"))
               .when(tmp_no_url, F.lit("temp_no_url"))
               .when(no_fp, F.lit("no_file_path"))
               .otherwise(F.lit("ok")))
    ok = outcome == "ok"
    # .get semantics: has_* false → default; has_* true → the stored
    # value, even when NULL
    model = F.when(F.col("has_model"), F.col("discovery_model")) \
        .otherwise(F.lit(DEFAULT_MODEL))
    cats = F.when(F.col("has_categories"), F.col("categories")) \
        .otherwise(F.array(F.lit("products")))
    return jobs.select(
        "job_id", outcome.alias("outcome"),
        F.when(F.col("checkpoint_stage").isNotNull()
               & F.col("verify_ok") & F.col("job_exists"),
               F.col("checkpoint_stage")).alias("restart_stage"),
        F.when(ok, F.when(is_url, F.lit("url"))
               .otherwise(F.lit("storage"))).alias("source_kind"),
        F.when(ok & ~is_url, bucket).alias("bucket"),
        F.when(ok & ~is_url, storage_path).alias("storage_path"),
        F.when(ok, fp).alias("resolved_path"),
        F.when(ok, model).alias("resume_model"),
        F.when(ok, F.array_join(cats, ",")).alias("resume_categories"),
        F.when(ok, F.coalesce(
            F.when(F.col("doc_workspace") != "", F.col("doc_workspace")),
            F.lit(DEFAULT_WORKSPACE))).alias("resume_workspace"),
        F.when(ok, F.coalesce(F.col("prompt_enhancement"),
                              F.lit(False))).cast("int")
        .alias("prompt_enhancement"))


def list_page(requests: DataFrame, jobs: DataFrame) -> DataFrame:
    """list_jobs (:446-505): sort parse + status filter + inclusive
    range pagination. Supabase's ordering on ties is unspecified —
    canonicalized with a job_id tiebreak (documented)."""
    two_colons = F.size(F.split(F.col("sort"), ":", -1)) > 2
    has_colon = F.instr(F.col("sort"), ":") > 0
    field = F.when(has_colon, F.split(F.col("sort"), ":", -1)[0]) \
        .otherwise(F.lit("created_at"))
    direction = F.when(
        has_colon,
        F.when(F.lower(F.split(F.col("sort"), ":", -1)[1]) == "asc",
               F.lit("asc")).otherwise(F.lit("desc"))) \
        .otherwise(F.lit("desc"))
    req = requests.select(
        "request_id", "status_filter", "limit", "offset",
        two_colons.alias("err"), field.alias("field"),
        direction.alias("direction"))

    # rank jobs once per (status_filter, field, direction) combo
    filters = requests.select("status_filter").distinct()
    combos = filters.crossJoin(
        req.select("field", "direction").distinct())
    cj = combos.join(
        jobs,
        F.col("status_filter").isNull()
        | (F.col("status_filter") == F.col("db_status")), "inner")
    key = F.when(F.col("field") == "progress", F.col("db_progress")) \
        .otherwise(F.col("created_ord"))
    order = F.when(F.col("direction") == "asc",
                   key * 10_000_000 + F.col("job_id")) \
        .otherwise(-(key * 10_000_000 + F.col("job_id")))
    w = Window.partitionBy("status_filter", "field", "direction") \
        .orderBy(order)
    ranked = cj.select(
        F.col("status_filter").alias("rk_sf"),
        F.col("field").alias("rk_field"),
        F.col("direction").alias("rk_dir"), "job_id",
        F.row_number().over(w).alias("rk"))
    # Round 6 (10x-scale audit finding): the request-vs-ranked range
    # join hashes only on the combo keys, so every request paired with
    # EVERY ranked job of its combo before the rank-window filter ran
    # — quadratic in corpus size (measured 2 s at sf0.1, 57 s at 10x).
    # Pagination only ever reads ranks up to the deepest requested
    # page, so cap the ranked side at the per-combo max(offset+limit)
    # first (a broadcast-sized aggregate over the bounded combo
    # space); ranks past the cap could never have joined. Left-miss
    # shapes are unchanged: a request whose page lies beyond its
    # combo's jobs still finds no row and emits the NULL page.
    need = (req.filter(~F.col("err"))
            .groupBy("status_filter", "field", "direction")
            .agg(F.max(F.col("offset") + F.col("limit"))
                 .alias("_need"))
            .select(F.col("status_filter").alias("n_sf"),
                    F.col("field").alias("n_field"),
                    F.col("direction").alias("n_dir"), "_need"))
    ranked = (ranked.join(
        F.broadcast(need),
        F.col("rk_sf").eqNullSafe(F.col("n_sf"))
        & (F.col("rk_field") == F.col("n_field"))
        & (F.col("rk_dir") == F.col("n_dir"))
        & (F.col("rk") <= F.col("_need")))
        .select("rk_sf", "rk_field", "rk_dir", "job_id", "rk"))
    out = req.filter(~F.col("err")).join(
        ranked,
        F.col("status_filter").eqNullSafe(F.col("rk_sf"))
        & (F.col("field") == F.col("rk_field"))
        & (F.col("direction") == F.col("rk_dir"))
        & (F.col("rk") > F.col("offset"))
        & (F.col("rk") <= F.col("offset") + F.col("limit")), "left") \
        .select("request_id", "status_filter", "field", "direction",
                "rk", "job_id", F.lit(0).alias("page_error"))
    errs = req.filter(F.col("err")).select(
        "request_id", "status_filter",
        F.lit(None).cast("string").alias("field"),
        F.lit(None).cast("string").alias("direction"),
        F.lit(None).cast("int").alias("rk"),
        F.lit(None).cast("long").alias("job_id"),
        F.lit(1).alias("page_error"))
    return out.unionByName(errs)


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_status_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    dbs = F.lit(STATUSES[0])
    for i, s in enumerate(STATUSES[1:], 1):
        dbs = F.when(e % 6 == i, F.lit(s)).otherwise(dbs)
    mems = F.lit(STATUSES[0])
    for i, s in enumerate(STATUSES[1:], 1):
        mems = F.when((e * 5) % 6 == i, F.lit(s)).otherwise(mems)
    return events.select(
        e.alias("job_id"), (e % 7 != 0).alias("exists_db"),
        (e % 3 == 0).alias("in_memory"), dbs.alias("db_status"),
        mems.alias("mem_status"),
        F.when(e % 11 == 0, F.lit(None).cast("long"))
        .otherwise(e % 101).alias("db_progress"),
        F.when(e % 13 == 0, F.lit(None).cast("long"))
        .otherwise((e * 3) % 101).alias("mem_progress"))


def synth_restart_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    fp = (F.when(e % 8 == 0, F.lit(None).cast("string"))
          .when(e % 8 == 1, F.lit(""))
          .when(e % 8 == 2, F.concat(F.lit("/tmp/doc"), e, F.lit(".pdf")))
          .when(e % 8 == 3, F.concat(F.lit("https://cdn.example/f"), e))
          .when(e % 8 == 4, F.concat(F.lit("http://cdn.example/f"), e))
          .when(e % 8 == 5, F.concat(F.lit("bucket"), e % 3,
                                     F.lit("/docs/f"), e, F.lit(".pdf")))
          .when(e % 8 == 6, F.concat(F.lit("plain"), e, F.lit(".pdf")))
          .otherwise(F.concat(F.lit("/tmp/other"), e)))
    furl = (F.when((e * 3) % 4 == 0, F.lit(None).cast("string"))
            .when((e * 3) % 4 == 1, F.lit(""))
            .otherwise(F.concat(F.lit("https://store.example/u"), e)))
    stage = F.when(e % 9 == 0, F.lit(None).cast("string")) \
        .otherwise(F.concat(F.lit("stage_"), e % 5))
    model = F.when((e * 7) % 3 == 0, F.lit(None).cast("string")) \
        .otherwise(F.concat(F.lit("model-"), e % 4))
    cats = F.when((e * 11) % 3 == 0,
                  F.lit(None).cast("array<string>")) \
        .otherwise(F.array(F.lit("products"),
                           F.concat(F.lit("cat"), e % 3)))
    ws = (F.when((e * 13) % 4 == 0, F.lit(None).cast("string"))
          .when((e * 13) % 4 == 1, F.lit(""))
          .otherwise(F.concat(F.lit("ws-"), e % 5)))
    pe = F.when((e * 17) % 3 == 0, F.lit(None).cast("boolean")) \
        .otherwise((e % 2 == 0))
    return events.select(
        e.alias("job_id"), stage.alias("checkpoint_stage"),
        ((e * 19) % 5 != 0).alias("verify_ok"),
        (e % 10 != 9).alias("job_exists"),
        ((e * 23) % 7 != 0).alias("doc_exists"),
        fp.alias("file_path"), furl.alias("file_url"),
        ((e * 29) % 2 == 0).alias("has_model"),
        model.alias("discovery_model"),
        ((e * 31) % 2 == 0).alias("has_categories"),
        cats.alias("categories"), ws.alias("doc_workspace"),
        pe.alias("prompt_enhancement"))


def synth_list_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    sf = F.when(e % 7 == 6, F.lit("bogus"))
    for i, s in enumerate(STATUSES):
        sf = F.when(e % 7 == i, F.lit(s)).otherwise(sf)
    sf = F.when(e % 14 < 7, F.lit(None).cast("string")).otherwise(sf)
    srt = F.lit(SORTS[0])
    for i, s in enumerate(SORTS[1:], 1):
        srt = F.when((e * 3) % 7 == i, F.lit(s)).otherwise(srt)
    return events.filter(e % 20 == 0).select(
        e.alias("request_id"), sf.alias("status_filter"),
        srt.alias("sort"),
        (1 + F.floor(e / 20) % 5).cast("int").alias("limit"),
        (F.floor(e / 20) % 4).cast("int").alias("offset"))


def synth_list_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    dbs = F.lit(STATUSES[0])
    for i, s in enumerate(STATUSES[1:], 1):
        dbs = F.when(e % 6 == i, F.lit(s)).otherwise(dbs)
    return events.filter(e % 5 == 1).select(
        e.alias("job_id"), dbs.alias("db_status"),
        ((e * 13) % 997).cast("long").alias("created_ord"),
        ((e * 7) % 101).cast("long").alias("db_progress"))


SYNTH_STATUS_JOBS_SQL = """
    SELECT event_id AS job_id, event_id % 7 <> 0 AS exists_db,
           event_id % 3 = 0 AS in_memory,
           CASE event_id % 6 WHEN 1 THEN 'processing'
                WHEN 2 THEN 'completed' WHEN 3 THEN 'failed'
                WHEN 4 THEN 'interrupted' WHEN 5 THEN 'cancelled'
                ELSE 'pending' END AS db_status,
           CASE (event_id * 5) % 6 WHEN 1 THEN 'processing'
                WHEN 2 THEN 'completed' WHEN 3 THEN 'failed'
                WHEN 4 THEN 'interrupted' WHEN 5 THEN 'cancelled'
                ELSE 'pending' END AS mem_status,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE event_id % 101 END AS db_progress,
           CASE WHEN event_id % 13 = 0 THEN NULL
                ELSE (event_id * 3) % 101 END AS mem_progress
    FROM events
"""

SYNTH_RESTART_JOBS_SQL = """
    SELECT event_id AS job_id,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'stage_' || CAST(event_id % 5 AS VARCHAR) END
               AS checkpoint_stage,
           (event_id * 19) % 5 <> 0 AS verify_ok,
           event_id % 10 <> 9 AS job_exists,
           (event_id * 23) % 7 <> 0 AS doc_exists,
           CASE event_id % 8
                WHEN 0 THEN NULL WHEN 1 THEN ''
                WHEN 2 THEN '/tmp/doc' || CAST(event_id AS VARCHAR)
                     || '.pdf'
                WHEN 3 THEN 'https://cdn.example/f'
                     || CAST(event_id AS VARCHAR)
                WHEN 4 THEN 'http://cdn.example/f'
                     || CAST(event_id AS VARCHAR)
                WHEN 5 THEN 'bucket' || CAST(event_id % 3 AS VARCHAR)
                     || '/docs/f' || CAST(event_id AS VARCHAR) || '.pdf'
                WHEN 6 THEN 'plain' || CAST(event_id AS VARCHAR)
                     || '.pdf'
                ELSE '/tmp/other' || CAST(event_id AS VARCHAR) END
               AS file_path,
           CASE (event_id * 3) % 4 WHEN 0 THEN NULL WHEN 1 THEN ''
                ELSE 'https://store.example/u'
                     || CAST(event_id AS VARCHAR) END AS file_url,
           (event_id * 29) % 2 = 0 AS has_model,
           CASE WHEN (event_id * 7) % 3 = 0 THEN NULL
                ELSE 'model-' || CAST(event_id % 4 AS VARCHAR) END
               AS discovery_model,
           (event_id * 31) % 2 = 0 AS has_categories,
           CASE WHEN (event_id * 11) % 3 = 0 THEN NULL
                ELSE ['products', 'cat' || CAST(event_id % 3 AS VARCHAR)]
           END AS categories,
           CASE (event_id * 13) % 4 WHEN 0 THEN NULL WHEN 1 THEN ''
                ELSE 'ws-' || CAST(event_id % 5 AS VARCHAR) END
               AS doc_workspace,
           CASE WHEN (event_id * 17) % 3 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS prompt_enhancement
    FROM events
"""

SYNTH_LIST_REQUESTS_SQL = """
    SELECT event_id AS request_id,
           CASE WHEN event_id % 14 < 7 THEN NULL
                ELSE CASE event_id % 7 WHEN 0 THEN 'pending'
                     WHEN 1 THEN 'processing' WHEN 2 THEN 'completed'
                     WHEN 3 THEN 'failed' WHEN 4 THEN 'interrupted'
                     WHEN 5 THEN 'cancelled' ELSE 'bogus' END END
               AS status_filter,
           CASE (event_id * 3) % 7
                WHEN 1 THEN 'created_at:asc' WHEN 2 THEN 'progress:desc'
                WHEN 3 THEN 'progress:Asc' WHEN 4 THEN 'created_at:DESC'
                WHEN 5 THEN 'progress'
                WHEN 6 THEN 'created_at:desc:extra'
                ELSE 'created_at:desc' END AS sort,
           CAST(1 + (event_id // 20) % 5 AS INT) AS "limit",
           CAST((event_id // 20) % 4 AS INT) AS "offset"
    FROM events WHERE event_id % 20 = 0
"""

SYNTH_LIST_JOBS_SQL = """
    SELECT event_id AS job_id,
           CASE event_id % 6 WHEN 1 THEN 'processing'
                WHEN 2 THEN 'completed' WHEN 3 THEN 'failed'
                WHEN 4 THEN 'interrupted' WHEN 5 THEN 'cancelled'
                ELSE 'pending' END AS db_status,
           CAST((event_id * 13) % 997 AS BIGINT) AS created_ord,
           CAST((event_id * 7) % 101 AS BIGINT) AS db_progress
    FROM events WHERE event_id % 5 = 1
"""


def status_fold_sql() -> str:
    return f"""
        WITH j AS ({SYNTH_STATUS_JOBS_SQL})
        SELECT job_id,
               CASE WHEN exists_db THEN 'ok'
                    WHEN in_memory THEN 'sync_failure'
                    ELSE 'not_found' END AS outcome,
               CAST(CASE WHEN exists_db AND in_memory THEN
                    mem_status IS NOT DISTINCT FROM db_status
                    AND coalesce(mem_progress, 0)
                        IS NOT DISTINCT FROM db_progress
               END AS INT) AS matches_db,
               CAST((CASE WHEN exists_db
                          THEN coalesce(db_status, 'unknown')
                          ELSE 'unknown' END) = 'completed' AS INT)
                   AS preserve_outputs,
               CASE WHEN exists_db THEN coalesce(db_status, 'unknown')
                    ELSE 'unknown' END AS status_read
        FROM j
    """


def restart_plan_sql() -> str:
    return f"""
        WITH j AS ({SYNTH_RESTART_JOBS_SQL}),
        r AS (
          SELECT *,
                 CASE WHEN starts_with(file_path, '/tmp/')
                      THEN file_url ELSE file_path END AS fp,
                 coalesce(starts_with(file_path, '/tmp/'), FALSE)
                     AND (file_url IS NULL OR file_url = '')
                     AS tmp_no_url
          FROM j),
        o AS (
          SELECT *,
                 CASE WHEN checkpoint_stage IS NULL THEN 'no_checkpoint'
                      WHEN NOT verify_ok THEN 'verify_failed'
                      WHEN NOT job_exists THEN 'job_not_found'
                      WHEN NOT doc_exists THEN 'doc_not_found'
                      WHEN tmp_no_url THEN 'temp_no_url'
                      WHEN fp IS NULL OR fp = '' THEN 'no_file_path'
                      ELSE 'ok' END AS outcome,
                 coalesce(starts_with(fp, 'http://')
                          OR starts_with(fp, 'https://'), FALSE)
                     AS is_url,
                 coalesce(contains(fp, '/'), FALSE) AS has_slash
          FROM r)
        SELECT job_id, outcome,
               CASE WHEN checkpoint_stage IS NOT NULL AND verify_ok
                         AND job_exists THEN checkpoint_stage END
                   AS restart_stage,
               CASE WHEN outcome = 'ok' THEN
                    CASE WHEN is_url THEN 'url' ELSE 'storage' END
               END AS source_kind,
               CASE WHEN outcome = 'ok' AND NOT is_url THEN
                    CASE WHEN has_slash THEN str_split(fp, '/')[1]
                         ELSE '{DEFAULT_BUCKET}' END END AS bucket,
               CASE WHEN outcome = 'ok' AND NOT is_url THEN
                    CASE WHEN has_slash THEN
                         array_to_string(str_split(fp, '/')[2:], '/')
                         ELSE fp END END AS storage_path,
               CASE WHEN outcome = 'ok' THEN fp END AS resolved_path,
               CASE WHEN outcome = 'ok' THEN
                    CASE WHEN has_model THEN discovery_model
                         ELSE '{DEFAULT_MODEL}' END END AS resume_model,
               CASE WHEN outcome = 'ok' THEN
                    CASE WHEN has_categories
                         THEN array_to_string(categories, ',')
                         ELSE 'products' END END AS resume_categories,
               CASE WHEN outcome = 'ok' THEN
                    coalesce(nullif(doc_workspace, ''),
                             '{DEFAULT_WORKSPACE}') END
                   AS resume_workspace,
               CAST(CASE WHEN outcome = 'ok' THEN
                    coalesce(prompt_enhancement, FALSE) END AS INT)
                   AS prompt_enhancement
        FROM o
    """


def list_page_sql() -> str:
    return f"""
        WITH reqs_in AS ({SYNTH_LIST_REQUESTS_SQL}),
        jobs_in AS ({SYNTH_LIST_JOBS_SQL}),
        req AS (
          SELECT request_id, status_filter, "limit", "offset",
                 len(str_split(sort, ':')) > 2 AS err,
                 CASE WHEN contains(sort, ':')
                      THEN str_split(sort, ':')[1]
                      ELSE 'created_at' END AS field,
                 CASE WHEN contains(sort, ':') THEN
                      CASE WHEN lower(str_split(sort, ':')[2]) = 'asc'
                           THEN 'asc' ELSE 'desc' END
                      ELSE 'desc' END AS direction
          FROM reqs_in),
        combos AS (
          SELECT DISTINCT f.status_filter, fd.field, fd.direction
          FROM (SELECT DISTINCT status_filter FROM reqs_in) f,
               (SELECT DISTINCT field, direction FROM req) fd),
        ranked AS (
          SELECT c.status_filter, c.field, c.direction, j.job_id,
                 CAST(row_number() OVER (
                     PARTITION BY c.status_filter, c.field, c.direction
                     ORDER BY CASE WHEN c.direction = 'asc'
                              THEN (CASE WHEN c.field = 'progress'
                                    THEN j.db_progress
                                    ELSE j.created_ord END) * 10000000
                                   + j.job_id
                              ELSE -((CASE WHEN c.field = 'progress'
                                      THEN j.db_progress
                                      ELSE j.created_ord END) * 10000000
                                     + j.job_id) END) AS INT) AS rk
          FROM combos c JOIN jobs_in j
            ON c.status_filter IS NULL
               OR c.status_filter = j.db_status)
        SELECT r.request_id, r.status_filter, r.field, r.direction,
               rk.rk, rk.job_id, 0 AS page_error
        FROM req r LEFT JOIN ranked rk
          ON rk.status_filter IS NOT DISTINCT FROM r.status_filter
         AND rk.field = r.field AND rk.direction = r.direction
         AND rk.rk > r."offset" AND rk.rk <= r."offset" + r."limit"
        WHERE NOT r.err
        UNION ALL
        SELECT request_id, status_filter, NULL, NULL, NULL, NULL, 1
        FROM req WHERE err
    """
