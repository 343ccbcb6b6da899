"""Project-workspace route folds: list filtering, task nesting rollups,
subtask room inheritance, and the collaborator-invite credit ladder.

Re-expresses the deterministic data-shaping of the reference's public
Projects API (``app/api/project_tracking_routes.py``) as whole-corpus
DataFrame plans:

- ``project_list_filter``  — project_tracking_routes.py:272-290
  (``list_projects``: the DB ``limit`` is applied BEFORE the
  ``include_archived`` post-filter, and the flag also hides COMPLETED
  projects — both pinned)
- ``project_task_rollup``  — project_tracking_routes.py:415-453
  (``list_tasks``: flat rows → parents with nested-subtask counts;
  a subtask whose parent row is missing from the project's result set
  is silently DROPPED — pinned)
- ``task_room_inherit``    — project_tracking_routes.py:455-496
  (``create_task``: a subtask inherits the PARENT's room_id, overriding
  the caller's explicit room_id even when the parent's room is NULL —
  pinned; a parent outside the project is a 400)
- ``invite_outcome``       — project_tracking_routes.py:560-640
  (``invite_collaborator``: 403 no-user → email normalize (strip+lower,
  '@' presence only) 400 → case-insensitive active-dup 409 BEFORE the
  debit → 402 failed debit → 500 insert-fail refunds → email-send
  failure is NON-blocking: row kept, credit kept — pinned)

The reference runs these per project against Postgres; here each is one
plan over a synthetic request corpus keyed by row_id, so every gate is a
when-chain evaluated map-side (the only shuffles are the per-user /
per-project window and groupBy aggregates, all on low-cardinality keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LIST_LIMIT = 8  # synthetic stand-in for the route's `limit` query param

_STATUSES = ("planning", "in_progress", "on_hold", "completed", "archived")


# ---------------------------------------------------------------------------
# list_projects: limit-then-filter (project_tracking_routes.py:272-290)
# ---------------------------------------------------------------------------

def project_list_filter(projects: DataFrame) -> DataFrame:
    """Per-user list rollup pinning two behaviors of ``list_projects``:

    1. the DB ``limit`` applies to the RAW ordered scan (newest
       ``last_activity_at`` first), and the ``include_archived`` filter
       runs afterwards in Python — so hidden statuses consume limit
       slots and eligible projects beyond the limit are lost;
    2. ``include_archived=False`` hides BOTH 'archived' AND 'completed'
       (despite the flag's name).

    Output per user: ``fetched_count`` (rows the DB returned),
    ``visible_count`` (rows after the post-filter), and
    ``lost_to_limit`` (eligible rows that an eligible-only ranking would
    have shown within the same limit but the limit-then-filter lost).
    """
    w_all = (Window.partitionBy("user_id")
             .orderBy(F.col("activity_rank").desc(), F.col("project_id")))
    ranked = projects.withColumn("rn_all", F.row_number().over(w_all))

    eligible = (F.col("include_archived")
                | ~F.col("status").isin("archived", "completed"))
    w_elig = (Window.partitionBy("user_id", "is_eligible")
              .orderBy(F.col("activity_rank").desc(), F.col("project_id")))
    ranked = (ranked.withColumn("is_eligible", eligible)
              .withColumn("rn_elig", F.row_number().over(w_elig)))

    fetched = F.col("rn_all") <= LIST_LIMIT
    visible = fetched & F.col("is_eligible")
    lost = (~F.col("include_archived") & F.col("is_eligible")
            & (F.col("rn_elig") <= LIST_LIMIT) & ~fetched)
    return (ranked.groupBy("user_id")
            .agg(F.sum(fetched.cast("int")).cast("int")
                 .alias("fetched_count"),
                 F.sum(visible.cast("int")).cast("int")
                 .alias("visible_count"),
                 F.sum(lost.cast("int")).cast("int")
                 .alias("lost_to_limit")))


def synth_projects(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    status = (F.when(e % 5 == 0, _STATUSES[0])
              .when(e % 5 == 1, _STATUSES[1])
              .when(e % 5 == 2, _STATUSES[2])
              .when(e % 5 == 3, _STATUSES[3])
              .otherwise(_STATUSES[4]))
    return events.select(
        e.cast("long").alias("project_id"),
        (e % 7).cast("long").alias("user_id"),
        status.alias("status"),
        ((e * 37) % 1000).cast("long").alias("activity_rank"),
        (e % 14 < 7).alias("include_archived"))


SYNTH_PROJECTS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS project_id,
           CAST(event_id % 7 AS BIGINT) AS user_id,
           CASE WHEN event_id % 5 = 0 THEN 'planning'
                WHEN event_id % 5 = 1 THEN 'in_progress'
                WHEN event_id % 5 = 2 THEN 'on_hold'
                WHEN event_id % 5 = 3 THEN 'completed'
                ELSE 'archived' END AS status,
           CAST((event_id * 37) % 1000 AS BIGINT) AS activity_rank,
           event_id % 14 < 7 AS include_archived
    FROM events
"""


def list_filter_sql() -> str:
    return f"""
        WITH p AS ({SYNTH_PROJECTS_SQL}),
        r AS (
          SELECT *,
                 row_number() OVER (
                     PARTITION BY user_id
                     ORDER BY activity_rank DESC, project_id) AS rn_all,
                 (include_archived
                  OR status NOT IN ('archived', 'completed'))
                     AS is_eligible
          FROM p),
        r2 AS (
          SELECT *,
                 row_number() OVER (
                     PARTITION BY user_id, is_eligible
                     ORDER BY activity_rank DESC, project_id) AS rn_elig
          FROM r)
        SELECT user_id,
               CAST(sum(CASE WHEN rn_all <= {LIST_LIMIT}
                        THEN 1 ELSE 0 END) AS INT) AS fetched_count,
               CAST(sum(CASE WHEN rn_all <= {LIST_LIMIT} AND is_eligible
                        THEN 1 ELSE 0 END) AS INT) AS visible_count,
               CAST(sum(CASE WHEN NOT include_archived AND is_eligible
                             AND rn_elig <= {LIST_LIMIT}
                             AND rn_all > {LIST_LIMIT}
                        THEN 1 ELSE 0 END) AS INT) AS lost_to_limit
        FROM r2
        GROUP BY user_id
    """


# ---------------------------------------------------------------------------
# list_tasks: nesting rollup (project_tracking_routes.py:415-453)
# ---------------------------------------------------------------------------

def project_task_rollup(tasks: DataFrame) -> DataFrame:
    """Parents with nested-subtask counts, ordered ``sort_order`` then
    ``created_at``. A subtask whose parent row is NOT in the same
    project's result set (cascade-deleted parent, cross-project ref) is
    silently dropped — it is neither a parent nor reachable from one
    (pin). Emits ``out_pos`` (1-based position within the project) so
    the route's ordering is part of the contract.
    """
    parents = tasks.filter(F.col("parent_task_id").isNull())
    subs = (tasks.filter(F.col("parent_task_id").isNotNull())
            .groupBy(F.col("project_id").alias("s_project_id"),
                     F.col("parent_task_id"))
            .agg(F.count(F.lit(1)).cast("int").alias("sub_total"),
                 F.sum((F.col("status") == "done").cast("int"))
                 .cast("int").alias("sub_done")))
    subs = subs.withColumnRenamed("parent_task_id", "s_parent_id")
    w = (Window.partitionBy("project_id")
         .orderBy("sort_order", "created_at", "task_id"))
    return (parents.withColumn("out_pos", F.row_number().over(w))
            .join(subs,
                  (F.col("project_id") == F.col("s_project_id"))
                  & (F.col("task_id") == F.col("s_parent_id")),
                  "left")
            .select("project_id", "task_id", "out_pos",
                    F.coalesce("sub_total", F.lit(0)).cast("int")
                    .alias("sub_total"),
                    F.coalesce("sub_done", F.lit(0)).cast("int")
                    .alias("sub_done")))


def synth_tasks(events: DataFrame) -> DataFrame:
    # a third of rows are subtasks pointing at event_id - 1 (never itself
    # a subtask); the parent's project (e-1) % 4 usually differs from the
    # sub's (e % 4) — those subs orphan-drop, pinning the reference's
    # silent cross-project / deleted-parent drop
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("task_id"),
        (e % 4).cast("long").alias("project_id"),
        F.when(e % 3 == 0, (e - 1).cast("long"))
        .otherwise(F.lit(None).cast("long")).alias("parent_task_id"),
        F.when(e % 5 == 0, "done")
        .when(e % 5 == 1, "in_progress")
        .when(e % 5 == 2, "blocked")
        .otherwise("todo").alias("status"),
        (e % 6).cast("long").alias("sort_order"),
        e.cast("long").alias("created_at"))


SYNTH_TASKS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS task_id,
           CAST(event_id % 4 AS BIGINT) AS project_id,
           CASE WHEN event_id % 3 = 0
                THEN CAST(event_id - 1 AS BIGINT) END AS parent_task_id,
           CASE WHEN event_id % 5 = 0 THEN 'done'
                WHEN event_id % 5 = 1 THEN 'in_progress'
                WHEN event_id % 5 = 2 THEN 'blocked'
                ELSE 'todo' END AS status,
           CAST(event_id % 6 AS BIGINT) AS sort_order,
           CAST(event_id AS BIGINT) AS created_at
    FROM events
"""


def task_rollup_sql() -> str:
    return f"""
        WITH t AS ({SYNTH_TASKS_SQL}),
        subs AS (
          SELECT project_id AS s_project_id, parent_task_id,
                 CAST(count(*) AS INT) AS sub_total,
                 CAST(sum(CASE WHEN status = 'done' THEN 1 ELSE 0 END)
                      AS INT) AS sub_done
          FROM t WHERE parent_task_id IS NOT NULL
          GROUP BY project_id, parent_task_id),
        parents AS (
          SELECT *,
                 row_number() OVER (
                     PARTITION BY project_id
                     ORDER BY sort_order, created_at, task_id) AS out_pos
          FROM t WHERE parent_task_id IS NULL)
        SELECT p.project_id, p.task_id, p.out_pos,
               CAST(coalesce(s.sub_total, 0) AS INT) AS sub_total,
               CAST(coalesce(s.sub_done, 0) AS INT) AS sub_done
        FROM parents p
        LEFT JOIN subs s
          ON s.s_project_id = p.project_id
         AND s.parent_task_id = p.task_id
    """


# ---------------------------------------------------------------------------
# create_task: room inheritance (project_tracking_routes.py:455-496)
# ---------------------------------------------------------------------------

def task_room_inherit(reqs: DataFrame) -> DataFrame:
    """Subtask creation: a missing parent or a parent in another project
    is a 400; otherwise the subtask's room is the PARENT's room — the
    caller's explicit ``room_id`` is overridden unconditionally, even
    when the parent's room is NULL (pin: ``room_id =
    pr.data.get("room_id")`` replaces, never coalesces)."""
    bad_parent = (F.col("has_parent")
                  & (~F.col("parent_exists") | ~F.col("parent_in_project")))
    return reqs.select(
        "req_id",
        F.when(bad_parent, 400).otherwise(201).cast("int").alias("status"),
        F.when(bad_parent, F.lit(None).cast("string"))
        .when(F.col("has_parent"), F.col("parent_room_id"))
        .otherwise(F.col("req_room_id")).alias("effective_room_id"))


def synth_task_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        (e % 2 == 0).alias("has_parent"),
        (e % 5 != 0).alias("parent_exists"),
        (e % 7 != 0).alias("parent_in_project"),
        F.when(e % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("room-"), (e % 4).cast("string")))
        .alias("parent_room_id"),
        F.when(e % 4 == 1, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("req-room-"), (e % 5).cast("string")))
        .alias("req_room_id"))


SYNTH_TASK_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           event_id % 2 = 0 AS has_parent,
           event_id % 5 <> 0 AS parent_exists,
           event_id % 7 <> 0 AS parent_in_project,
           CASE WHEN event_id % 3 <> 0
                THEN 'room-' || CAST(event_id % 4 AS VARCHAR)
           END AS parent_room_id,
           CASE WHEN event_id % 4 <> 1
                THEN 'req-room-' || CAST(event_id % 5 AS VARCHAR)
           END AS req_room_id
    FROM events
"""


def room_inherit_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_TASK_REQS_SQL}),
        g AS (
          SELECT *, has_parent
                    AND (NOT parent_exists OR NOT parent_in_project)
                        AS bad_parent
          FROM r)
        SELECT req_id,
               CAST(CASE WHEN bad_parent THEN 400 ELSE 201 END AS INT)
                   AS status,
               CASE WHEN bad_parent THEN NULL
                    WHEN has_parent THEN parent_room_id
                    ELSE req_room_id END AS effective_room_id
        FROM g
    """


# ---------------------------------------------------------------------------
# invite_collaborator: credit ladder (project_tracking_routes.py:560-640)
# ---------------------------------------------------------------------------

def invite_outcome(reqs: DataFrame) -> DataFrame:
    """Invite ladder, in route order: 403 when the key has no user (no
    debit); email normalized ``strip().lower()`` and gated only on '@'
    presence → 400; the case-insensitive active-duplicate check (ilike +
    ``revoked_at IS NULL``) runs BEFORE the debit → 409 with nothing to
    refund; a failed debit is a 402; an insert failure refunds → 500;
    an email-SEND failure is non-blocking — the row and the credit both
    survive (pin)."""
    norm = F.lower(F.trim(F.col("raw_email")))
    has_at = norm.contains("@")
    no_user = ~F.col("has_user")
    bad_email = F.col("has_user") & ~has_at
    dup = F.col("has_user") & has_at & F.col("dup_active")
    debit_fail = (F.col("has_user") & has_at & ~F.col("dup_active")
                  & ~F.col("debit_ok"))
    insert_fail = (F.col("has_user") & has_at & ~F.col("dup_active")
                   & F.col("debit_ok") & ~F.col("insert_ok"))
    success = (F.col("has_user") & has_at & ~F.col("dup_active")
               & F.col("debit_ok") & F.col("insert_ok"))
    return reqs.select(
        "req_id",
        F.when(no_user, F.lit(None).cast("string"))
        .otherwise(norm).alias("norm_email"),
        F.when(no_user, 403).when(bad_email, 400).when(dup, 409)
        .when(debit_fail, 402).when(insert_fail, 500)
        .otherwise(200).cast("int").alias("status"),
        insert_fail.alias("refunded"),
        success.alias("credit_kept"))


def synth_invites(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    x = (e % 9).cast("string")
    raw = (F.when(e % 5 == 0, F.concat(F.lit("  User"), x,
                                       F.lit("@Example.COM ")))
           .when(e % 5 == 1, F.concat(F.lit("plainaddr"), x))
           .when(e % 5 == 2, F.concat(F.lit("a"), x, F.lit("@b.gr")))
           .when(e % 5 == 3, F.concat(F.lit(" MIXED"), x,
                                      F.lit("@Case.Com")))
           .otherwise(F.concat(F.lit("x"), x, F.lit("@y.z  "))))
    return events.select(
        e.cast("long").alias("req_id"),
        raw.alias("raw_email"),
        (e % 11 != 0).alias("has_user"),
        (e % 6 == 0).alias("dup_active"),
        (e % 9 != 0).alias("debit_ok"),
        (e % 13 != 0).alias("insert_ok"))


SYNTH_INVITES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CASE WHEN event_id % 5 = 0
                THEN '  User' || CAST(event_id % 9 AS VARCHAR)
                     || '@Example.COM '
                WHEN event_id % 5 = 1
                THEN 'plainaddr' || CAST(event_id % 9 AS VARCHAR)
                WHEN event_id % 5 = 2
                THEN 'a' || CAST(event_id % 9 AS VARCHAR) || '@b.gr'
                WHEN event_id % 5 = 3
                THEN ' MIXED' || CAST(event_id % 9 AS VARCHAR)
                     || '@Case.Com'
                ELSE 'x' || CAST(event_id % 9 AS VARCHAR) || '@y.z  '
           END AS raw_email,
           event_id % 11 <> 0 AS has_user,
           event_id % 6 = 0 AS dup_active,
           event_id % 9 <> 0 AS debit_ok,
           event_id % 13 <> 0 AS insert_ok
    FROM events
"""


def invite_outcome_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_INVITES_SQL}),
        g AS (
          SELECT *,
                 lower(trim(raw_email)) AS norm,
                 position('@' IN lower(trim(raw_email))) > 0 AS has_at
          FROM r),
        h AS (
          SELECT *,
                 NOT has_user AS no_user,
                 has_user AND NOT has_at AS bad_email,
                 has_user AND has_at AND dup_active AS dup,
                 has_user AND has_at AND NOT dup_active
                     AND NOT debit_ok AS debit_fail,
                 has_user AND has_at AND NOT dup_active AND debit_ok
                     AND NOT insert_ok AS insert_fail,
                 has_user AND has_at AND NOT dup_active AND debit_ok
                     AND insert_ok AS success
          FROM g)
        SELECT req_id,
               CASE WHEN no_user THEN NULL ELSE norm END AS norm_email,
               CAST(CASE WHEN no_user THEN 403
                    WHEN bad_email THEN 400
                    WHEN dup THEN 409
                    WHEN debit_fail THEN 402
                    WHEN insert_fail THEN 500
                    ELSE 200 END AS INT) AS status,
               insert_fail AS refunded,
               success AS credit_kept
        FROM h
    """
