"""Admin prompt-management folds
(app/services/utilities/admin_prompt_service.py) as native Spark
projections — Supabase I/O and the live LLM test call are out of scope;
the deterministic list/resolve/history shaping is reproduced:

- prompt list (:25-83): is_active filter; each of stage/category/
  prompt_type is applied only when the param is TRUTHY and != 'all'
  (the 'all' sentinel AND the empty string both mean "no filter" —
  pin); row transform uses the falsy-``or`` ladder
  ``prompt_text or system_prompt or ''`` for prompt_template (a
  present-but-empty prompt_text falls through to system_prompt — pin),
  ``workspace_id or <param>`` and ``stage or 'general'`` (empty string
  falls back too), ``used_in or []``; but ``.get('is_custom', False)``
  and ``.get('version', 1)`` are ABSENT-key defaults, so a
  present-NULL is_custom stays NULL rather than folding to False
  (dead default — pin; the synth keeps NULL versions off active rows
  because the update path's ``version + 1`` would be a crash there,
  not a fold);
- update resolve (:101-193): the current row is looked up by
  (workspace, stage, category, is_active) WITHOUT constraining
  prompt_type — the fix for audit #217 H9, so a 'classification' row
  takes the update branch and keeps its real prompt_type; version
  resolves by ORDER BY version DESC LIMIT 1; update branch → version+1,
  is_custom=True, prompt_type preserved; no active row → insert branch
  with version=1 and prompt_type stamped 'extraction'; the audit entry's
  old_prompt reads the row's LEGACY ``prompt_template`` column while
  updates write ``prompt_text`` — the audit trail shows the legacy
  text, not the last written one (pin);
- history (:194-212): per-prompt change log, ORDER BY changed_at DESC
  LIMIT 5.

Scale: the list fold is map-side; update resolve is one broadcast-able
join of the (small) update batch against a max-version-per-key
aggregate of the prompts table; history top-5 is a bounded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PROMPT_TYPES = ("extraction", "classification", "agent", "template",
                "search")


def _no_filter(param):
    # `if p and p != 'all'` — falsy ('' / NULL) or the 'all' sentinel
    # both skip the filter
    return param.isNull() | (param == "") | (param == "all")


def list_prompts(prompts: DataFrame, combos: DataFrame,
                 workspace_param: str = "ws-param") -> DataFrame:
    """get_prompts (:25-83) for every filter combo in ``combos``
    (combo_id, f_stage, f_category, f_ptype)."""
    keep = (
        (_no_filter(F.col("f_stage")) | (F.col("stage") == F.col("f_stage")))
        & (_no_filter(F.col("f_category"))
           | (F.col("category") == F.col("f_category")))
        & (_no_filter(F.col("f_ptype"))
           | (F.col("prompt_type") == F.col("f_ptype"))))
    truthy = lambda c: c.isNotNull() & (c != "")
    template = (F.when(truthy(F.col("prompt_text")), F.col("prompt_text"))
                .when(truthy(F.col("system_prompt")), F.col("system_prompt"))
                .otherwise(F.lit("")))
    return (prompts.filter(F.col("is_active"))
            .crossJoin(F.broadcast(combos))
            .filter(keep)
            .select(
                "combo_id", F.col("id").alias("prompt_id"),
                F.when(truthy(F.col("workspace_id")), F.col("workspace_id"))
                .otherwise(F.lit(workspace_param)).alias("workspace_out"),
                F.when(truthy(F.col("stage")), F.col("stage"))
                .otherwise(F.lit("general")).alias("stage_out"),
                "category", "name", "prompt_type",
                template.alias("prompt_template"),
                "system_prompt",
                # ABSENT-key defaults: present-NULL passes through
                # (int-cast so the NULL survives the pandas round-trip
                # identically on both compare sides)
                F.col("is_custom").cast("int").alias("is_custom_out"),
                F.col("version").alias("version_out"),
                F.array_join(
                    F.coalesce(F.col("used_in"),
                               F.array().cast("array<string>")),
                    ",").alias("used_in_joined")))


def resolve_updates(prompts: DataFrame, updates: DataFrame) -> DataFrame:
    """update_prompt (:101-193): branch + audit resolution per update
    request. The lookup is type-agnostic and sees only active rows."""
    w = Window.partitionBy("workspace_id", "stage", "category").orderBy(
        F.col("version").desc(), F.col("id").desc())
    current = (prompts.filter(F.col("is_active"))
               .withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1)
               .select(F.col("workspace_id").alias("c_ws"),
                       F.col("stage").alias("c_stage"),
                       F.col("category").alias("c_category"),
                       F.col("id").alias("c_id"),
                       F.col("version").alias("c_version"),
                       F.col("prompt_type").alias("c_ptype"),
                       F.col("prompt_template").alias("c_legacy_template")))
    j = updates.join(
        current,
        (F.col("u_ws") == F.col("c_ws")) & (F.col("u_stage") == F.col("c_stage"))
        & (F.col("u_category") == F.col("c_category")), "left")
    found = F.col("c_id").isNotNull()
    return j.select(
        "update_id",
        F.when(found, F.lit("update")).otherwise(F.lit("insert"))
        .alias("branch"),
        F.col("c_id").alias("target_id"),
        F.when(found, F.col("c_version") + 1).otherwise(F.lit(1))
        .cast("long").alias("new_version"),
        F.when(found, F.col("c_ptype")).otherwise(F.lit("extraction"))
        .alias("prompt_type_out"),
        F.lit(True).alias("is_custom_out"),
        # audit rows only exist on the update branch; old text is the
        # LEGACY prompt_template column (pin), new text is the param
        F.when(found, F.col("c_legacy_template")).alias("audit_old_prompt"),
        F.when(found, F.col("new_template")).alias("audit_new_prompt"))


def history_top5(history: DataFrame) -> DataFrame:
    """get_prompt_history (:194-212): latest 5 changes per prompt."""
    w = Window.partitionBy("prompt_id").orderBy(F.col("changed_at").desc())
    return (history.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("prompt_id", "changed_at", "new_prompt_text",
                    "changed_by", F.col("rn").cast("int").alias("rn")))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

_N_KEYS = 35  # (ws, stage, category) key space; version unique per key


def synth_prompts(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    ptype = F.lit(PROMPT_TYPES[0])
    for i, p in enumerate(PROMPT_TYPES[1:], 1):
        ptype = F.when(e % 5 == i, F.lit(p)).otherwise(ptype)
    used = (F.when(e % 6 == 0, F.lit(None).cast("array<string>"))
            .when(e % 6 == 1, F.array().cast("array<string>"))
            .otherwise(F.array(F.concat(F.lit("svc-"), e % 3),
                               F.concat(F.lit("svc-"), e % 2))))
    return events.filter(e < 300).select(
        e.alias("id"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("ws-"), e % 7)).alias("workspace_id"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .when(e % 9 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("stage-"), e % 5)).alias("stage"),
        F.concat(F.lit("cat-"), e % 4).alias("category"),
        F.concat(F.lit("name-"), e % 11).alias("name"),
        ptype.alias("prompt_type"),
        F.when(e % 8 == 0, F.lit(None).cast("string"))
        .when(e % 8 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("pt-"), e)).alias("prompt_text"),
        F.when((e * 3) % 5 == 0, F.lit(None).cast("string"))
        .when((e * 3) % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("sp-"), e)).alias("system_prompt"),
        F.when((e * 7) % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("legacy-"), e)).alias("prompt_template"),
        F.when(e % 10 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("is_custom"),
        # version is NULL only on INACTIVE rows: the reference's update
        # lookup does current['version'] + 1 on the max-version ACTIVE
        # row, which would be a crash (not a fold) on NULL
        F.when((e * 11) % 4 == 0, F.lit(None).cast("long"))
        .otherwise((F.lit(1) + F.floor(e / _N_KEYS)).cast("long"))
        .alias("version"),
        used.alias("used_in"),
        ((e * 11) % 4 != 0).alias("is_active"))


SYNTH_PROMPTS_SQL = f"""
    SELECT event_id AS id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN ''
                ELSE 'ws-' || CAST(event_id % 7 AS VARCHAR) END
               AS workspace_id,
           CASE WHEN event_id % 9 = 0 THEN NULL
                WHEN event_id % 9 = 1 THEN ''
                ELSE 'stage-' || CAST(event_id % 5 AS VARCHAR) END
               AS stage,
           'cat-' || CAST(event_id % 4 AS VARCHAR) AS category,
           'name-' || CAST(event_id % 11 AS VARCHAR) AS name,
           CASE event_id % 5 WHEN 1 THEN 'classification'
                WHEN 2 THEN 'agent' WHEN 3 THEN 'template'
                WHEN 4 THEN 'search' ELSE 'extraction' END
               AS prompt_type,
           CASE WHEN event_id % 8 = 0 THEN NULL
                WHEN event_id % 8 = 1 THEN ''
                ELSE 'pt-' || CAST(event_id AS VARCHAR) END
               AS prompt_text,
           CASE WHEN (event_id * 3) % 5 = 0 THEN NULL
                WHEN (event_id * 3) % 5 = 1 THEN ''
                ELSE 'sp-' || CAST(event_id AS VARCHAR) END
               AS system_prompt,
           CASE WHEN (event_id * 7) % 6 = 0 THEN NULL
                ELSE 'legacy-' || CAST(event_id AS VARCHAR) END
               AS prompt_template,
           CASE WHEN event_id % 10 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS is_custom,
           CASE WHEN (event_id * 11) % 4 = 0 THEN NULL
                ELSE CAST(1 + event_id // {_N_KEYS} AS BIGINT) END
               AS version,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN []
                ELSE ['svc-' || CAST(event_id % 3 AS VARCHAR),
                      'svc-' || CAST(event_id % 2 AS VARCHAR)] END
               AS used_in,
           (event_id * 11) % 4 <> 0 AS is_active
    FROM events WHERE event_id < 300
"""

# filter combos: NULL / '' / 'all' all mean "no filter" (pin rows 0/1/5)
FILTER_COMBOS = (
    (0, None, None, None),
    (1, "all", "all", "all"),
    (2, "stage-1", None, None),
    (3, "all", "cat-2", None),
    (4, None, None, "classification"),
    (5, "", "cat-1", ""),
)


def synth_combos(spark) -> DataFrame:
    return spark.createDataFrame(
        list(FILTER_COMBOS),
        "combo_id int, f_stage string, f_category string, f_ptype string")


SYNTH_COMBOS_SQL = "SELECT * FROM (VALUES " + ", ".join(
    "({}, {}, {}, {})".format(
        c[0], *("NULL" if v is None else f"'{v}'" for v in c[1:]))
    for c in FILTER_COMBOS) + ") AS t(combo_id, f_stage, f_category, f_ptype)"


def synth_updates(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e < 80).select(
        e.alias("update_id"),
        F.concat(F.lit("ws-"), e % 9).alias("u_ws"),
        F.concat(F.lit("stage-"), e % 6).alias("u_stage"),
        F.concat(F.lit("cat-"), e % 4).alias("u_category"),
        F.concat(F.lit("new-"), e).alias("new_template"),
        F.when(e % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("nsp-"), e)).alias("new_system"),
        F.concat(F.lit("user-"), e % 3).alias("changed_by"))


SYNTH_UPDATES_SQL = """
    SELECT event_id AS update_id,
           'ws-' || CAST(event_id % 9 AS VARCHAR) AS u_ws,
           'stage-' || CAST(event_id % 6 AS VARCHAR) AS u_stage,
           'cat-' || CAST(event_id % 4 AS VARCHAR) AS u_category,
           'new-' || CAST(event_id AS VARCHAR) AS new_template,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE 'nsp-' || CAST(event_id AS VARCHAR) END AS new_system,
           'user-' || CAST(event_id % 3 AS VARCHAR) AS changed_by
    FROM events WHERE event_id < 80
"""


def synth_history(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e < 500).select(
        e.alias("change_id"),
        (e % 40).cast("long").alias("prompt_id"),
        # epoch seconds (BIGINT) rather than a timestamp column: the
        # ordering semantics are identical and the contract compare is
        # timezone-proof
        (F.lit(1700000000) + e * 37).cast("long").alias("changed_at"),
        F.concat(F.lit("old-"), e).alias("old_prompt_text"),
        F.concat(F.lit("new-"), e).alias("new_prompt_text"),
        F.concat(F.lit("user-"), e % 5).alias("changed_by"))


SYNTH_HISTORY_SQL = """
    SELECT event_id AS change_id,
           CAST(event_id % 40 AS BIGINT) AS prompt_id,
           CAST(1700000000 + event_id * 37 AS BIGINT) AS changed_at,
           'old-' || CAST(event_id AS VARCHAR) AS old_prompt_text,
           'new-' || CAST(event_id AS VARCHAR) AS new_prompt_text,
           'user-' || CAST(event_id % 5 AS VARCHAR) AS changed_by
    FROM events WHERE event_id < 500
"""


def list_prompts_sql(workspace_param: str = "ws-param") -> str:
    nf = lambda c: f"({c} IS NULL OR {c} = '' OR {c} = 'all')"
    truthy = lambda c: f"({c} IS NOT NULL AND {c} <> '')"
    return f"""
        WITH p AS ({SYNTH_PROMPTS_SQL}), c AS ({SYNTH_COMBOS_SQL})
        SELECT combo_id, id AS prompt_id,
               CASE WHEN {truthy('workspace_id')} THEN workspace_id
                    ELSE '{workspace_param}' END AS workspace_out,
               CASE WHEN {truthy('stage')} THEN stage
                    ELSE 'general' END AS stage_out,
               category, name, prompt_type,
               CASE WHEN {truthy('prompt_text')} THEN prompt_text
                    WHEN {truthy('system_prompt')} THEN system_prompt
                    ELSE '' END AS prompt_template,
               system_prompt,
               CAST(is_custom AS INT) AS is_custom_out,
               version AS version_out,
               coalesce(list_aggr(coalesce(used_in, []),
                                  'string_agg', ','), '')
                   AS used_in_joined
        FROM p CROSS JOIN c
        WHERE is_active
          AND ({nf('f_stage')} OR stage = f_stage)
          AND ({nf('f_category')} OR category = f_category)
          AND ({nf('f_ptype')} OR prompt_type = f_ptype)
    """


def resolve_updates_sql() -> str:
    return f"""
        WITH p AS ({SYNTH_PROMPTS_SQL}), u AS ({SYNTH_UPDATES_SQL}),
        cur AS (
          SELECT workspace_id, stage, category, id, version,
                 prompt_type, prompt_template,
                 row_number() OVER (
                   PARTITION BY workspace_id, stage, category
                   ORDER BY version DESC, id DESC) AS rn
          FROM p WHERE is_active)
        SELECT u.update_id,
               CASE WHEN c.id IS NOT NULL THEN 'update'
                    ELSE 'insert' END AS branch,
               c.id AS target_id,
               CAST(CASE WHEN c.id IS NOT NULL THEN c.version + 1
                         ELSE 1 END AS BIGINT) AS new_version,
               CASE WHEN c.id IS NOT NULL THEN c.prompt_type
                    ELSE 'extraction' END AS prompt_type_out,
               TRUE AS is_custom_out,
               CASE WHEN c.id IS NOT NULL THEN c.prompt_template END
                   AS audit_old_prompt,
               CASE WHEN c.id IS NOT NULL THEN u.new_template END
                   AS audit_new_prompt
        FROM u LEFT JOIN (SELECT * FROM cur WHERE rn = 1) c
          ON u.u_ws = c.workspace_id AND u.u_stage = c.stage
         AND u.u_category = c.category
    """


def history_top5_sql() -> str:
    return f"""
        WITH h AS ({SYNTH_HISTORY_SQL}),
        r AS (SELECT prompt_id, changed_at, new_prompt_text, changed_by,
                     CAST(row_number() OVER (
                       PARTITION BY prompt_id
                       ORDER BY changed_at DESC) AS INT) AS rn
              FROM h)
        SELECT * FROM r WHERE rn <= 5
    """
