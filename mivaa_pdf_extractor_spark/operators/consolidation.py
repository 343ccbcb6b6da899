"""Stage-4 metadata consolidation: 3-source priority merge with
confidence tracking and the color special-cases.

Re-expresses ``MetadataConsolidationService.consolidate_metadata``
(app/services/metadata/metadata_consolidation_service.py:28-151) as a
relational plan over three per-field row sets (factory defaults, visual
metadata, AI text extraction) instead of three Python dicts:

- factory (lowest): any non-None value lands at confidence 0.5;
- visual (middle): only entries shaped ``{primary: ..., ...}`` count;
  confidence defaults to 0.8; a non-color key overrides iff its
  confidence >= the existing field's confidence (factory = 0.5, absent
  = 0.0 — so an exactly-0.5 visual value WINS over factory, pinned);
  the ``color`` key never writes ``color``: it becomes
  ``visual_color_detected`` — but only when factory did NOT supply a
  ``colors`` field (:76-89, pinned);
- AI (highest): any non-None, non-empty-string value always wins at
  0.95; ``color``/``colors`` normalize into the ``colors`` field
  (value_kind = 'list'); and when the AI writes colors while the visual
  dict has a ``color`` entry, ``visual_color_detected`` is (re)written
  from the visual data **without the non-None guard** — a visual color
  whose ``primary`` is present-but-None yields a NULL
  visual_color_detected row in exactly that case (:117-126, pinned).

Faithful-to-code quirks carried: factory ``color`` stays a verbatim
``color`` field (only visual/AI get the special-casing), so an output
can hold BOTH ``color`` (factory) and ``colors`` (AI); a visual
``colors`` key routes through the GENERIC branch (only ``color`` is
special, :79).

Synthesis constraint (documented, not a semantics change): at most one
of ``color``/``colors`` per AI dict — with both, the reference's
last-dict-iteration-order write wins, which is insertion-order
dependent and not reconstructible relationally.

Scale notes: three narrow unions → one row_number window on
(product_id, field) → one anti-joinable broadcast-sized flag join for
the vcd rows. One shuffle on the (product_id, field) key; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

CONF_FACTORY = 0.5   # metadata_consolidation_service.py:61
CONF_VISUAL_DEFAULT = 0.8  # :73
CONF_AI = 0.95       # :113


def consolidate_metadata(factory: DataFrame, visual: DataFrame,
                         ai: DataFrame) -> DataFrame:
    """factory: (product_id, key, value); visual: (product_id, key,
    has_primary, primary, confidence, secondary array<string>); ai:
    (product_id, key, value) → consolidated field rows (product_id,
    field, value, value_kind, source, confidence, secondary_csv)."""
    fac = (factory.filter(F.col("value").isNotNull())
           .select("product_id", F.col("key").alias("field"),
                   "value",
                   F.lit("str").alias("value_kind"),
                   F.lit("factory_default").alias("source"),
                   F.lit(CONF_FACTORY).alias("confidence"),
                   F.lit(None).cast("string").alias("secondary_csv"),
                   F.lit(1).alias("priority")))

    vis_ok = (visual.filter(F.col("has_primary"))
              .withColumn("conf_eff",
                          F.coalesce(F.col("confidence"),
                                     F.lit(CONF_VISUAL_DEFAULT))))
    vis_gen = (vis_ok.filter((F.col("key") != "color")
                             & F.col("primary").isNotNull())
               .select("product_id", F.col("key").alias("field"),
                       F.col("primary").alias("value"),
                       F.lit("str").alias("value_kind"),
                       F.lit("visual_embedding").alias("source"),
                       F.col("conf_eff").alias("confidence"),
                       F.array_join("secondary", "|").alias("secondary_csv"),
                       # >= existing: beats factory (0.5) iff conf >= 0.5;
                       # always beats "absent" (0.0)
                       F.when(F.col("conf_eff") >= CONF_FACTORY, 2)
                        .otherwise(0).alias("priority")))

    ai_ok = ai.filter(F.col("value").isNotNull() & (F.col("value") != ""))
    ai_gen = (ai_ok.filter(~F.col("key").isin("color", "colors"))
              .select("product_id", F.col("key").alias("field"),
                      "value", F.lit("str").alias("value_kind")))
    ai_colors = (ai_ok.filter(F.col("key").isin("color", "colors"))
                 .select("product_id", F.lit("colors").alias("field"),
                         "value", F.lit("list").alias("value_kind")))
    ai_all = (ai_gen.unionByName(ai_colors)
              .select("product_id", "field", "value", "value_kind",
                      F.lit("ai_text_extraction").alias("source"),
                      F.lit(CONF_AI).alias("confidence"),
                      F.lit(None).cast("string").alias("secondary_csv"),
                      F.lit(3).alias("priority")))

    # priority 0 = a visual row that can NEVER win over a present factory
    # row but must still win when the field exists nowhere else. Model:
    # demote below factory, keep above "absent" by keeping the row.
    pool = fac.unionByName(vis_gen).unionByName(ai_all)
    w = Window.partitionBy("product_id", "field").orderBy(
        F.desc("priority"), F.asc("source"))
    fields = (pool.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .drop("rn", "priority"))

    # visual_color_detected (:76-89 visual stage, :117-126 AI stage)
    vcolor = vis_ok.filter(F.col("key") == "color").select(
        "product_id", F.col("primary"), F.col("conf_eff"),
        F.array_join("secondary", "|").alias("secondary_csv"))
    fac_colors = (factory.filter((F.col("key") == "colors")
                                 & F.col("value").isNotNull())
                  .select("product_id").distinct()
                  .withColumn("fac_colors", F.lit(True)))
    ai_colors_flag = (ai_colors.select("product_id").distinct()
                      .withColumn("ai_colors", F.lit(True)))
    vcd = (vcolor
           .join(fac_colors, "product_id", "left")
           .join(ai_colors_flag, "product_id", "left")
           .withColumn("x_ok",  # visual stage: non-None primary, no
                       # factory colors field
                       F.col("primary").isNotNull()
                       & F.col("fac_colors").isNull())
           .withColumn("y_ok", F.col("ai_colors").isNotNull())
           .filter(F.col("x_ok") | F.col("y_ok"))
           .select("product_id",
                   F.lit("visual_color_detected").alias("field"),
                   # the AI-stage write has no non-None guard (:121)
                   F.col("primary").alias("value"),
                   F.lit("str").alias("value_kind"),
                   F.lit("visual_embedding").alias("source"),
                   F.col("conf_eff").alias("confidence"),
                   F.col("secondary_csv")))
    return fields.unionByName(vcd)


# ---------------------------------------------------------------------
# Deterministic synthesis (Spark + DuckDB twins). pid = user_id % 60.

def synth_consolidation_inputs(spark: SparkSession, events: DataFrame):
    # persist the 60-row pid base: every union branch of the three
    # synth tables references it — unpersisted, each branch re-ran the
    # full events scan + distinct (~20 scans per query)
    from ..core.cache import track
    pids = track(events.select((F.col("user_id") % 60).alias("pid"))
                 .distinct())
    p = F.col("pid")
    ps = p.cast("string")

    fac = (
        pids.select(p.alias("product_id"), F.lit("origin").alias("key"),
                    F.concat(F.lit("f_org_"), ps).alias("value"))
        .unionByName(pids.filter(p % 2 == 0).select(
            p.alias("product_id"), F.lit("material").alias("key"),
            F.when(p % 7 == 0, None).otherwise(
                F.concat(F.lit("f_mat_"), ps)).alias("value")))
        .unionByName(pids.filter(p % 3 == 0).select(
            p.alias("product_id"), F.lit("colors").alias("key"),
            F.concat(F.lit("f_cols_"), ps).alias("value")))
        .unionByName(pids.filter(p % 5 == 0).select(
            p.alias("product_id"), F.lit("color").alias("key"),
            F.concat(F.lit("f_col_"), ps).alias("value"))))

    conf3 = (F.when(p % 3 == 0, 0.3).when(p % 3 == 1, 0.5)
              .otherwise(0.9))
    sec2 = F.when(p % 2 == 0,
                  F.array(F.concat(F.lit("s1_"), ps), F.lit("s2"))) \
            .otherwise(F.array().cast("array<string>"))
    vis = (
        pids.filter(p % 4 != 1).select(
            p.alias("product_id"), F.lit("color").alias("key"),
            (p % 4 != 3).alias("has_primary"),
            F.when(p % 7 == 1, None).otherwise(
                F.concat(F.lit("v_col_"), ps)).alias("primary"),
            F.when(p % 6 == 0, None).otherwise(conf3)
             .cast("double").alias("confidence"),
            sec2.alias("secondary"))
        .unionByName(pids.filter(p % 3 == 0).select(
            p.alias("product_id"), F.lit("material").alias("key"),
            F.lit(True).alias("has_primary"),
            F.concat(F.lit("v_mat_"), ps).alias("primary"),
            F.when(p % 6 == 0, None).otherwise(conf3)
             .cast("double").alias("confidence"),
            F.array(F.lit("m1")).alias("secondary")))
        .unionByName(pids.filter(p % 4 == 2).select(
            p.alias("product_id"), F.lit("finish").alias("key"),
            (p % 2 == 0).alias("has_primary"),
            F.concat(F.lit("v_fin_"), ps).alias("primary"),
            F.lit(0.4).cast("double").alias("confidence"),
            F.array().cast("array<string>").alias("secondary")))
        .unionByName(pids.filter(p % 8 == 1).select(
            p.alias("product_id"), F.lit("origin").alias("key"),
            F.lit(True).alias("has_primary"),
            F.concat(F.lit("v_org_"), ps).alias("primary"),
            F.lit(0.5).cast("double").alias("confidence"),
            F.array().cast("array<string>").alias("secondary"))))

    ai = (
        pids.filter(p % 3 != 2).select(
            p.alias("product_id"), F.lit("material").alias("key"),
            F.when(p % 9 == 0, "").when(p % 9 == 1, None)
             .otherwise(F.concat(F.lit("a_mat_"), ps)).alias("value"))
        .unionByName(pids.filter(p % 5 == 1).select(
            p.alias("product_id"), F.lit("color").alias("key"),
            F.concat(F.lit("a_col_"), ps).alias("value")))
        .unionByName(pids.filter(p % 5 == 3).select(
            p.alias("product_id"), F.lit("colors").alias("key"),
            F.concat(F.lit("a_cols_"), ps).alias("value")))
        .unionByName(pids.filter(p % 7 == 2).select(
            p.alias("product_id"), F.lit("finish").alias("key"),
            F.concat(F.lit("a_fin_"), ps).alias("value"))))
    return fac, vis, ai


_PIDS_SQL = "SELECT DISTINCT user_id % 60 AS pid FROM events"

SYNTH_FACTORY_SQL = f"""
    WITH pids AS ({_PIDS_SQL})
    SELECT pid AS product_id, 'origin' AS key,
           'f_org_' || CAST(pid AS VARCHAR) AS value FROM pids
    UNION ALL
    SELECT pid, 'material',
           CASE WHEN pid % 7 = 0 THEN NULL
                ELSE 'f_mat_' || CAST(pid AS VARCHAR) END
    FROM pids WHERE pid % 2 = 0
    UNION ALL
    SELECT pid, 'colors', 'f_cols_' || CAST(pid AS VARCHAR)
    FROM pids WHERE pid % 3 = 0
    UNION ALL
    SELECT pid, 'color', 'f_col_' || CAST(pid AS VARCHAR)
    FROM pids WHERE pid % 5 = 0
"""

_CONF3 = ("CASE WHEN pid % 3 = 0 THEN CAST(0.3 AS DOUBLE) "
          "WHEN pid % 3 = 1 THEN CAST(0.5 AS DOUBLE) "
          "ELSE CAST(0.9 AS DOUBLE) END")
_SEC2 = ("CASE WHEN pid % 2 = 0 THEN ['s1_' || CAST(pid AS VARCHAR), 's2'] "
         "ELSE CAST([] AS VARCHAR[]) END")

SYNTH_VISUAL_SQL = f"""
    WITH pids AS ({_PIDS_SQL})
    SELECT pid AS product_id, 'color' AS key,
           pid % 4 <> 3 AS has_primary,
           CASE WHEN pid % 7 = 1 THEN NULL
                ELSE 'v_col_' || CAST(pid AS VARCHAR) END AS "primary",
           CASE WHEN pid % 6 = 0 THEN NULL ELSE {_CONF3} END AS confidence,
           {_SEC2} AS secondary
    FROM pids WHERE pid % 4 <> 1
    UNION ALL
    SELECT pid, 'material', TRUE, 'v_mat_' || CAST(pid AS VARCHAR),
           CASE WHEN pid % 6 = 0 THEN NULL ELSE {_CONF3} END, ['m1']
    FROM pids WHERE pid % 3 = 0
    UNION ALL
    SELECT pid, 'finish', pid % 2 = 0, 'v_fin_' || CAST(pid AS VARCHAR),
           CAST(0.4 AS DOUBLE), CAST([] AS VARCHAR[])
    FROM pids WHERE pid % 4 = 2
    UNION ALL
    SELECT pid, 'origin', TRUE, 'v_org_' || CAST(pid AS VARCHAR),
           CAST(0.5 AS DOUBLE), CAST([] AS VARCHAR[])
    FROM pids WHERE pid % 8 = 1
"""

SYNTH_AI_SQL = f"""
    WITH pids AS ({_PIDS_SQL})
    SELECT pid AS product_id, 'material' AS key,
           CASE WHEN pid % 9 = 0 THEN ''
                WHEN pid % 9 = 1 THEN NULL
                ELSE 'a_mat_' || CAST(pid AS VARCHAR) END AS value
    FROM pids WHERE pid % 3 <> 2
    UNION ALL
    SELECT pid, 'color', 'a_col_' || CAST(pid AS VARCHAR)
    FROM pids WHERE pid % 5 = 1
    UNION ALL
    SELECT pid, 'colors', 'a_cols_' || CAST(pid AS VARCHAR)
    FROM pids WHERE pid % 5 = 3
    UNION ALL
    SELECT pid, 'finish', 'a_fin_' || CAST(pid AS VARCHAR)
    FROM pids WHERE pid % 7 = 2
"""


def duck_consolidate_sql() -> str:
    """DuckDB oracle over the three synth CTEs (factory_in, visual_in,
    ai_in must be provided as CTE names by the caller)."""
    return f"""
    , fac AS (
        SELECT product_id, key AS field, value, 'str' AS value_kind,
               'factory_default' AS source, CAST(0.5 AS DOUBLE) AS confidence,
               CAST(NULL AS VARCHAR) AS secondary_csv, 1 AS priority
        FROM factory_in WHERE value IS NOT NULL
    ), vis_ok AS (
        SELECT *, COALESCE(confidence, CAST(0.8 AS DOUBLE)) AS conf_eff
        FROM visual_in WHERE has_primary
    ), vis_gen AS (
        -- DuckDB ARRAY_TO_STRING([]) is NULL where Spark array_join is ''
        -- — secondary is never NULL by schema, so COALESCE restores parity
        SELECT product_id, key AS field, "primary" AS value,
               'str' AS value_kind, 'visual_embedding' AS source,
               conf_eff AS confidence,
               COALESCE(ARRAY_TO_STRING(secondary, '|'), '') AS secondary_csv,
               CASE WHEN conf_eff >= CAST(0.5 AS DOUBLE) THEN 2 ELSE 0 END
                 AS priority
        FROM vis_ok WHERE key <> 'color' AND "primary" IS NOT NULL
    ), ai_ok AS (
        SELECT * FROM ai_in WHERE value IS NOT NULL AND value <> ''
    ), ai_all AS (
        SELECT product_id,
               CASE WHEN key IN ('color', 'colors') THEN 'colors'
                    ELSE key END AS field,
               value,
               CASE WHEN key IN ('color', 'colors') THEN 'list'
                    ELSE 'str' END AS value_kind,
               'ai_text_extraction' AS source,
               CAST(0.95 AS DOUBLE) AS confidence,
               CAST(NULL AS VARCHAR) AS secondary_csv, 3 AS priority
        FROM ai_ok
    ), pool AS (
        SELECT * FROM fac UNION ALL SELECT * FROM vis_gen
        UNION ALL SELECT * FROM ai_all
    ), fields AS (
        SELECT product_id, field, value, value_kind, source, confidence,
               secondary_csv
        FROM pool
        QUALIFY ROW_NUMBER() OVER (PARTITION BY product_id, field
                                   ORDER BY priority DESC, source ASC) = 1
    ), vcd AS (
        SELECT v.product_id, 'visual_color_detected' AS field,
               v."primary" AS value, 'str' AS value_kind,
               'visual_embedding' AS source, v.conf_eff AS confidence,
               COALESCE(ARRAY_TO_STRING(v.secondary, '|'), '') AS secondary_csv
        FROM vis_ok v
        LEFT JOIN (SELECT DISTINCT product_id, TRUE AS fac_colors
                   FROM factory_in
                   WHERE key = 'colors' AND value IS NOT NULL) f
          USING (product_id)
        LEFT JOIN (SELECT DISTINCT product_id, TRUE AS ai_colors
                   FROM ai_ok WHERE key IN ('color', 'colors')) a
          USING (product_id)
        WHERE v.key = 'color'
          AND ((v."primary" IS NOT NULL AND f.fac_colors IS NULL)
               OR a.ai_colors IS NOT NULL)
    )
    SELECT * FROM fields UNION ALL SELECT * FROM vcd
"""
