"""Template-prompt resolution + response-shape folds
(app/services/utilities/unified_prompt_service.py,
app/services/utilities/prompt_template_service.py).

Pinned semantics (file:line):

* ``get_template_prompt`` 4-tier ladder
  (unified_prompt_service.py:207-283):
  1. industry + category exact;
  2. industry with stored ``category IS NULL`` — the docstring says
     "any category" but the query pins the NULL category, so a row
     with a DIFFERENT category never matches tier 2 (comment lies —
     pin);
  3. category with stored ``industry IS NULL`` (same pin mirrored);
  4. ``is_default = TRUE`` for the stage with NO industry/category
     constraint and NO ordering — the reference's tier-4 pick is
     REST-order-unspecified; this engine canonicalizes all tiers by
     (updated_at DESC, id ASC), which matches tiers 1-3 exactly
     (they order updated_at DESC LIMIT 1) and pins a deterministic
     choice for tier 4 (documented).
  A tier fires only when its request-side operand is non-null; all
  tiers require is_active AND the workspace + stage + type match.
* ``_get_cache_key`` (unified_prompt_service.py:31-33): sorted
  ``k=v`` pairs joined with ':' SKIPPING None values — an explicit
  None and an absent kwarg collide on the same key (pin).
* ``_to_template_response``
  (prompt_template_service.py:86-119):
  - ``_num(value, default)`` coerces with ``type(default)`` — an int
    default TRUNCATES float inputs (max_tokens 100.7 -> 100, pin);
    None/garbage -> default (the .get default is therefore only one
    of TWO fallback layers);
  - ``is_default = bool(row.get('is_default', False))`` and
    ``is_active = bool(row.get('is_active', True))`` — absent
    is_active folds True but a present-NULL folds FALSE
    (bool(None)) — asymmetric (pin);
  - body ladder ``prompt_text or prompt_template or ''``;
  - ``model_preference = config.get('model_preference') or
    config.get('model')`` (live or);
  - a non-dict ``configuration`` folds to {} (pin);
  - id/workspace/name/timestamps render ``str(x or '')``.

Scale: the resolver is one equi-join on (workspace, stage) — both
sides pre-filtered to active template rows — followed by a per-request
row_number pick; the prompts side is tiny (admin-edited) and
broadcast-eligible.  The response shape is a map-side projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resolve_template_prompt(requests: DataFrame,
                            prompts: DataFrame) -> DataFrame:
    """requests: (request_id, workspace_id, stage, category nullable,
    industry nullable).  prompts: (id, workspace_id, stage, category,
    industry, is_default, is_active, updated_at long).  One row per
    request: (matched prompt id nullable, tier nullable)."""
    p = prompts.where(F.col("is_active")).select(
        F.col("id").alias("p_id"), "workspace_id", "stage",
        F.col("category").alias("p_category"),
        F.col("industry").alias("p_industry"),
        "is_default", "updated_at")
    # Round 6 (10x-scale audit finding): the winner depends only on
    # the request's (workspace, stage, category, industry) combo, so
    # resolve DISTINCT combos against the prompt fan and re-join the
    # per-combo winner to the requests (guide §8: decide on small
    # rows). The previous requests x prompts join fanned EVERY request
    # across every active prompt of its (workspace, stage); with a
    # bounded workspace/stage key space that is quadratic in corpus
    # size — measured 2.2 s at sf0.1 but 166 s at the 10x corpus. The
    # combo table is bounded by workspaces x stages x axis taxonomy,
    # so the fan is now linear in the prompt table.
    # the two nullable axes are cast to string explicitly: an all-NULL
    # input column arrives as NullType (void), and void-typed null-safe
    # join keys hash-mismatch in this Spark build (the re-join below
    # returned nothing for such frames); the cast is a no-op for real
    # string columns and NULL for void ones
    combos = requests.select(
        "workspace_id", "stage",
        F.col("category").cast("string").alias("category"),
        F.col("industry").cast("string").alias("industry")).distinct()
    j = combos.join(F.broadcast(p), ["workspace_id", "stage"], "left")
    tier = (
        F.when(F.col("industry").isNotNull()
               & F.col("category").isNotNull()
               & (F.col("p_industry") == F.col("industry"))
               & (F.col("p_category") == F.col("category")), 1)
        .when(F.col("industry").isNotNull()
              & (F.col("p_industry") == F.col("industry"))
              & F.col("p_category").isNull(), 2)
        .when(F.col("category").isNotNull()
              & (F.col("p_category") == F.col("category"))
              & F.col("p_industry").isNull(), 3)
        .when(F.col("is_default"), 4))
    # Winner pick as a map-side-combinable min(struct) aggregation —
    # only one candidate row per combo crosses the shuffle. NULL tier
    # folds to the sentinel 5 (nulls-last); a combo whose winner is
    # the sentinel had no matching prompt and emits NULLs, exactly the
    # re-join's left-miss shape.
    j = j.withColumn("tier", tier)
    pick = F.struct(
        F.coalesce(F.col("tier"), F.lit(5)).alias("t"),
        (-F.coalesce(F.col("updated_at"), F.lit(0))).alias("u"),
        F.col("p_id").alias("p"))
    g = (j.groupBy("workspace_id", "stage", "category", "industry")
         .agg(F.min(pick).alias("_w")))
    matched = F.col("_w.t") != 5
    winners = g.select(
        F.col("workspace_id").alias("w_ws"),
        F.col("stage").alias("w_stage"),
        F.col("category").alias("w_category"),
        F.col("industry").alias("w_industry"),
        F.when(matched, F.col("_w.p")).alias("prompt_id"),
        F.when(matched, F.col("_w.t")).cast("int").alias("tier"))
    # null-safe re-attach on the two nullable axes (combos carry every
    # request combo, so this inner join is exact, never lossy). The
    # winners side descends from `requests` (via combos), so every
    # winner column is renamed to a unique name first — with shared
    # names the self-join lineage misresolves silently.
    out = requests.join(
        winners,
        (F.col("workspace_id") == F.col("w_ws"))
        & (F.col("stage") == F.col("w_stage"))
        & F.col("category").cast("string")
           .eqNullSafe(F.col("w_category"))
        & F.col("industry").cast("string")
           .eqNullSafe(F.col("w_industry")))
    return out.select(
        "request_id", "workspace_id", "stage", "category", "industry",
        "prompt_id", "tier")


def cache_key(requests: DataFrame) -> DataFrame:
    """_get_cache_key over (type, workspace, stage, industry): sorted
    k=v join skipping Nones — None and absent collide (pin)."""
    parts = []
    for k, c in (("industry", "industry"), ("stage", "stage"),
                 ("type", "ptype"), ("workspace", "workspace_id")):
        parts.append(F.when(F.col(c).isNotNull(),
                            F.concat(F.lit(k + "="), F.col(c))))
    key = F.concat_ws(":", *parts)   # concat_ws drops NULLs
    return requests.select("request_id", key.alias("cache_key"))


def template_response_shape(rows: DataFrame) -> DataFrame:
    """_to_template_response (prompt_template_service.py:86-119).
    Config scalars arrive pre-exploded: config_is_dict, cfg_model_pref,
    cfg_model, cfg_temperature (string, NULL = absent), cfg_max_tokens
    (string); has_is_active/is_active etc. model key presence."""
    live = F.col("config_is_dict")

    def _num_float(col, default):
        # float(value): numeric strings pass, garbage/None -> default
        v = F.col(col).try_cast("double")
        return F.when(live & F.col(col).isNotNull() & v.isNotNull(), v) \
            .otherwise(F.lit(default))

    def _num_int(col, default):
        # Python int(str) accepts ONLY integral strings (whitespace
        # and sign allowed) — int('100.7') RAISES -> default, unlike
        # Spark's truncating and DuckDB's rounding string casts, so
        # both engines gate on an explicit integral regex.  (An int()
        # over an actual float VALUE truncates — documented; configs
        # arrive as JSON scalars rendered to strings here.)
        s = F.col(col)
        integral = s.rlike(r"^\s*[+-]?[0-9]+\s*$")
        return (F.when(live & s.isNotNull() & integral,
                       s.cast("long"))
                .otherwise(F.lit(default)))

    return rows.select(
        "row_id",
        F.coalesce(F.col("id"), F.lit("")).alias("id_out"),
        F.coalesce(F.col("name"), F.lit("")).alias("name_out"),
        (F.when(F.col("prompt_text").isNotNull()
                & (F.col("prompt_text") != ""), F.col("prompt_text"))
         .when(F.col("prompt_template").isNotNull()
               & (F.col("prompt_template") != ""),
               F.col("prompt_template"))
         .otherwise(F.lit(""))).alias("prompt_template_out"),
        (F.when(live & F.col("cfg_model_pref").isNotNull()
                & (F.col("cfg_model_pref") != ""),
                F.col("cfg_model_pref"))
         .when(live, F.col("cfg_model"))).alias("model_preference"),
        _num_float("cfg_temperature", 0.1).alias("temperature"),
        _num_int("cfg_max_tokens", 4096).cast("int")
        .alias("max_tokens"),
        # bool(row.get('is_default', False)) / (… 'is_active', True)
        (F.when(F.col("has_is_default"),
                F.coalesce(F.col("is_default"), F.lit(False)))
         .otherwise(F.lit(False))).alias("is_default_out"),
        (F.when(F.col("has_is_active"),
                F.coalesce(F.col("is_active"), F.lit(False)))
         .otherwise(F.lit(True))).alias("is_active_out"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

_INDUSTRIES = "('construction', 'interior_design', NULL)"
_CATEGORIES = "('products', 'certificates', NULL)"


def synth_prompts(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 11 < 4).select(
        F.concat(F.lit("p"), e.cast("string")).alias("id"),
        F.concat(F.lit("ws"), (e % 6).cast("string"))
        .alias("workspace_id"),
        F.when(e % 3 == 0, "metadata_extraction")
        .when(e % 3 == 1, "discovery").otherwise("classification")
        .alias("stage"),
        F.when(e % 4 == 0, "products").when(e % 4 == 1, "certificates")
        .otherwise(F.lit(None).cast("string")).alias("category"),
        F.when(e % 5 == 0, "construction")
        .when(e % 5 == 1, "interior_design")
        .otherwise(F.lit(None).cast("string")).alias("industry"),
        (e % 7 == 0).alias("is_default"),
        (e % 13 != 0).alias("is_active"),
        (e % 1000).cast("long").alias("updated_at")))


SYNTH_PROMPTS_SQL = """
    SELECT 'p' || CAST(event_id AS VARCHAR) AS id,
           'ws' || CAST(event_id % 6 AS VARCHAR) AS workspace_id,
           CASE event_id % 3 WHEN 0 THEN 'metadata_extraction'
                WHEN 1 THEN 'discovery' ELSE 'classification' END
               AS stage,
           CASE event_id % 4 WHEN 0 THEN 'products'
                WHEN 1 THEN 'certificates' END AS category,
           CASE event_id % 5 WHEN 0 THEN 'construction'
                WHEN 1 THEN 'interior_design' END AS industry,
           event_id % 7 = 0 AS is_default,
           event_id % 13 <> 0 AS is_active,
           CAST(event_id % 1000 AS BIGINT) AS updated_at
    FROM events WHERE event_id % 11 < 4
"""


def synth_resolve_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 23 == 0).select(
        e.cast("long").alias("request_id"),
        F.concat(F.lit("ws"), (e % 6).cast("string"))
        .alias("workspace_id"),
        F.when(e % 3 == 0, "metadata_extraction")
        .when(e % 3 == 1, "discovery").otherwise("classification")
        .alias("stage"),
        F.when(e % 4 == 2, F.lit(None).cast("string"))
        .when(e % 2 == 0, "products").otherwise("certificates")
        .alias("category"),
        F.when(e % 5 == 3, F.lit(None).cast("string"))
        .when(e % 2 == 0, "construction").otherwise("interior_design")
        .alias("industry")))


SYNTH_RESOLVE_REQ_SQL = """
    SELECT CAST(event_id AS BIGINT) AS request_id,
           'ws' || CAST(event_id % 6 AS VARCHAR) AS workspace_id,
           CASE event_id % 3 WHEN 0 THEN 'metadata_extraction'
                WHEN 1 THEN 'discovery' ELSE 'classification' END
               AS stage,
           CASE WHEN event_id % 4 = 2 THEN NULL
                WHEN event_id % 2 = 0 THEN 'products'
                ELSE 'certificates' END AS category,
           CASE WHEN event_id % 5 = 3 THEN NULL
                WHEN event_id % 2 = 0 THEN 'construction'
                ELSE 'interior_design' END AS industry
    FROM events WHERE event_id % 23 = 0
"""


def resolve_sql() -> str:
    return f"""
        WITH prompts AS ({SYNTH_PROMPTS_SQL}),
        reqs AS ({SYNTH_RESOLVE_REQ_SQL}),
        j AS (
          SELECT r.request_id, p.id AS p_id, p.updated_at,
                 CASE
                   WHEN r.industry IS NOT NULL
                        AND r.category IS NOT NULL
                        AND p.industry = r.industry
                        AND p.category = r.category THEN 1
                   WHEN r.industry IS NOT NULL
                        AND p.industry = r.industry
                        AND p.category IS NULL THEN 2
                   WHEN r.category IS NOT NULL
                        AND p.category = r.category
                        AND p.industry IS NULL THEN 3
                   WHEN p.is_default THEN 4
                 END AS tier
          FROM reqs r JOIN prompts p
            ON p.workspace_id = r.workspace_id AND p.stage = r.stage
          WHERE p.is_active),
        ranked AS (
          SELECT request_id, p_id, tier,
                 row_number() OVER (PARTITION BY request_id
                     ORDER BY tier, updated_at DESC, p_id) AS rk
          FROM j WHERE tier IS NOT NULL)
        SELECT r.request_id, r.workspace_id, r.stage, r.category,
               r.industry, b.p_id AS prompt_id,
               CAST(b.tier AS INT) AS tier
        FROM reqs r LEFT JOIN (SELECT * FROM ranked WHERE rk = 1) b
          USING (request_id)
    """


def synth_template_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("row_id"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("id"), e.cast("string"))).alias("id"),
        F.when(e % 8 == 0, F.lit(None).cast("string"))
        .when(e % 8 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("tmpl "), (e % 30).cast("string")))
        .alias("name"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .when(e % 4 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("body "), e.cast("string")))
        .alias("prompt_text"),
        F.when(e % 6 == 0, F.concat(F.lit("legacy "), e.cast("string")))
        .otherwise(F.lit(None).cast("string")).alias("prompt_template"),
        (e % 10 != 0).alias("config_is_dict"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("model-a"), (e % 3).cast("string")))
        .alias("cfg_model_pref"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("model-b"), (e % 3).cast("string")))
        .alias("cfg_model"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .when(e % 6 == 1, F.lit("0.7")).when(e % 6 == 2, F.lit("oops"))
        .otherwise(F.lit("0.25")).alias("cfg_temperature"),
        F.lit(True).alias("cfg_temperature_is_string"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.lit("2048"))
        .when(e % 7 == 2, F.lit("100.7"))       # int(str) raises
        .when(e % 7 == 3, F.lit("junk"))
        .otherwise(F.lit("8192")).alias("cfg_max_tokens"),
        F.lit(True).alias("cfg_max_tokens_is_string"),
        (e % 3 != 0).alias("has_is_default"),
        F.when(e % 5 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("is_default"),
        (e % 4 != 0).alias("has_is_active"),
        F.when(e % 6 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 1).alias("is_active"))


SYNTH_TEMPLATE_ROWS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS row_id,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'id' || CAST(event_id AS VARCHAR) END AS id,
           CASE WHEN event_id % 8 = 0 THEN NULL
                WHEN event_id % 8 = 1 THEN ''
                ELSE 'tmpl ' || CAST(event_id % 30 AS VARCHAR) END
               AS name,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN ''
                ELSE 'body ' || CAST(event_id AS VARCHAR) END
               AS prompt_text,
           CASE WHEN event_id % 6 = 0
                THEN 'legacy ' || CAST(event_id AS VARCHAR) END
               AS prompt_template,
           event_id % 10 <> 0 AS config_is_dict,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'model-a' || CAST(event_id % 3 AS VARCHAR) END
               AS cfg_model_pref,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE 'model-b' || CAST(event_id % 3 AS VARCHAR) END
               AS cfg_model,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN '0.7'
                WHEN event_id % 6 = 2 THEN 'oops'
                ELSE '0.25' END AS cfg_temperature,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN '2048'
                WHEN event_id % 7 = 2 THEN '100.7'
                WHEN event_id % 7 = 3 THEN 'junk'
                ELSE '8192' END AS cfg_max_tokens,
           event_id % 3 <> 0 AS has_is_default,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS is_default,
           event_id % 4 <> 0 AS has_is_active,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE event_id % 2 = 1 END AS is_active
    FROM events
"""


def template_shape_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_TEMPLATE_ROWS_SQL})
        SELECT row_id,
               coalesce(id, '') AS id_out,
               coalesce(name, '') AS name_out,
               CASE WHEN prompt_text IS NOT NULL AND prompt_text <> ''
                    THEN prompt_text
                    WHEN prompt_template IS NOT NULL
                         AND prompt_template <> ''
                    THEN prompt_template ELSE '' END
                   AS prompt_template_out,
               CASE WHEN config_is_dict AND cfg_model_pref IS NOT NULL
                         AND cfg_model_pref <> '' THEN cfg_model_pref
                    WHEN config_is_dict THEN cfg_model END
                   AS model_preference,
               CASE WHEN config_is_dict AND cfg_temperature IS NOT NULL
                         AND TRY_CAST(cfg_temperature AS DOUBLE)
                             IS NOT NULL
                    THEN TRY_CAST(cfg_temperature AS DOUBLE)
                    ELSE 0.1 END AS temperature,
               CAST(CASE WHEN config_is_dict
                         AND cfg_max_tokens IS NOT NULL
                         AND regexp_matches(cfg_max_tokens,
                             '^\\s*[+-]?[0-9]+\\s*$')
                    THEN CAST(trim(cfg_max_tokens) AS BIGINT)
                    ELSE 4096 END AS INT) AS max_tokens,
               CASE WHEN has_is_default
                    THEN coalesce(is_default, FALSE)
                    ELSE FALSE END AS is_default_out,
               CASE WHEN has_is_active
                    THEN coalesce(is_active, FALSE)
                    ELSE TRUE END AS is_active_out
        FROM r
    """
