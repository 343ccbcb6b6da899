"""Knowledge-base document folds (app/api/knowledge_base.py) as Spark
plans — embedding generation and the pgvector RPC bodies are out of
scope (network / DB-side SQL not present in the repo); reproduced:

- create-as-upsert (:132-248): keyed by (workspace_id, title,
  category_id) where a NULL request category matches only NULL-category
  rows (.is_('null') — pin, NOT "any category"); an existing hit
  UPDATES in place and re-embeds ONLY when content changed — an
  unchanged-content update leaves every embedding field untouched
  (pin); the embedding outcome ladder stamps success (+ cleared error)
  / failed (+ message); the fresh-insert path stamps
  embedding_generated_at only on success and model
  'text-embedding-3-small';
- price_doc_type gate (:143-147): a non-NULL type outside the pinned
  vocabulary 400s BEFORE the upsert lookup;
- search-result validation (:823-852): the RPC rows flow through a
  .get-with-default fold where the defaults are LIVE (RPC shapes vary):
  title 'Untitled', content '', status 'draft', visibility 'workspace',
  embedding_status 'pending', view_count 0, workspace falls back to the
  REQUEST workspace; similarity only present for semantic rows. A
  present-NULL title stays None (Python .get — pin);
- rpc-arg assembly (:776-815): optional filters are TRUTHY-gated — an
  empty-string category_id/slug/price_doc_type is OMITTED from the
  call (pin); include_private mirrors is_admin_caller.

Scale: the upsert fold is one broadcast-able join on the composite key;
validation and arg assembly are map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PRICE_DOC_TYPES = ("faq", "pricing_guide", "methodology",
                   "market_report", "glossary")


def upsert_plan(requests: DataFrame, existing: DataFrame) -> DataFrame:
    """create_kb_document's upsert decision (:132-248). ``existing``
    carries one row per stored (workspace_id, title, category_id)."""
    # existing.data[0]: the reference takes the FIRST row in DB order,
    # which is unspecified — canonicalized to the lowest doc_id per key
    from pyspark.sql import Window
    w = Window.partitionBy("workspace_id", "title", "category_id") \
        .orderBy("doc_id")
    ex = existing.withColumn("_rn", F.row_number().over(w)) \
        .filter(F.col("_rn") == 1).select(
        F.col("workspace_id").alias("ex_ws"),
        F.col("title").alias("ex_title"),
        F.col("category_id").alias("ex_cat"),
        F.col("content").alias("ex_content"),
        F.col("doc_id").alias("ex_id"))
    joined = requests.join(
        ex,
        (F.col("workspace_id") == F.col("ex_ws"))
        & (F.col("title") == F.col("ex_title"))
        & F.col("category_id").eqNullSafe(F.col("ex_cat")), "left")
    bad_type = F.col("price_doc_type").isNotNull() & \
        ~F.col("price_doc_type").isin(*PRICE_DOC_TYPES)
    hit = F.col("ex_id").isNotNull()
    content_changed = ~F.col("ex_content").eqNullSafe(F.col("content"))
    embeds = hit & content_changed | ~hit
    action = (F.when(bad_type, F.lit("invalid_price_doc_type"))
              .when(hit, F.lit("update"))
              .otherwise(F.lit("insert")))
    ok = ~bad_type
    emb_status = F.when(
        embeds,
        F.when(F.col("embed_ok"), F.lit("success"))
        .otherwise(F.lit("failed")))
    return joined.select(
        "request_id", action.alias("action"),
        F.when(ok, F.col("ex_id")).alias("target_doc_id"),
        F.when(ok, embeds).cast("int").alias("re_embed"),
        F.when(ok, emb_status).alias("embedding_status"),
        F.when(ok & embeds & ~F.col("embed_ok"),
               F.coalesce(F.col("embed_error"), F.lit("Unknown error")))
        .alias("embedding_error"),
        F.when(ok & embeds & F.col("embed_ok"), F.lit(1))
        .otherwise(F.when(ok, F.lit(0))).alias("stamps_generated_at"))


def validate_results(rows: DataFrame) -> DataFrame:
    """search_kb_documents' validation fold (:823-852). Input rows carry
    has_<field> flags for RPC-shape variance; present-NULL values pass
    through (Python .get)."""
    def _get(flag: str, col: str, default):
        return F.when(F.col(flag), F.col(col)).otherwise(F.lit(default))

    return rows.select(
        "row_id",
        _get("has_title", "title", "Untitled").alias("title"),
        _get("has_content", "content", "").alias("content"),
        _get("has_status", "status", "draft").alias("status"),
        _get("has_visibility", "visibility", "workspace")
        .alias("visibility"),
        _get("has_embedding_status", "embedding_status", "pending")
        .alias("embedding_status"),
        F.when(F.col("has_view_count"), F.col("view_count"))
        .otherwise(F.lit(0)).cast("long").alias("view_count"),
        F.when(F.col("has_workspace"), F.col("workspace_id"))
        .otherwise(F.col("request_workspace")).alias("workspace_id"),
        F.when(F.col("has_similarity"), F.col("similarity"))
        .alias("similarity"))


def rpc_args(requests: DataFrame) -> DataFrame:
    """rpc-arg assembly (:776-815): truthy-gated optional filters."""
    return requests.select(
        "request_id",
        F.when(F.col("search_type") == "semantic", F.lit("kb_match_docs"))
        .otherwise(F.lit("kb_search_docs")).alias("rpc"),
        F.col("is_admin_caller").cast("int").alias("include_private"),
        (F.col("category_id").isNotNull() & (F.col("category_id") != ""))
        .cast("int").alias("sends_category_id"),
        (F.col("category_slug").isNotNull()
         & (F.col("category_slug") != ""))
        .cast("int").alias("sends_category_slug"),
        (F.col("price_doc_type").isNotNull()
         & (F.col("price_doc_type") != ""))
        .cast("int").alias("sends_price_doc_type"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_upsert_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    cat = F.when(e % 4 == 0, F.lit(None).cast("string")) \
        .otherwise(F.concat(F.lit("cat-"), e % 3))
    pdt = (F.when(e % 7 == 0, F.lit("faq"))
           .when(e % 7 == 1, F.lit("pricing_guide"))
           .when(e % 7 == 2, F.lit("bogus_type"))
           .otherwise(F.lit(None).cast("string")))
    return events.filter(e % 2 == 0).select(
        e.alias("request_id"),
        F.concat(F.lit("ws-"), e % 3).alias("workspace_id"),
        F.concat(F.lit("Doc "), e % 25).alias("title"),
        cat.alias("category_id"),
        F.concat(F.lit("content v"),
                 F.when(e % 8 < 4, (e % 25) % 5)
                 .otherwise((e % 25 + 1) % 5)).alias("content"),
        ((e * 7) % 6 != 0).alias("embed_ok"),
        F.when((e * 11) % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("embed err "), e % 4))
        .alias("embed_error"),
        pdt.alias("price_doc_type"))


def synth_existing(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    cat = F.when(e % 4 == 1, F.lit(None).cast("string")) \
        .otherwise(F.concat(F.lit("cat-"), e % 3))
    return events.filter((e % 2 == 1) & (e % 5 != 0)).select(
        F.concat(F.lit("kb-"), e).alias("doc_id"),
        F.concat(F.lit("ws-"), e % 3).alias("workspace_id"),
        F.concat(F.lit("Doc "), e % 25).alias("title"),
        cat.alias("category_id"),
        F.concat(F.lit("content v"), (e % 25) % 5).alias("content"))


def synth_rpc_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.alias("row_id"),
        ((e * 3) % 4 != 0).alias("has_title"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("T"), e % 7)).alias("title"),
        ((e * 5) % 3 != 0).alias("has_content"),
        F.concat(F.lit("body "), e % 11).alias("content"),
        ((e * 7) % 5 != 0).alias("has_status"),
        F.lit("published").alias("status"),
        ((e * 11) % 4 != 0).alias("has_visibility"),
        F.lit("public").alias("visibility"),
        ((e * 13) % 3 != 0).alias("has_embedding_status"),
        F.lit("success").alias("embedding_status"),
        ((e * 17) % 6 != 0).alias("has_view_count"),
        (e % 50).cast("long").alias("view_count"),
        ((e * 19) % 4 != 0).alias("has_workspace"),
        F.concat(F.lit("ws-"), e % 5).alias("workspace_id"),
        F.concat(F.lit("ws-req-"), e % 3).alias("request_workspace"),
        ((e * 23) % 2 == 0).alias("has_similarity"),
        (((e * 29) % 100).cast("double") / 100).alias("similarity"))


def synth_search_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    st = (F.when(e % 3 == 0, F.lit("semantic"))
          .when(e % 3 == 1, F.lit("full_text"))
          .otherwise(F.lit("hybrid")))
    cat = (F.when(e % 5 == 0, F.lit(None).cast("string"))
           .when(e % 5 == 1, F.lit(""))
           .otherwise(F.concat(F.lit("cat-"), e % 3)))
    slug = (F.when((e * 3) % 4 == 0, F.lit(None).cast("string"))
            .when((e * 3) % 4 == 1, F.lit(""))
            .otherwise(F.concat(F.lit("slug-"), e % 2)))
    pdt = F.when((e * 7) % 3 == 0, F.lit("faq")) \
        .otherwise(F.lit(None).cast("string"))
    return events.select(
        e.alias("request_id"), st.alias("search_type"),
        (e % 11 == 0).alias("is_admin_caller"), cat.alias("category_id"),
        slug.alias("category_slug"), pdt.alias("price_doc_type"))


SYNTH_UPSERT_REQUESTS_SQL = """
    SELECT event_id AS request_id,
           'ws-' || CAST(event_id % 3 AS VARCHAR) AS workspace_id,
           'Doc ' || CAST(event_id % 25 AS VARCHAR) AS title,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE 'cat-' || CAST(event_id % 3 AS VARCHAR) END
               AS category_id,
           'content v' || CAST(CASE WHEN event_id % 8 < 4
                THEN (event_id % 25) % 5
                ELSE (event_id % 25 + 1) % 5 END AS VARCHAR)
               AS content,
           (event_id * 7) % 6 <> 0 AS embed_ok,
           CASE WHEN (event_id * 11) % 3 = 0 THEN NULL
                ELSE 'embed err ' || CAST(event_id % 4 AS VARCHAR) END
               AS embed_error,
           CASE WHEN event_id % 7 = 0 THEN 'faq'
                WHEN event_id % 7 = 1 THEN 'pricing_guide'
                WHEN event_id % 7 = 2 THEN 'bogus_type' END
               AS price_doc_type
    FROM events WHERE event_id % 2 = 0
"""

SYNTH_EXISTING_SQL = """
    SELECT 'kb-' || CAST(event_id AS VARCHAR) AS doc_id,
           'ws-' || CAST(event_id % 3 AS VARCHAR) AS workspace_id,
           'Doc ' || CAST(event_id % 25 AS VARCHAR) AS title,
           CASE WHEN event_id % 4 = 1 THEN NULL
                ELSE 'cat-' || CAST(event_id % 3 AS VARCHAR) END
               AS category_id,
           'content v' || CAST((event_id % 25) % 5 AS VARCHAR)
               AS content
    FROM events WHERE event_id % 2 = 1 AND event_id % 5 <> 0
"""


def upsert_plan_sql() -> str:
    types = ", ".join(f"'{t}'" for t in PRICE_DOC_TYPES)
    return f"""
        WITH req AS ({SYNTH_UPSERT_REQUESTS_SQL}),
        ex_all AS ({SYNTH_EXISTING_SQL}),
        ex AS (
          SELECT * FROM ex_all
          QUALIFY row_number() OVER (
              PARTITION BY workspace_id, title, category_id
              ORDER BY doc_id) = 1),
        j AS (
          SELECT req.*, ex.doc_id AS ex_id, ex.content AS ex_content
          FROM req LEFT JOIN ex
            ON ex.workspace_id = req.workspace_id
           AND ex.title = req.title
           AND ex.category_id IS NOT DISTINCT FROM req.category_id),
        f AS (
          SELECT *,
                 price_doc_type IS NOT NULL
                     AND price_doc_type NOT IN ({types}) AS bad_type,
                 ex_id IS NOT NULL AS hit,
                 (ex_id IS NOT NULL
                  AND ex_content IS DISTINCT FROM content)
                     OR ex_id IS NULL AS embeds
          FROM j)
        SELECT request_id,
               CASE WHEN bad_type THEN 'invalid_price_doc_type'
                    WHEN hit THEN 'update' ELSE 'insert' END AS action,
               CASE WHEN NOT bad_type THEN ex_id END AS target_doc_id,
               CAST(CASE WHEN NOT bad_type THEN embeds END AS INT)
                   AS re_embed,
               CASE WHEN NOT bad_type AND embeds THEN
                    CASE WHEN embed_ok THEN 'success' ELSE 'failed' END
               END AS embedding_status,
               CASE WHEN NOT bad_type AND embeds AND NOT embed_ok
                    THEN coalesce(embed_error, 'Unknown error') END
                   AS embedding_error,
               CASE WHEN bad_type THEN NULL
                    WHEN embeds AND embed_ok THEN 1 ELSE 0 END
                   AS stamps_generated_at
        FROM f
    """


SYNTH_RPC_ROWS_SQL = """
    SELECT event_id AS row_id,
           (event_id * 3) % 4 <> 0 AS has_title,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'T' || CAST(event_id % 7 AS VARCHAR) END AS title,
           (event_id * 5) % 3 <> 0 AS has_content,
           'body ' || CAST(event_id % 11 AS VARCHAR) AS content,
           (event_id * 7) % 5 <> 0 AS has_status,
           'published' AS status,
           (event_id * 11) % 4 <> 0 AS has_visibility,
           'public' AS visibility,
           (event_id * 13) % 3 <> 0 AS has_embedding_status,
           'success' AS embedding_status,
           (event_id * 17) % 6 <> 0 AS has_view_count,
           CAST(event_id % 50 AS BIGINT) AS view_count,
           (event_id * 19) % 4 <> 0 AS has_workspace,
           'ws-' || CAST(event_id % 5 AS VARCHAR) AS workspace_id,
           'ws-req-' || CAST(event_id % 3 AS VARCHAR)
               AS request_workspace,
           (event_id * 23) % 2 = 0 AS has_similarity,
           CAST((event_id * 29) % 100 AS DOUBLE) / 100 AS similarity
    FROM events
"""


def validate_results_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_RPC_ROWS_SQL})
        SELECT row_id,
               CASE WHEN has_title THEN title ELSE 'Untitled' END
                   AS title,
               CASE WHEN has_content THEN content ELSE '' END
                   AS content,
               CASE WHEN has_status THEN status ELSE 'draft' END
                   AS status,
               CASE WHEN has_visibility THEN visibility
                    ELSE 'workspace' END AS visibility,
               CASE WHEN has_embedding_status THEN embedding_status
                    ELSE 'pending' END AS embedding_status,
               CAST(CASE WHEN has_view_count THEN view_count
                    ELSE 0 END AS BIGINT) AS view_count,
               CASE WHEN has_workspace THEN workspace_id
                    ELSE request_workspace END AS workspace_id,
               CASE WHEN has_similarity THEN similarity END
                   AS similarity
        FROM r
    """


SYNTH_SEARCH_REQUESTS_SQL = """
    SELECT event_id AS request_id,
           CASE event_id % 3 WHEN 0 THEN 'semantic'
                WHEN 1 THEN 'full_text' ELSE 'hybrid' END
               AS search_type,
           event_id % 11 = 0 AS is_admin_caller,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'cat-' || CAST(event_id % 3 AS VARCHAR) END
               AS category_id,
           CASE WHEN (event_id * 3) % 4 = 0 THEN NULL
                WHEN (event_id * 3) % 4 = 1 THEN ''
                ELSE 'slug-' || CAST(event_id % 2 AS VARCHAR) END
               AS category_slug,
           CASE WHEN (event_id * 7) % 3 = 0 THEN 'faq' END
               AS price_doc_type
    FROM events
"""


def rpc_args_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_SEARCH_REQUESTS_SQL})
        SELECT request_id,
               CASE WHEN search_type = 'semantic' THEN 'kb_match_docs'
                    ELSE 'kb_search_docs' END AS rpc,
               CAST(is_admin_caller AS INT) AS include_private,
               CAST(category_id IS NOT NULL AND category_id <> ''
                    AS INT) AS sends_category_id,
               CAST(category_slug IS NOT NULL AND category_slug <> ''
                    AS INT) AS sends_category_slug,
               CAST(price_doc_type IS NOT NULL AND price_doc_type <> ''
                    AS INT) AS sends_price_doc_type
        FROM r
    """
