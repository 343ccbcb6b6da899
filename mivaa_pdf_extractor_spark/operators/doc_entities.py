"""Document-entity route/service query folds.

Re-expresses the deterministic query shaping of the document-entities
API (reference ``app/api/document_entities.py``) and the read side of
its service (``app/services/discovery/document_entity_service.py``;
the match/link write side is covered by ``operators/entity_match.py``):

* ``get_document_entities`` (document_entities.py:107-160): workspace
  equality + a truthy-gated filter ladder (entity_type / factory_name
  / factory_group), then Supabase ``.range(offset, offset+limit-1)``
  — INCLUSIVE on BOTH ends (PostgREST range semantics), so the page
  carries exactly ``limit`` rows, not ``limit-1`` (pin). The
  reference applies NO ``.order()`` — page membership rides the DB's
  unspecified default order; canonicalized here (documented) by
  ``entity_id`` ascending so the contract is deterministic.
* ``get_entities_for_product`` (document_entity_service.py:501-547):
  reads ``product_document_relationships`` with an EMBEDDED
  ``document_entities(*)`` select. The ``entity_type`` filter is
  applied to the EMBEDDED resource
  (``.eq("document_entities.entity_type", ...)``) — PostgREST
  embedded filters NULL OUT the embed but DO NOT drop the parent
  row, and the service then builds a DocumentEntity from
  ``row.get("document_entities", {})``: every non-matching (or
  dangling) relationship emits a PHANTOM entity whose fields are all
  None with ``page_range=[]`` and ``metadata={}`` (pin — a
  type-filtered query returns one empty entity per filtered-out
  relationship, it does not shrink). The route layer
  (document_entities.py:193-227) then drops ``id``/``created_at``
  from the dict while its response_model requires both — on any
  non-empty result the endpoint fails response validation; the
  service-level projection modeled here is the well-defined part.
* ``get_entities_by_factory`` (document_entity_service.py:549-596):
  plain equality ladder (factory_name + optional entity_type) with
  the same ``.get``-defaulted projection.

Scale: the admin page is one windowed scan; the product lookup is an
equi-join on entity_id (relationship side bounded per product);
nothing shuffles row content beyond the join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_ENTITY_COLS = ("entity_type", "name", "description", "factory_name",
                "factory_group", "manufacturer")


def entities_admin_query(entities: DataFrame, *, workspace_id: int,
                         entity_type: str | None = None,
                         factory_name: str | None = None,
                         factory_group: str | None = None,
                         limit: int = 100,
                         offset: int = 0) -> DataFrame:
    """The admin listing page: filter ladder + inclusive range."""
    f = entities.where(F.col("workspace_id") == workspace_id)
    if entity_type:
        f = f.where(F.col("entity_type") == entity_type)
    if factory_name:
        f = f.where(F.col("factory_name") == factory_name)
    if factory_group:
        f = f.where(F.col("factory_group") == factory_group)
    w = Window.orderBy("entity_id")        # canonicalized page order
    return (f.withColumn("rk", F.row_number().over(w))
            # .range(offset, offset+limit-1) is inclusive both ends
            .where((F.col("rk") > offset)
                   & (F.col("rk") <= offset + limit))
            .select("entity_id", "entity_type", "name", "factory_name",
                    "factory_group",
                    F.col("rk").cast("int").alias("rk")))


def entities_for_product(rels: DataFrame, entities: DataFrame, *,
                         entity_type: str | None = None) -> DataFrame:
    """One row per relationship of the product — a non-matching
    embedded-filter entity (or a dangling entity_id) survives as a
    phantom all-None row with page_range=[] (pin)."""
    ent = entities
    if entity_type:
        ent = ent.where(F.col("entity_type") == entity_type)
    ent = ent.select(
        F.col("entity_id").alias("_eid"),
        *[F.col(c).alias(f"_{c}") for c in _ENTITY_COLS],
        F.col("page_range").alias("_page_range"))
    j = rels.join(ent, rels["entity_id"] == ent["_eid"], "left")
    return j.select(
        "rel_id", "product_id",
        *[F.col(f"_{c}").alias(c) for c in _ENTITY_COLS],
        # .get("page_range", []) — absent embed defaults to empty list
        F.coalesce(F.col("_page_range"),
                   F.array().cast("array<int>")).alias("page_range"))


def entities_by_factory(entities: DataFrame, *, factory_name: str,
                        entity_type: str | None = None) -> DataFrame:
    f = entities.where(F.col("factory_name") == factory_name)
    if entity_type:
        f = f.where(F.col("entity_type") == entity_type)
    return f.select("entity_id", *_ENTITY_COLS, "page_range")


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

_TYPES = ("certificate", "logo", "specification", "marketing",
          "bank_statement")


def synth_entities(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("entity_id"),
        (e % 3).cast("int").alias("workspace_id"),
        F.element_at(F.array(*[F.lit(t) for t in _TYPES]),
                     (e % 5 + 1).cast("int")).alias("entity_type"),
        F.when(e % 17 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("Entity "), (e % 29).cast("string")))
        .alias("name"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("desc "), (e % 11).cast("string")))
        .alias("description"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Factory "), (e % 6).cast("string")))
        .alias("factory_name"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Group "), (e % 3).cast("string")))
        .alias("factory_group"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Maker "), (e % 4).cast("string")))
        .alias("manufacturer"),
        F.when(e % 9 == 0, F.array().cast("array<int>"))
        .otherwise(F.sequence((e % 40).cast("int"),
                              (e % 40 + e % 3).cast("int")))
        .alias("page_range"))


SYNTH_ENTITIES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS entity_id,
           CAST(event_id % 3 AS INT) AS workspace_id,
           ['certificate', 'logo', 'specification', 'marketing',
            'bank_statement'][CAST(event_id % 5 + 1 AS INT)]
               AS entity_type,
           CASE WHEN event_id % 17 = 0 THEN ''
                ELSE 'Entity ' || CAST(event_id % 29 AS VARCHAR) END
               AS name,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE 'desc ' || CAST(event_id % 11 AS VARCHAR) END
               AS description,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE 'Factory ' || CAST(event_id % 6 AS VARCHAR) END
               AS factory_name,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE 'Group ' || CAST(event_id % 3 AS VARCHAR) END
               AS factory_group,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE 'Maker ' || CAST(event_id % 4 AS VARCHAR) END
               AS manufacturer,
           CASE WHEN event_id % 9 = 0 THEN CAST([] AS INT[])
                ELSE CAST(range(CAST(event_id % 40 AS INT),
                                CAST(event_id % 40 + event_id % 3
                                     AS INT) + 1) AS INT[]) END
               AS page_range
    FROM events
"""


def synth_rels(events: DataFrame) -> DataFrame:
    """Relationship rows; every 13th points at a dangling entity_id."""
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("rel_id"),
        (e % 8).cast("long").alias("product_id"),
        F.when(e % 13 == 0, -e).otherwise((e * 7) % 500)
        .cast("long").alias("entity_id"))


SYNTH_RELS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS rel_id,
           CAST(event_id % 8 AS BIGINT) AS product_id,
           CAST(CASE WHEN event_id % 13 = 0 THEN -event_id
                ELSE (event_id * 7) % 500 END AS BIGINT) AS entity_id
    FROM events
"""


def admin_query_sql(*, workspace_id: int,
                    entity_type: str | None = None,
                    factory_name: str | None = None,
                    factory_group: str | None = None,
                    limit: int = 100, offset: int = 0) -> str:
    conds = [f"workspace_id = {workspace_id}"]
    if entity_type:
        conds.append(f"entity_type = '{entity_type}'")
    if factory_name:
        conds.append(f"factory_name = '{factory_name}'")
    if factory_group:
        conds.append(f"factory_group = '{factory_group}'")
    where = " AND ".join(conds)
    return f"""
        WITH x AS ({SYNTH_ENTITIES_SQL}),
        f AS (SELECT * FROM x WHERE {where}),
        r AS (SELECT *, row_number() OVER (ORDER BY entity_id) AS rk
              FROM f)
        SELECT entity_id, entity_type, name, factory_name,
               factory_group, CAST(rk AS INT) AS rk
        FROM r WHERE rk > {offset} AND rk <= {offset} + {limit}
    """


def for_product_sql(*, entity_type: str | None = None) -> str:
    tcond = (f"AND x.entity_type = '{entity_type}'"
             if entity_type else "")
    return f"""
        WITH x AS ({SYNTH_ENTITIES_SQL}),
        r AS ({SYNTH_RELS_SQL})
        SELECT r.rel_id, r.product_id, x.entity_type, x.name,
               x.description, x.factory_name, x.factory_group,
               x.manufacturer,
               coalesce(x.page_range, CAST([] AS INT[])) AS page_range
        FROM r LEFT JOIN x ON r.entity_id = x.entity_id {tcond}
    """


def by_factory_sql(*, factory_name: str,
                   entity_type: str | None = None) -> str:
    tcond = (f"AND entity_type = '{entity_type}'" if entity_type
             else "")
    return f"""
        WITH x AS ({SYNTH_ENTITIES_SQL})
        SELECT entity_id, entity_type, name, description,
               factory_name, factory_group, manufacturer, page_range
        FROM x WHERE factory_name = '{factory_name}' {tcond}
    """
