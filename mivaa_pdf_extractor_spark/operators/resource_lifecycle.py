"""Resource-lifecycle folds (app/utils/resource_manager.py).

Two deterministic pieces of the reference's event-based cleanup
system (the filesystem deletes themselves are out of scope):

1. ``fold_resources`` — the per-resource state machine
   (resource_manager.py:56-175).  Event kinds: ``register`` (with an
   optional job), ``mark_in_use``, ``release``, ``sweep``
   (cleanup_ready_resources), ``shutdown`` (shutdown_cleanup_all).
   Pinned semantics (file:line):

   * Re-registering an existing id only ADDS the job to ``in_use_by``
     and does NOT reset the state (:79-84) — a resource already in
     READY_FOR_CLEANUP that gains a new user KEEPS ready state, so the
     next sweep deletes it out from under the job (pin).
   * ``register`` without a job leaves ``in_use_by`` empty but state
     CREATED — the ready sweep only matches READY_FOR_CLEANUP
     (:141-144), so an ownerless resource is never swept except at
     shutdown (orphan by construction — pin).
   * ``release`` uses ``set.discard`` (:124): releasing a job that
     never held the resource is a silent no-op, BUT the emptiness
     check still runs — releasing an unknown job from an idle CREATED
     resource flips it to READY_FOR_CLEANUP (pin).
   * ``mark_in_use`` on a READY_FOR_CLEANUP resource rescues it back
     to IN_USE (:104-112); on an unknown id it is a warn-no-op.
   * ``sweep`` removes READY rows from tracking; ``shutdown`` removes
     ALL rows regardless of ``in_use_by`` (:158-175).

   Sequential per resource -> ``applyInPandas`` replay (the AIMD /
   circuit-breaker pattern) with a recursive-CTE DuckDB twin carrying
   (alive, state, user-set-as-sorted-csv).  Job sets are tiny (the
   reference tracks per-process handles), so the csv-set encoding is
   bounded.

2. ``janitor_sweep`` — ``sweep_orphan_temp_pdfs``
   (resource_manager.py:222-289): pure classification of a /tmp
   listing.  Pins: the name gate is (startswith 'tmp' AND endswith
   '.pdf') OR startswith 'pdf_processor_'; ``scanned`` counts only
   gate matches; ``mtime > cutoff`` STRICT means a file exactly at
   the cutoff IS deleted (pin); stat errors count in ``errors`` and
   short-circuit before the age check.  Projection + one rollup agg.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

CREATED, IN_USE, READY = "created", "in_use", "ready_for_cleanup"


def fold_resources(events: DataFrame) -> DataFrame:
    """``events``: (resource, event_ord long, kind, job nullable).
    One output row per event: post-event (alive, state, n_users,
    users csv, acted flag — whether a sweep/shutdown removed it)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_ord")
        alive, state, users = False, None, set()
        out = []
        for r in pdf.itertuples():
            kind, job = r.kind, r.job
            acted = False
            if kind == "register":
                if alive:
                    if job is not None:
                        users.add(job)     # state NOT reset (pin)
                else:
                    alive, state, users = True, CREATED, set()
                    if job is not None:
                        users.add(job)
            elif kind == "mark_in_use":
                if alive:
                    state = IN_USE
                    users.add(job)
            elif kind == "release":
                if alive:
                    users.discard(job)
                    if not users:
                        state = READY
            elif kind == "sweep":
                if alive and state == READY:
                    alive, state, users = False, None, set()
                    acted = True
            elif kind == "shutdown":
                if alive:
                    alive, state, users = False, None, set()
                    acted = True
            out.append((r.resource, int(r.event_ord), kind, job, alive,
                        state, len(users), ",".join(sorted(users)),
                        acted))
        return pd.DataFrame(out, columns=[
            "resource", "event_ord", "kind", "job", "alive", "state",
            "n_users", "users", "cleaned"])

    return (events.repartition("resource")
            .groupBy("resource").applyInPandas(
                lambda _, g: run(g),
                "resource string, event_ord long, kind string, "
                "job string, alive boolean, state string, "
                "n_users int, users string, cleaned boolean"))


def janitor_sweep(listing: DataFrame, now: int,
                  max_age_hours: int = 12) -> DataFrame:
    """Per-file disposition + one rollup row mirroring the returned
    counts dict (scanned / deleted / errors / skipped_recent)."""
    cutoff = now - max_age_hours * 3600
    name = F.col("name")
    matches = ((name.startswith("tmp") & name.endswith(".pdf"))
               | name.startswith("pdf_processor_"))
    disp = (F.when(~matches, "ignored")
            .when(F.col("stat_error"), "error")
            .when(F.col("mtime") > cutoff, "skipped_recent")
            .otherwise("deleted"))
    per_file = listing.select("name", disp.alias("disposition"))
    d = F.col("disposition")
    return per_file.agg(
        F.sum((d != "ignored").cast("long")).alias("scanned"),
        F.sum((d == "deleted").cast("long")).alias("deleted"),
        F.sum((d == "error").cast("long")).alias("errors"),
        F.sum((d == "skipped_recent").cast("long"))
        .alias("skipped_recent"))


def janitor_dispositions(listing: DataFrame, now: int,
                         max_age_hours: int = 12) -> DataFrame:
    """Per-file rows (the contract query keeps the finer grain)."""
    cutoff = now - max_age_hours * 3600
    name = F.col("name")
    matches = ((name.startswith("tmp") & name.endswith(".pdf"))
               | name.startswith("pdf_processor_"))
    return listing.select(
        "name",
        (F.when(~matches, "ignored")
         .when(F.col("stat_error"), "error")
         .when(F.col("mtime") > cutoff, "skipped_recent")
         .otherwise("deleted")).alias("disposition"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_resource_events(events: DataFrame) -> DataFrame:
    """20 resources x 30 events covering every pin: jobless registers,
    re-registers onto READY rows, discards of never-holders, rescue
    mark_in_use, interleaved sweeps and a final shutdown."""
    e = events.select((F.col("event_id") % 20).alias("r")).distinct()
    seq = e.select("r", F.explode(F.sequence(F.lit(0), F.lit(29)))
                   .alias("k"))
    r, k = F.col("r"), F.col("k")
    kind = (F.when(k == 29, "shutdown")
            .when((k % 9) == 8, "sweep")
            .when((k % 9) == 0, "register")
            .when((k % 9).isin(1, 2), "mark_in_use")
            .when((k % 9).isin(3, 4, 5), "release")
            .when((k % 9) == 6, "register")
            .otherwise("mark_in_use"))
    job = (F.when(kind.isin("register")
                  & ((r + k) % 4 == 0), F.lit(None).cast("string"))
           .when(kind == "sweep", F.lit(None).cast("string"))
           .when(kind == "shutdown", F.lit(None).cast("string"))
           .otherwise(F.concat(F.lit("job"),
                               ((r * 3 + k) % 5).cast("string"))))
    return seq.select(
        F.concat(F.lit("res"), r.cast("string")).alias("resource"),
        (r * 100 + k).cast("long").alias("event_ord"),
        kind.alias("kind"), job.alias("job"))


SYNTH_RESOURCE_SQL = """
    SELECT 'res' || CAST(r AS VARCHAR) AS resource,
           CAST(r * 100 + k AS BIGINT) AS event_ord,
           kind,
           CASE WHEN kind IN ('sweep', 'shutdown') THEN NULL
                WHEN kind = 'register' AND (r + k) % 4 = 0 THEN NULL
                ELSE 'job' || CAST((r * 3 + k) % 5 AS VARCHAR)
           END AS job
    FROM (
      SELECT r, k,
             CASE WHEN k = 29 THEN 'shutdown'
                  WHEN k % 9 = 8 THEN 'sweep'
                  WHEN k % 9 = 0 THEN 'register'
                  WHEN k % 9 IN (1, 2) THEN 'mark_in_use'
                  WHEN k % 9 IN (3, 4, 5) THEN 'release'
                  WHEN k % 9 = 6 THEN 'register'
                  ELSE 'mark_in_use' END AS kind
      FROM (SELECT DISTINCT event_id % 20 AS r FROM events),
           UNNEST(generate_series(0, 29)) AS u(k))
"""


def duck_resources_sql() -> str:
    """Recursive twin over CTE ``res_events``; yields ``res_state``.
    The user set rides as a sorted csv via list aggregation."""
    # set ops in SQL: users as a DuckDB LIST kept sorted+distinct
    return """
            res_numbered AS (
              SELECT *, row_number() OVER (PARTITION BY resource
                  ORDER BY event_ord) AS rn
              FROM res_events),
            res_state AS (
              SELECT resource, event_ord, kind, job, rn,
                     kind = 'register' AS alive,
                     CASE WHEN kind = 'register'
                          THEN 'created' END AS state,
                     CASE WHEN kind = 'register' AND job IS NOT NULL
                          THEN [job] ELSE [] END AS user_list,
                     FALSE AS cleaned
              FROM res_numbered WHERE rn = 1
              UNION ALL
              SELECT n.resource, n.event_ord, n.kind, n.job, n.rn,
                     CASE
                       WHEN n.kind = 'register' THEN TRUE
                       WHEN n.kind = 'sweep' THEN
                         s.alive AND s.state != 'ready_for_cleanup'
                       WHEN n.kind = 'shutdown' THEN FALSE
                       ELSE s.alive END AS alive,
                     CASE
                       WHEN n.kind = 'register' THEN
                         CASE WHEN s.alive THEN s.state
                              ELSE 'created' END
                       WHEN n.kind = 'mark_in_use' THEN
                         CASE WHEN s.alive THEN 'in_use'
                              ELSE s.state END
                       WHEN n.kind = 'release' THEN
                         CASE WHEN NOT s.alive THEN s.state
                              WHEN len(list_filter(s.user_list,
                                       x -> x != n.job)) = 0
                              THEN 'ready_for_cleanup'
                              ELSE s.state END
                       WHEN n.kind = 'sweep' THEN
                         CASE WHEN s.alive
                                   AND s.state = 'ready_for_cleanup'
                              THEN NULL ELSE s.state END
                       ELSE NULL END AS state,
                     CASE
                       WHEN n.kind = 'register' THEN
                         CASE WHEN s.alive THEN
                           CASE WHEN n.job IS NOT NULL
                                AND NOT list_contains(s.user_list,
                                                      n.job)
                                THEN list_sort(list_append(
                                       s.user_list, n.job))
                                ELSE s.user_list END
                         WHEN n.job IS NOT NULL THEN [n.job]
                         ELSE [] END
                       WHEN n.kind = 'mark_in_use' THEN
                         CASE WHEN NOT s.alive THEN s.user_list
                              WHEN list_contains(s.user_list, n.job)
                              THEN s.user_list
                              ELSE list_sort(list_append(s.user_list,
                                                         n.job)) END
                       WHEN n.kind = 'release' THEN
                         CASE WHEN s.alive THEN
                           list_filter(s.user_list, x -> x != n.job)
                         ELSE s.user_list END
                       WHEN n.kind = 'sweep' THEN
                         CASE WHEN s.alive
                                   AND s.state = 'ready_for_cleanup'
                              THEN [] ELSE s.user_list END
                       ELSE [] END AS user_list,
                     CASE
                       WHEN n.kind = 'sweep' THEN
                         s.alive AND s.state = 'ready_for_cleanup'
                       WHEN n.kind = 'shutdown' THEN s.alive
                       ELSE FALSE END AS cleaned
              FROM res_state s JOIN res_numbered n
                ON n.resource = s.resource AND n.rn = s.rn + 1)"""


def synth_tmp_listing(events: DataFrame, now: int) -> DataFrame:
    e = F.col("event_id")
    name = (F.when(e % 6 == 0,
                   F.concat(F.lit("tmp"), e.cast("string"),
                            F.lit(".pdf")))
            .when(e % 6 == 1,
                  F.concat(F.lit("pdf_processor_"), e.cast("string")))
            .when(e % 6 == 2, F.lit("tmp.pdf"))      # overlap edge
            .when(e % 6 == 3,
                  F.concat(F.lit("tmp"), e.cast("string"),
                           F.lit(".txt")))           # gate miss
            .when(e % 6 == 4,
                  F.concat(F.lit("other_"), e.cast("string"),
                           F.lit(".pdf")))           # gate miss
            .otherwise(F.concat(F.lit("tmpold"), e.cast("string"),
                                F.lit(".pdf"))))
    # ages straddle the 12 h cutoff incl. the exact boundary
    mtime = (F.lit(now) - (e % 30) * 3600
             - F.when(e % 5 == 0, 0).otherwise(1))
    return events.select(
        name.alias("name"), mtime.cast("long").alias("mtime"),
        (e % 19 == 0).alias("stat_error"))


def synth_tmp_listing_sql(now: int) -> str:
    return f"""
        SELECT CASE event_id % 6
                 WHEN 0 THEN 'tmp' || CAST(event_id AS VARCHAR)
                             || '.pdf'
                 WHEN 1 THEN 'pdf_processor_'
                             || CAST(event_id AS VARCHAR)
                 WHEN 2 THEN 'tmp.pdf'
                 WHEN 3 THEN 'tmp' || CAST(event_id AS VARCHAR)
                             || '.txt'
                 WHEN 4 THEN 'other_' || CAST(event_id AS VARCHAR)
                             || '.pdf'
                 ELSE 'tmpold' || CAST(event_id AS VARCHAR) || '.pdf'
               END AS name,
               CAST({now} - (event_id % 30) * 3600
                    - CASE WHEN event_id % 5 = 0 THEN 0 ELSE 1 END
                    AS BIGINT) AS mtime,
               event_id % 19 = 0 AS stat_error
        FROM events
    """


def janitor_sql(now: int, max_age_hours: int = 12) -> str:
    cutoff = now - max_age_hours * 3600
    return f"""
        WITH listing AS ({synth_tmp_listing_sql(now)}),
        disp AS (
          SELECT name,
                 CASE WHEN NOT ((name LIKE 'tmp%'
                                 AND name LIKE '%.pdf')
                                OR name LIKE 'pdf\\_processor\\_%'
                                   ESCAPE '\\')
                      THEN 'ignored'
                      WHEN stat_error THEN 'error'
                      WHEN mtime > {cutoff} THEN 'skipped_recent'
                      ELSE 'deleted' END AS disposition
          FROM listing)
        SELECT name, disposition FROM disp
    """
