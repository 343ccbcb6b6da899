"""WebSocket room-membership fold.

Re-expresses ``app/api/websocket_routes.py:35-112``
(``ConnectionManager.connect/disconnect``). The manager keys room SETS
by room and METADATA by connection — and ``disconnect`` removes the
connection only from ``metadata['room']``. Pinned consequences:

- a reconnect to a DIFFERENT room overwrites the metadata but never
  cleans the old room's set, so the connection stays a member of the
  old room FOREVER (leak, pin);
- metadata at a disconnect is simply the room of the immediately
  preceding event IF that event was a connect (any disconnect deletes
  the metadata entry), so a double disconnect is a no-op;
- membership per (conn, room) is therefore last-add-wins over the
  derived add/remove stream — ONE lag + ONE last_value window, no
  state machine.

Emits the final membership per touched (conn, room) + the leak flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ws_room_final(ops: DataFrame) -> DataFrame:
    w = Window.partitionBy("conn_id").orderBy("seq")
    prev_op = F.lag("op").over(w)
    prev_room = F.lag("room").over(w)
    # each event affects at most one room
    affected = (F.when(F.col("op") == "connect", F.col("room"))
                .when((F.col("op") == "disconnect")
                      & (prev_op == "connect"), prev_room))
    is_add = F.col("op") == "connect"
    ev = (ops
          .withColumn("affected_room", affected)
          .withColumn("is_add", is_add)
          .where(F.col("affected_room").isNotNull()))
    w2 = (Window.partitionBy("conn_id", "affected_room").orderBy("seq")
          .rowsBetween(Window.unboundedPreceding,
                       Window.unboundedFollowing))
    final_member = F.last("is_add").over(w2)
    w3 = Window.partitionBy("conn_id").orderBy("seq") \
        .rowsBetween(Window.unboundedPreceding,
                     Window.unboundedFollowing)
    # metadata survives iff the conn's LAST event overall is a connect
    meta_room = F.when(F.last("op").over(w3) == "connect",
                       F.last(F.when(F.col("op") == "connect",
                                     F.col("room")),
                              ignorenulls=True).over(w3))
    # final_member / meta_room are window-constant per group, so
    # first() is deterministic
    out = (ev
           .withColumn("final_member", final_member)
           .withColumn("meta_room", meta_room)
           .groupBy("conn_id", "affected_room")
           .agg(F.first("final_member").alias("member"),
                F.first("meta_room").alias("meta_room_last")))
    return out.select(
        "conn_id",
        F.col("affected_room").alias("room"),
        F.col("member"),
        # leaked: still a member of this room while the metadata
        # points elsewhere (or is gone)
        (F.col("member")
         & (F.col("meta_room_last").isNull()
            | (F.col("meta_room_last") != F.col("affected_room"))))
        .alias("leaked"))


def synth_ws_ops(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        (e % 211).cast("long").alias("conn_id"),
        e.cast("long").alias("seq"),
        F.concat(F.lit("room-"), ((e * 7) % 4).cast("string"))
        .alias("room"),
        F.when((e * 13) % 5 < 3, F.lit("connect"))
        .otherwise(F.lit("disconnect")).alias("op"))


SYNTH_WS_OPS_SQL = """
    SELECT CAST(event_id % 211 AS BIGINT) AS conn_id,
           CAST(event_id AS BIGINT) AS seq,
           'room-' || CAST((event_id * 7) % 4 AS VARCHAR) AS room,
           CASE WHEN (event_id * 13) % 5 < 3 THEN 'connect'
                ELSE 'disconnect' END AS op
    FROM events
"""


def ws_room_sql() -> str:
    return f"""
        WITH o AS ({SYNTH_WS_OPS_SQL}),
        l AS (
          SELECT *,
                 lag(op) OVER (PARTITION BY conn_id ORDER BY seq)
                     AS prev_op,
                 lag(room) OVER (PARTITION BY conn_id ORDER BY seq)
                     AS prev_room
          FROM o),
        ev AS (
          SELECT *,
                 CASE WHEN op = 'connect' THEN room
                      WHEN op = 'disconnect' AND prev_op = 'connect'
                      THEN prev_room END AS affected_room,
                 op = 'connect' AS is_add
          FROM l),
        meta AS (
          SELECT conn_id,
                 CASE WHEN arg_max(op, seq) = 'connect'
                      THEN max_by(room, CASE WHEN op = 'connect'
                                        THEN seq END)
                 END AS meta_room_last
          FROM o GROUP BY conn_id),
        fin AS (
          SELECT conn_id, affected_room,
                 max_by(is_add, seq) AS member
          FROM ev WHERE affected_room IS NOT NULL
          GROUP BY conn_id, affected_room)
        SELECT f.conn_id, f.affected_room AS room, f.member,
               f.member AND (m.meta_room_last IS NULL
                             OR m.meta_room_last <> f.affected_room)
                   AS leaked
        FROM fin f JOIN meta m ON m.conn_id = f.conn_id
    """
