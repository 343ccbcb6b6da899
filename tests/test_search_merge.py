"""Pins saved-search deduplication (operators/search_merge.py) to
search_deduplication_service.py. Hand-verified against the reference's
Python semantics."""

from pyspark.sql import functions as F, types as T

from mivaa_pdf_extractor_spark.operators import search_merge as sm


def _norm(spark, q):
    df = spark.createDataFrame([(q,)], "q string")
    return df.select(sm.normalize_query_col(
        F.col("q")).alias("n")).collect()[0]["n"]


def test_normalize_query_replacements_and_double_space_quirk(spark):
    assert _norm(spark, "Gray   Flooring Tiles") == "grey floor tile"
    # phrase removal runs AFTER whitespace collapse, so the hole keeps
    # a double space (only the outer strip runs at the end) — quirk
    assert _norm(spark, "x i need y") == "x  y"
    assert _norm(spark, "I need grey tiles") == "grey tile"
    # cascading: "flooring" -> "floor" before "tiles" -> "tile"
    assert _norm(spark, "looking for gray flooring") == "grey floor"


def _verdict(spark, ctx_e, ctx_n, attrs_e, attrs_n,
             colors_e=None, colors_n=None, price_e=None, price_n=None):
    def ents(d):
        if not d:
            return F.expr("map()").cast("map<string,string>")
        return F.map_from_entries(F.array(*[
            F.struct(F.lit(k).alias("key"), F.lit(v).alias("value"))
            for k, v in d]))
    def arr(v, typ):
        if v is None:
            return F.lit(None).cast(f"array<{typ}>")
        return (F.array(*[F.lit(x) for x in v]) if v
                else F.expr("array()").cast(f"array<{typ}>"))
    df = spark.range(1)
    v = sm.should_merge(
        F.lit(ctx_e).cast("string"), F.lit(ctx_n).cast("string"),
        ents(attrs_e), ents(attrs_n),
        arr(colors_e, "string"), arr(colors_n, "string"),
        arr(price_e, "double"), arr(price_n, "double"))
    r = df.select(v.alias("v")).collect()[0]["v"]
    return (r["can_merge"], r["reason"])


def test_context_gate_with_null_merge(spark):
    assert _verdict(spark, "floor", "wall", [], []) \
        == (False, "Different application context")
    assert _verdict(spark, None, None, [], []) \
        == (True, "Compatible search - can merge")
    assert _verdict(spark, "floor", None, [], []) \
        == (False, "Different application context")


def test_attr_conflict_order_and_reasons(spark):
    # same-key conflict wins over the exclusive-pair tier, scanned in
    # the EXISTING map's entry order (color before finish here)
    can, reason = _verdict(
        spark, None, None,
        [("color", "grey"), ("finish", "matte"), ("outdoor", "true")],
        [("color", "white"), ("finish", "glossy"), ("indoor", "true")])
    assert (can, reason) == (False, "Conflicting color: grey vs white")
    can, reason = _verdict(
        spark, None, None,
        [("color", "grey"), ("finish", "matte")],
        [("color", "grey"), ("finish", "glossy")])
    assert reason == "Conflicting finish: matte vs glossy"
    # exclusive keys fire when no same-key conflict exists
    can, reason = _verdict(
        spark, None, None, [("outdoor", "true")], [("indoor", "true")])
    assert reason == "Conflicting attributes: outdoor vs indoor"
    # reverse direction: key2 in existing, key1 in new
    can, reason = _verdict(
        spark, None, None, [("indoor", "true")], [("outdoor", "true")])
    assert reason == "Conflicting attributes: indoor vs outdoor"


def test_filter_compatibility_quirks(spark):
    # colors must overlap when both non-empty
    assert _verdict(spark, None, None, [], [],
                    colors_e=["grey"], colors_n=["black"]) \
        == (False, "Incompatible filters")
    # missing priceRange defaults to [0, 10000] → overlaps everything
    assert _verdict(spark, None, None, [], [],
                    price_e=None, price_n=[20.0, 30.0])[0] is True
    # present-but-EMPTY priceRange skips the check (Python truthiness)
    assert _verdict(spark, None, None, [], [],
                    price_e=[], price_n=[20.0, 30.0])[0] is True
    # disjoint ranges are incompatible
    assert _verdict(spark, None, None, [], [],
                    price_e=[100.0, 200.0], price_n=[20.0, 30.0]) \
        == (False, "Incompatible filters")


def test_candidate_join_is_bucketed_not_cross(spark):
    # the candidate plan must join on (user_id, core_material) — no
    # cartesian product anywhere
    schema = ("id long, user_id long, core_material string, "
              "application_context string, "
              "attributes map<string,string>, "
              "filter_colors array<string>, price_range array<double>, "
              "embedding array<double>, query string")
    rows = [(1, 1, "tile", None, {}, [], None, [1.0, 0.0], "a b"),
            (2, 1, "tile", None, {}, [], None, [1.0, 0.0], "a b c")]
    new_df = spark.createDataFrame(rows, schema)
    saved_df = spark.createDataFrame(rows, schema)
    plan = sm.candidate_pairs(
        new_df, saved_df)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    out = sm.find_or_merge(new_df, saved_df).collect()
    acts = {r["new_id"]: r["action"] for r in out}
    # identical embeddings → sim 1.0 → auto-merge both ways
    assert acts == {1: "auto_merge", 2: "auto_merge"}
    # both pick saved id 1 first (sim ties break by id); the
    # more-words query wins, ties keep the existing query
    uq = {r["new_id"]: r["updated_query"] for r in out}
    assert uq[1] == "a b"     # tie (2 words vs 2) → existing
    assert uq[2] == "a b c"   # new 3 words > existing 2
