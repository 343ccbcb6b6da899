"""AI-model tracking rollups (app/services/core/ai_model_tracker.py)
as native Spark aggregations over a calls ledger.

Three grains, each a single groupBy:

- job summary (:149-185): totals, distinct models, success-rate %
  (round 2), avg latency (round 2), token sums with ``or 0``;
- stage details (:187-216): per (job, stage) — ``models_used`` preserves
  FIRST-SEEN call order (the running list appends on first occurrence,
  :126-128 — pin, vs. the unordered sets elsewhere), success rate and avg
  latency round 2, ``avg_confidence`` is the mean of non-None scores
  (a 0.0 confidence IS included, while a 0 token count is truthy-skipped
  in the stage accumulators — pinned asymmetry; for integer token sums
  the truthy skip is value-equivalent to ``or 0``), round 3;
- model stats (:218-242): per (job, model) — counts, rates, and
  ``stages_used``/``tasks`` as Python sets whose iteration order is
  nondeterministic — canonicalized to sorted joins (documented).

Python ``round(x, 2)`` is HALF_EVEN; both engines use the lockstep
floor(x·100 + 0.5) form (HALF_UP at exact ties; pytest pins true Python
rounding on non-tie fixtures).

Scale: one exchange per grain on (job_id[, stage|model]); first-seen
ordering is a min-over-call_ord per model inside the aggregate, not a
sort of the calls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _r2(c: Column) -> Column:
    return F.floor(c * 100 + F.lit(0.5)) / 100


def _r3(c: Column) -> Column:
    return F.floor(c * 1000 + F.lit(0.5)) / 1000


def job_summary(calls: DataFrame) -> DataFrame:
    """get_job_summary (:149-185) per job_id; ``models_used`` is a set in
    the reference — canonicalized to a sorted join."""
    ok = F.col("success")
    total = F.count(F.lit(1))
    succ = F.count(F.when(ok, 1))
    lat = F.sum("latency_ms")
    out = calls.groupBy("job_id").agg(
        total.alias("total_ai_calls"),
        succ.alias("successful_calls"),
        (total - succ).alias("failed_calls"),
        _r2(succ.cast("double") / total * 100).alias("success_rate_percent"),
        F.array_join(F.array_sort(F.collect_set("model_name")), ",")
        .alias("models_used"),
        lat.alias("total_latency_ms"),
        _r2(lat.cast("double") / total).alias("avg_latency_ms"),
        F.sum("items_processed").alias("total_items_processed"),
        F.sum(F.coalesce(F.col("input_tokens"), F.lit(0)))
        .alias("total_input_tokens"),
        F.sum(F.coalesce(F.col("output_tokens"), F.lit(0)))
        .alias("total_output_tokens"))
    return out.withColumn(
        "total_tokens",
        F.col("total_input_tokens") + F.col("total_output_tokens"))


def stage_details(calls: DataFrame) -> DataFrame:
    """get_stage_details (:187-216) per (job_id, stage): first-seen model
    order, round-2 rates, round-3 confidence mean incl. 0.0 scores."""
    first_seen = (calls.groupBy("job_id", "stage", "model_name")
                  .agg(F.min("call_ord").alias("_first")))
    models = (first_seen.groupBy("job_id", "stage")
              .agg(F.array_join(
                  F.transform(
                      F.array_sort(F.collect_list(
                          F.struct(F.col("_first"), F.col("model_name")))),
                      lambda s: s.getField("model_name")), ",")
                  .alias("models_used")))
    ok = F.col("success")
    total = F.count(F.lit(1))
    succ = F.count(F.when(ok, 1))
    lat = F.sum("latency_ms")
    conf_n = F.count("confidence_score")
    agg = calls.groupBy("job_id", "stage").agg(
        total.alias("total_calls"),
        succ.alias("successful_calls"),
        (total - succ).alias("failed_calls"),
        _r2(succ.cast("double") / total * 100).alias("success_rate_percent"),
        lat.alias("total_latency_ms"),
        _r2(lat.cast("double") / total).alias("avg_latency_ms"),
        F.sum("items_processed").alias("total_items_processed"),
        _r3(F.coalesce(F.sum("confidence_score") / conf_n, F.lit(0.0)))
        .alias("avg_confidence"),
        F.sum(F.when(F.coalesce(F.col("input_tokens"), F.lit(0)) != 0,
                     F.col("input_tokens")).otherwise(F.lit(0)))
        .alias("total_input_tokens"),
        F.sum(F.when(F.coalesce(F.col("output_tokens"), F.lit(0)) != 0,
                     F.col("output_tokens")).otherwise(F.lit(0)))
        .alias("total_output_tokens"))
    return agg.join(models, ["job_id", "stage"])


def model_stats(calls: DataFrame) -> DataFrame:
    """get_model_stats (:218-242) per (job_id, model_name); stages/tasks
    sets canonicalized sorted."""
    ok = F.col("success")
    total = F.count(F.lit(1))
    succ = F.count(F.when(ok, 1))
    lat = F.sum("latency_ms")
    return calls.groupBy("job_id", F.col("model_name").alias("model")).agg(
        total.alias("total_calls"),
        succ.alias("successful_calls"),
        (total - succ).alias("failed_calls"),
        _r2(succ.cast("double") / total * 100).alias("success_rate_percent"),
        lat.alias("total_latency_ms"),
        _r2(lat.cast("double") / total).alias("avg_latency_ms"),
        F.sum("items_processed").alias("total_items_processed"),
        F.array_join(F.array_sort(F.collect_set("stage")), ",")
        .alias("stages_used"),
        F.array_join(F.array_sort(F.collect_set("task")), ",")
        .alias("tasks"))


# ---------------------------------------------------------------------------
# synthesizer + DuckDB twins
# ---------------------------------------------------------------------------

MODELS = ("Anthropic", "SLIG", "Voyage", "OpenAI")
STAGES = ("classification", "boundary_detection", "embedding",
          "validation", "ocr")
TASKS = ("product_classification", "image_embedding", "text_embedding",
         "boundary_scan", "consensus", "page_ocr")


def synth_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    midx = (F.floor(e / 8) * 7) % 4  # varies WITHIN a job (job = e % 8)
    mcol = F.lit(MODELS[0])
    for i, m in enumerate(MODELS[1:], 1):
        mcol = F.when(midx == i, F.lit(m)).otherwise(mcol)
    scol = F.lit(STAGES[0])
    for i, s in enumerate(STAGES[1:], 1):
        scol = F.when((e * 11) % 5 == i, F.lit(s)).otherwise(scol)
    tcol = F.lit(TASKS[0])
    for i, t in enumerate(TASKS[1:], 1):
        tcol = F.when((e * 13) % 6 == i, F.lit(t)).otherwise(tcol)
    conf = (F.when(e % 9 == 0, F.lit(None).cast("double"))
            .when(e % 9 == 1, F.lit(0.0))
            .otherwise(((e * 17) % 64).cast("double") / 64))
    itok = (F.when(e % 6 == 0, F.lit(None).cast("long"))
            .when(e % 6 == 1, F.lit(0))
            .otherwise((e % 900).cast("long")))
    otok = F.when(e % 5 == 0, F.lit(None).cast("long")) \
        .otherwise((e % 300).cast("long"))
    return events.select(
        (e % 8).alias("job_id"), e.alias("call_ord"),
        mcol.alias("model_name"), scol.alias("stage"), tcol.alias("task"),
        (50 + e % 400).cast("long").alias("latency_ms"),
        (e % 20).cast("long").alias("items_processed"),
        itok.alias("input_tokens"), otok.alias("output_tokens"),
        (e % 7 != 0).alias("success"), conf.alias("confidence_score"))


SYNTH_CALLS_SQL = """
    SELECT event_id % 8 AS job_id, event_id AS call_ord,
           CASE (floor(event_id / 8) * 7) % 4
                WHEN 1 THEN 'SLIG' WHEN 2 THEN 'Voyage'
                WHEN 3 THEN 'OpenAI' ELSE 'Anthropic' END AS model_name,
           CASE (event_id * 11) % 5 WHEN 1 THEN 'boundary_detection'
                WHEN 2 THEN 'embedding' WHEN 3 THEN 'validation'
                WHEN 4 THEN 'ocr' ELSE 'classification' END AS stage,
           CASE (event_id * 13) % 6 WHEN 1 THEN 'image_embedding'
                WHEN 2 THEN 'text_embedding' WHEN 3 THEN 'boundary_scan'
                WHEN 4 THEN 'consensus' WHEN 5 THEN 'page_ocr'
                ELSE 'product_classification' END AS task,
           CAST(50 + event_id % 400 AS BIGINT) AS latency_ms,
           CAST(event_id % 20 AS BIGINT) AS items_processed,
           CAST(CASE WHEN event_id % 6 = 0 THEN NULL
                     WHEN event_id % 6 = 1 THEN 0
                     ELSE event_id % 900 END AS BIGINT) AS input_tokens,
           CAST(CASE WHEN event_id % 5 = 0 THEN NULL
                     ELSE event_id % 300 END AS BIGINT) AS output_tokens,
           event_id % 7 <> 0 AS success,
           CASE WHEN event_id % 9 = 0 THEN NULL
                WHEN event_id % 9 = 1 THEN 0.0
                ELSE CAST((event_id * 17) % 64 AS DOUBLE) / 64 END
               AS confidence_score
    FROM events
"""


def job_summary_sql() -> str:
    return f"""
        WITH c AS ({SYNTH_CALLS_SQL}),
        a AS (
          SELECT job_id, count(*) AS total_ai_calls,
                 count(*) FILTER (WHERE success) AS successful_calls,
                 sum(latency_ms) AS total_latency_ms,
                 sum(items_processed) AS total_items_processed,
                 sum(coalesce(input_tokens, 0)) AS total_input_tokens,
                 sum(coalesce(output_tokens, 0)) AS total_output_tokens,
                 array_to_string(list_sort(list(DISTINCT model_name)), ',')
                     AS models_used
          FROM c GROUP BY job_id)
        SELECT job_id, CAST(total_ai_calls AS BIGINT) AS total_ai_calls,
               CAST(successful_calls AS BIGINT) AS successful_calls,
               CAST(total_ai_calls - successful_calls AS BIGINT)
                   AS failed_calls,
               floor(CAST(successful_calls AS DOUBLE) / total_ai_calls
                     * 100 * 100 + 0.5) / 100 AS success_rate_percent,
               models_used,
               CAST(total_latency_ms AS BIGINT) AS total_latency_ms,
               floor(CAST(total_latency_ms AS DOUBLE) / total_ai_calls
                     * 100 + 0.5) / 100 AS avg_latency_ms,
               CAST(total_items_processed AS BIGINT)
                   AS total_items_processed,
               CAST(total_input_tokens AS BIGINT) AS total_input_tokens,
               CAST(total_output_tokens AS BIGINT) AS total_output_tokens,
               CAST(total_input_tokens + total_output_tokens AS BIGINT)
                   AS total_tokens
        FROM a
    """


def stage_details_sql() -> str:
    return f"""
        WITH c AS ({SYNTH_CALLS_SQL}),
        fs AS (
          SELECT job_id, stage, model_name, min(call_ord) AS first_ord
          FROM c GROUP BY job_id, stage, model_name),
        mo AS (
          SELECT job_id, stage,
                 array_to_string(list(model_name ORDER BY first_ord), ',')
                     AS models_used
          FROM fs GROUP BY job_id, stage),
        a AS (
          SELECT job_id, stage, count(*) AS total_calls,
                 count(*) FILTER (WHERE success) AS successful_calls,
                 sum(latency_ms) AS total_latency_ms,
                 sum(items_processed) AS total_items_processed,
                 sum(confidence_score) AS conf_sum,
                 count(confidence_score) AS conf_n,
                 sum(CASE WHEN coalesce(input_tokens, 0) <> 0
                          THEN input_tokens ELSE 0 END)
                     AS total_input_tokens,
                 sum(CASE WHEN coalesce(output_tokens, 0) <> 0
                          THEN output_tokens ELSE 0 END)
                     AS total_output_tokens
          FROM c GROUP BY job_id, stage)
        SELECT a.job_id, a.stage,
               CAST(total_calls AS BIGINT) AS total_calls,
               CAST(successful_calls AS BIGINT) AS successful_calls,
               CAST(total_calls - successful_calls AS BIGINT)
                   AS failed_calls,
               floor(CAST(successful_calls AS DOUBLE) / total_calls * 100
                     * 100 + 0.5) / 100 AS success_rate_percent,
               CAST(total_latency_ms AS BIGINT) AS total_latency_ms,
               floor(CAST(total_latency_ms AS DOUBLE) / total_calls * 100
                     + 0.5) / 100 AS avg_latency_ms,
               CAST(total_items_processed AS BIGINT)
                   AS total_items_processed,
               floor(coalesce(conf_sum / conf_n, 0.0) * 1000 + 0.5) / 1000
                   AS avg_confidence,
               CAST(total_input_tokens AS BIGINT) AS total_input_tokens,
               CAST(total_output_tokens AS BIGINT) AS total_output_tokens,
               mo.models_used
        FROM a JOIN mo ON mo.job_id = a.job_id AND mo.stage = a.stage
    """


def model_stats_sql() -> str:
    return f"""
        WITH c AS ({SYNTH_CALLS_SQL}),
        a AS (
          SELECT job_id, model_name AS model, count(*) AS total_calls,
                 count(*) FILTER (WHERE success) AS successful_calls,
                 sum(latency_ms) AS total_latency_ms,
                 sum(items_processed) AS total_items_processed,
                 array_to_string(list_sort(list(DISTINCT stage)), ',')
                     AS stages_used,
                 array_to_string(list_sort(list(DISTINCT task)), ',')
                     AS tasks
          FROM c GROUP BY job_id, model_name)
        SELECT job_id, model, CAST(total_calls AS BIGINT) AS total_calls,
               CAST(successful_calls AS BIGINT) AS successful_calls,
               CAST(total_calls - successful_calls AS BIGINT)
                   AS failed_calls,
               floor(CAST(successful_calls AS DOUBLE) / total_calls * 100
                     * 100 + 0.5) / 100 AS success_rate_percent,
               CAST(total_latency_ms AS BIGINT) AS total_latency_ms,
               floor(CAST(total_latency_ms AS DOUBLE) / total_calls * 100
                     + 0.5) / 100 AS avg_latency_ms,
               CAST(total_items_processed AS BIGINT)
                   AS total_items_processed,
               stages_used, tasks
        FROM a
    """
