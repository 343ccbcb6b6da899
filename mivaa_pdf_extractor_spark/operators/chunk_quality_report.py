"""Chunk-quality metrics + recommendation ladder
(app/api/chunk_quality_routes.py:25-321) as native Spark aggregates.

Pinned semantics:

- quality scores are TRUTHY-filtered (:197) — a 0.0 or NULL quality_score is
  excluded from the average AND from the excellent/good/fair/poor
  distribution (so 'poor' counts only scores in (0, 0.5));
- the size/overlap sample query (:249-253) has NO workspace filter and a
  LIMIT 1000 — size stats, very_small/large counts and overlap stats are
  GLOBAL even when the metrics are workspace-scoped (pin), while
  total_chunks / quality / flags / jobs are per-workspace.  The unordered
  DB limit is canonicalized to the 1000 lowest chunk_ids (documented);
- small/large percentages divide the GLOBAL sample counts by the
  WORKSPACE-scoped total_chunks (:43,:58 — a genuine unit mix, pinned);
- overlap ints are truthy-gated (:276-279: a 0 overlap is dropped);
  overlap_ratio compares the ROUNDED value (>25 / <10), and an empty
  overlap set yields ratio 0 which FIRES the <10 INFO branch;
- the recommendation ladder (:25-130): small >5% HIGH elif >2% MEDIUM
  (only when very_small>0); large >10% HIGH only (no medium tier);
  stddev(rounded)>800 MEDIUM; ratio>25 MEDIUM elif <10 INFO; poor>15%
  HIGH; avg<0.6 HIGH elif <0.7 MEDIUM elif >=0.8 EXCELLENT (the [0.7,0.8)
  band emits nothing); excellent+good>80% EXCELLENT; and when the list is
  empty OR every entry contains '✅' the CURRENT-CONFIG line is APPENDED
  (:126-130) — the all-excellent case carries 3 lines;
- the ladder sees the RAW average_quality_score (rounding to 3 decimals
  happens only in the response, :300) but the ROUNDED size/overlap stats;
- stats: min/max/avg/stddev/median over sample lengths, stddev is the
  SAMPLE stdev (n-1) and 0 when n<=1; median interpolates even counts.

Cross-engine determinism: quality scores are synthesized on a 1/64 grid
and lengths are ints, so every sum is exact and order-independent; stddev
is computed from integer power sums (n*Σx² − (Σx)²)/(n(n−1)) before one
double sqrt; decimal rounding uses the floor(x·10^k + 0.5) form on BOTH
engines (HALF_UP at exact ties, where Python's round/format are HALF_EVEN —
the synthesized grids avoid ties; pytest pins true Python formatting on
non-tie fixtures).

Scale notes: one groupBy per input table on the workspace key, a bounded
top-K (1000) sample via sort-limit, and a broadcast of the single global
stats row onto the per-workspace rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SAMPLE_LIMIT = 1000
DAYS_WINDOW = 30


def _fmt1(c: Column) -> Column:
    i = F.floor(c * 10 + F.lit(0.5)).cast("long")
    return F.concat(F.floor(i / 10).cast("long").cast("string"),
                    F.lit("."), (i % 10).cast("string"))


def _fmt0(c: Column) -> Column:
    return F.floor(c + F.lit(0.5)).cast("long").cast("string")


def _fmt2(c: Column) -> Column:
    i = F.floor(c * 100 + F.lit(0.5)).cast("long")
    return F.concat(F.floor(i / 100).cast("long").cast("string"),
                    F.lit("."), F.lpad((i % 100).cast("string"), 2, "0"))


def _round1(c: Column) -> Column:
    return F.floor(c * 10 + F.lit(0.5)) / 10


def _round3(c: Column) -> Column:
    return F.floor(c * 1000 + F.lit(0.5)) / 1000


def quality_metrics(chunks: DataFrame, docs: DataFrame, flags: DataFrame,
                    jobs: DataFrame) -> DataFrame:
    """Per-workspace ChunkQualityMetrics row (chunk_quality_routes.py:169-321).

    ``chunks``: (chunk_id, workspace_id, quality_score, content_len,
    chunk_overlap, chunk_size_cfg, created_day); ``docs``: (doc_id,
    workspace_id, created_day); ``flags``: (flag_id, workspace_id, reviewed,
    flag_type, created_day); ``jobs``: (job_id, workspace_id, dup_prevented,
    low_rejected, has_metrics, created_day)."""
    win = F.col("created_day") < DAYS_WINDOW
    ch = chunks.where(win)
    s = F.col("quality_score")
    truthy = s.isNotNull() & (s != 0.0)
    per_ws = ch.groupBy("workspace_id").agg(
        F.count(F.lit(1)).alias("total_chunks"),
        F.sum(F.when(truthy, s)).alias("_qsum"),
        F.count(F.when(truthy, s)).alias("_qn"),
        F.count(F.when(truthy & (s >= 0.9), 1)).alias("excellent"),
        F.count(F.when(truthy & (s >= 0.7) & (s < 0.9), 1)).alias("good"),
        F.count(F.when(truthy & (s >= 0.5) & (s < 0.7), 1)).alias("fair"),
        F.count(F.when(truthy & (s < 0.5), 1)).alias("poor"))
    per_ws = per_ws.withColumn(
        "average_quality_score",
        F.when(F.col("_qn") > 0, F.col("_qsum") / F.col("_qn"))
        .otherwise(F.lit(0.0))).drop("_qsum", "_qn")
    d = (docs.where(win).groupBy("workspace_id")
         .agg(F.count(F.lit(1)).alias("total_documents")))
    rev = F.coalesce(F.col("reviewed"), F.lit(False))
    fl = flags.where(win).groupBy("workspace_id").agg(
        F.count(F.when(~rev, 1)).alias("flagged_pending"),
        F.count(F.when(rev, 1)).alias("flagged_reviewed"),
        F.count(F.when(F.col("flag_type") == "borderline_quality", 1))
        .alias("borderline_flagged"))
    jb = jobs.where(win).groupBy("workspace_id").agg(
        F.sum(F.when(F.col("has_metrics"), F.col("dup_prevented"))
              .otherwise(F.lit(0))).alias("dup_prevented"),
        F.sum(F.when(F.col("has_metrics"), F.col("low_rejected"))
              .otherwise(F.lit(0))).alias("low_rejected"))
    # GLOBAL sample — no workspace filter, lowest-1000 canonicalization
    sample = ch.orderBy("chunk_id").limit(SAMPLE_LIMIT)
    ln = F.col("content_len")
    ov = F.col("chunk_overlap")
    cz = F.col("chunk_size_cfg")
    ov_t = ov.isNotNull() & (ov != 0)
    cz_t = cz.isNotNull() & (cz != 0)
    g = sample.agg(
        F.count(F.when(ln < 100, 1)).alias("very_small_chunks"),
        F.count(F.when(ln > 2500, 1)).alias("very_large_chunks"),
        F.min(ln).alias("size_min"), F.max(ln).alias("size_max"),
        F.count(F.lit(1)).alias("_n"),
        F.sum(ln).alias("_s"), F.sum(ln * ln).alias("_ss"),
        F.percentile(ln, F.lit(0.5)).alias("_med"),
        F.sum(F.when(ov_t, ov)).alias("_ovs"),
        F.count(F.when(ov_t, ov)).alias("_ovn"),
        F.sum(F.when(cz_t, cz)).alias("_czs"),
        F.count(F.when(cz_t, cz)).alias("_czn"))
    n = F.col("_n")
    var = F.when(n > 1, (n * F.col("_ss") - F.col("_s") * F.col("_s"))
                 .cast("double") / (n * (n - 1)))
    avg_ov = F.when(F.col("_ovn") > 0, F.col("_ovs") / F.col("_ovn"))
    avg_cz = F.when(F.col("_czn") > 0, F.col("_czs") / F.col("_czn"))
    g = g.select(
        "very_small_chunks", "very_large_chunks", "size_min", "size_max",
        F.when(n > 0, _round1(F.col("_s") / n)).otherwise(F.lit(0.0))
        .alias("size_avg"),
        F.coalesce(_round1(F.sqrt(var)), F.lit(0.0)).alias("size_stddev"),
        F.when(n > 0, _round1(F.col("_med"))).otherwise(F.lit(0.0))
        .alias("size_median"),
        F.coalesce(_round1(avg_ov), F.lit(0.0)).alias("avg_overlap"),
        F.coalesce(_round1(avg_cz), F.lit(0.0)).alias("avg_configured_size"),
        F.coalesce(_round1(avg_ov / avg_cz * 100), F.lit(0.0))
        .alias("overlap_ratio"))
    out = (per_ws.join(d, "workspace_id", "left")
           .join(fl, "workspace_id", "left")
           .join(jb, "workspace_id", "left")
           .crossJoin(F.broadcast(g)))
    fill = {c: 0 for c in ("total_documents", "flagged_pending",
                           "flagged_reviewed", "borderline_flagged",
                           "dup_prevented", "low_rejected")}
    # the response rounds avg to 3 decimals (:300) but the recommendation
    # ladder sees the RAW value — emit both
    return (out.na.fill(fill)
            .withColumn("avg_quality_r3",
                        _round3(F.col("average_quality_score"))))


def quality_recommendations(metrics: DataFrame) -> DataFrame:
    """The :25-130 recommendation ladder over quality_metrics rows; emits
    one row per workspace with the joined recommendation list and the raw
    branch pcts."""
    total = F.col("total_chunks")
    pct = lambda c: F.when(total > 0, c / total * 100).otherwise(F.lit(0.0))  # noqa: E731
    small_pct = pct(F.col("very_small_chunks"))
    large_pct = pct(F.col("very_large_chunks"))
    poor_pct = pct(F.col("poor"))
    exc_pct = pct(F.col("excellent"))
    good_pct = pct(F.col("good"))
    avg = F.col("average_quality_score")
    ratio = F.col("overlap_ratio")
    recs = []
    recs.append(F.when(
        (F.col("very_small_chunks") > 0) & (small_pct > 5),
        F.concat(F.lit("⚠️ HIGH: "),
                 F.col("very_small_chunks").cast("string"),
                 F.lit(" chunks ("), _fmt1(small_pct),
                 F.lit("%) are very small (< 100 chars). Consider "
                       "increasing minimum chunk size to 200 characters "
                       "or filtering out small chunks."))
    ).when(
        (F.col("very_small_chunks") > 0) & (small_pct > 2),
        F.concat(F.lit("⚡ MEDIUM: "),
                 F.col("very_small_chunks").cast("string"),
                 F.lit(" chunks ("), _fmt1(small_pct),
                 F.lit("%) are very small (< 100 chars). Monitor this "
                       "metric - may affect retrieval quality."))))
    recs.append(F.when(
        (F.col("very_large_chunks") > 0) & (large_pct > 10),
        F.concat(F.lit("⚠️ HIGH: "),
                 F.col("very_large_chunks").cast("string"),
                 F.lit(" chunks ("), _fmt1(large_pct),
                 F.lit("%) are very large (> 2500 chars). Consider "
                       "reducing max_chunk_size from current setting to "
                       "2000 characters for better retrieval precision."))))
    recs.append(F.when(
        F.col("size_stddev") > 800,
        F.concat(F.lit("⚡ MEDIUM: High chunk size variance (stddev: "),
                 _fmt0(F.col("size_stddev")),
                 F.lit("). This is normal for semantic chunking but "
                       "monitor for consistency. Consider using "
                       "fixed-size chunking if variance is problematic."))))
    recs.append(F.when(
        ratio > 25,
        F.concat(F.lit("⚡ MEDIUM: Overlap ratio is "), _fmt1(ratio),
                 F.lit("% (> 25%). Consider reducing chunk_overlap from "),
                 _fmt0(F.col("avg_overlap")), F.lit(" to "),
                 _fmt0(F.col("avg_configured_size") * 0.15),
                 F.lit(" (15%) to reduce processing time by ~10-15%."))
    ).when(
        ratio < 10,
        F.concat(F.lit("💡 INFO: Overlap ratio is "), _fmt1(ratio),
                 F.lit("% (< 10%). Consider increasing chunk_overlap to "
                       "15-20% for better context preservation."))))
    recs.append(F.when(
        poor_pct > 15,
        F.concat(F.lit("⚠️ HIGH: "), _fmt1(poor_pct),
                 F.lit("% of chunks have poor quality scores (< 0.5). "
                       "Review chunking strategy - may need better "
                       "sentence boundary detection or content "
                       "filtering."))))
    recs.append(F.when(
        avg < 0.6,
        F.concat(F.lit("⚠️ HIGH: Average quality score is "), _fmt2(avg),
                 F.lit(" (< 0.6). Immediate action needed: Review "
                       "chunking configuration and consider implementing "
                       "pre-processing filters."))
    ).when(
        avg < 0.7,
        F.concat(F.lit("⚡ MEDIUM: Average quality score is "), _fmt2(avg),
                 F.lit(" (< 0.7). Consider tuning chunk_size and overlap "
                       "parameters for better quality."))
    ).when(
        avg >= 0.8,
        F.concat(F.lit("✅ EXCELLENT: Average quality score is "),
                 _fmt2(avg),
                 F.lit(". Current chunking configuration is performing "
                       "well!"))))
    recs.append(F.when(
        exc_pct + good_pct > 80,
        F.concat(F.lit("✅ EXCELLENT: "), _fmt1(exc_pct + good_pct),
                 F.lit("% of chunks have good/excellent quality. No "
                       "immediate changes needed."))))
    arr = F.filter(F.array(*recs), lambda x: x.isNotNull())
    config_line = F.concat(
        F.lit("💡 CURRENT CONFIG: chunk_size="),
        _fmt0(F.col("avg_configured_size")),
        F.lit(", chunk_overlap="), _fmt0(F.col("avg_overlap")),
        F.lit(". System is performing optimally - maintain current "
              "settings."))
    all_ok = F.size(F.filter(arr, lambda x: ~x.contains("✅"))) == 0
    arr = F.when((F.size(arr) == 0) | all_ok,
                 F.concat(arr, F.array(config_line))).otherwise(arr)
    return metrics.select(
        "workspace_id",
        F.size(arr).alias("n_recs"),
        F.array_join(arr, " | ").alias("recommendations"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_chunks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    w = e % 5
    score = (F.when(e % 7 == 0, F.lit(None).cast("double"))
             .when(e % 7 == 1, F.lit(0.0))
             .when(w == 1, (32 + (e * 13) % 32).cast("double") / 64)
             .when(w == 3, (48 + (e * 13) % 16).cast("double") / 64)
             .when(w == 4, ((e * 13) % 32).cast("double") / 64)
             .otherwise(((e * 13) % 64).cast("double") / 64))
    ln = (200 + (e * 7) % 1600).cast("int")
    ov = (F.when(e % 6 == 0, F.lit(0))
          .when(e % 6 == 1, F.lit(None).cast("int"))
          .otherwise(100 + (e % 5) * 50)).cast("int")
    cz = F.when(e % 8 == 0, F.lit(None).cast("int")) \
        .otherwise((800 + (e % 4) * 200).cast("int"))
    return events.select(
        e.alias("chunk_id"), w.alias("workspace_id"),
        score.alias("quality_score"), ln.alias("content_len"),
        ov.alias("chunk_overlap"), cz.alias("chunk_size_cfg"),
        (e % 60).cast("int").alias("created_day"))


SYNTH_CHUNKS_SQL = """
    SELECT event_id AS chunk_id, event_id % 5 AS workspace_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN 0.0
                WHEN event_id % 5 = 1
                THEN CAST(32 + (event_id * 13) % 32 AS DOUBLE) / 64
                WHEN event_id % 5 = 3
                THEN CAST(48 + (event_id * 13) % 16 AS DOUBLE) / 64
                WHEN event_id % 5 = 4
                THEN CAST((event_id * 13) % 32 AS DOUBLE) / 64
                ELSE CAST((event_id * 13) % 64 AS DOUBLE) / 64 END
               AS quality_score,
           CAST(200 + (event_id * 7) % 1600 AS INT) AS content_len,
           CAST(CASE WHEN event_id % 6 = 0 THEN 0
                     WHEN event_id % 6 = 1 THEN NULL
                     ELSE 100 + (event_id % 5) * 50 END AS INT)
               AS chunk_overlap,
           CAST(CASE WHEN event_id % 8 = 0 THEN NULL
                     ELSE 800 + (event_id % 4) * 200 END AS INT)
               AS chunk_size_cfg,
           CAST(event_id % 60 AS INT) AS created_day
    FROM events
"""


def synth_docs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 11 == 0)
            .select(e.alias("doc_id"), (e % 5).alias("workspace_id"),
                    (e % 60).cast("int").alias("created_day")))


SYNTH_DOCS_SQL = """
    SELECT event_id AS doc_id, event_id % 5 AS workspace_id,
           CAST(event_id % 60 AS INT) AS created_day
    FROM events WHERE event_id % 11 = 0
"""


def synth_flags(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    rev = (F.when(e % 3 == 0, F.lit(None).cast("boolean"))
           .otherwise(e % 2 == 0))
    return (events.where(e % 13 == 0)
            .select(e.alias("flag_id"), (e % 5).alias("workspace_id"),
                    rev.alias("reviewed"),
                    F.when(e % 4 == 0, F.lit("borderline_quality"))
                    .otherwise(F.lit("low_quality")).alias("flag_type"),
                    (e % 60).cast("int").alias("created_day")))


SYNTH_FLAGS_SQL = """
    SELECT event_id AS flag_id, event_id % 5 AS workspace_id,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS reviewed,
           CASE WHEN event_id % 4 = 0 THEN 'borderline_quality'
                ELSE 'low_quality' END AS flag_type,
           CAST(event_id % 60 AS INT) AS created_day
    FROM events WHERE event_id % 13 = 0
"""


def synth_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 17 == 0)
            .select(e.alias("job_id"), (e % 5).alias("workspace_id"),
                    (e % 9).alias("dup_prevented"),
                    (e % 5).alias("low_rejected"),
                    (e % 10 < 8).alias("has_metrics"),
                    (e % 60).cast("int").alias("created_day")))


SYNTH_JOBS_SQL = """
    SELECT event_id AS job_id, event_id % 5 AS workspace_id,
           event_id % 9 AS dup_prevented, event_id % 5 AS low_rejected,
           event_id % 10 < 8 AS has_metrics,
           CAST(event_id % 60 AS INT) AS created_day
    FROM events WHERE event_id % 17 = 0
"""


def _metrics_cte() -> str:
    return f"""
        ch AS (SELECT * FROM ({SYNTH_CHUNKS_SQL})
               WHERE created_day < {DAYS_WINDOW}),
        per_ws AS (
          SELECT workspace_id, count(*) AS total_chunks,
                 coalesce(sum(quality_score) FILTER (
                     WHERE quality_score IS NOT NULL
                       AND quality_score <> 0.0), 0.0)
                 / nullif(count(*) FILTER (
                     WHERE quality_score IS NOT NULL
                       AND quality_score <> 0.0), 0)
                     AS avg_q_raw,
                 count(*) FILTER (WHERE quality_score IS NOT NULL
                     AND quality_score <> 0.0 AND quality_score >= 0.9)
                     AS excellent,
                 count(*) FILTER (WHERE quality_score IS NOT NULL
                     AND quality_score <> 0.0 AND quality_score >= 0.7
                     AND quality_score < 0.9) AS good,
                 count(*) FILTER (WHERE quality_score IS NOT NULL
                     AND quality_score <> 0.0 AND quality_score >= 0.5
                     AND quality_score < 0.7) AS fair,
                 count(*) FILTER (WHERE quality_score IS NOT NULL
                     AND quality_score <> 0.0 AND quality_score < 0.5)
                     AS poor
          FROM ch GROUP BY workspace_id),
        per_ws2 AS (
          SELECT *, coalesce(avg_q_raw, 0.0) AS average_quality_score
          FROM per_ws),
        d AS (SELECT workspace_id, count(*) AS total_documents
              FROM ({SYNTH_DOCS_SQL})
              WHERE created_day < {DAYS_WINDOW} GROUP BY workspace_id),
        fl AS (
          SELECT workspace_id,
                 count(*) FILTER (WHERE NOT coalesce(reviewed, false))
                     AS flagged_pending,
                 count(*) FILTER (WHERE coalesce(reviewed, false))
                     AS flagged_reviewed,
                 count(*) FILTER (WHERE flag_type = 'borderline_quality')
                     AS borderline_flagged
          FROM ({SYNTH_FLAGS_SQL})
          WHERE created_day < {DAYS_WINDOW} GROUP BY workspace_id),
        jb AS (
          SELECT workspace_id,
                 sum(CASE WHEN has_metrics THEN dup_prevented ELSE 0 END)
                     AS dup_prevented,
                 sum(CASE WHEN has_metrics THEN low_rejected ELSE 0 END)
                     AS low_rejected
          FROM ({SYNTH_JOBS_SQL})
          WHERE created_day < {DAYS_WINDOW} GROUP BY workspace_id),
        samp AS (SELECT * FROM ch ORDER BY chunk_id LIMIT {SAMPLE_LIMIT}),
        g AS (
          SELECT count(*) FILTER (WHERE content_len < 100)
                     AS very_small_chunks,
                 count(*) FILTER (WHERE content_len > 2500)
                     AS very_large_chunks,
                 min(content_len) AS size_min,
                 max(content_len) AS size_max,
                 count(*) AS n, sum(content_len) AS s,
                 sum(content_len * content_len) AS ss,
                 median(content_len) AS med,
                 sum(chunk_overlap) FILTER (WHERE chunk_overlap IS NOT NULL
                     AND chunk_overlap <> 0) AS ovs,
                 count(*) FILTER (WHERE chunk_overlap IS NOT NULL
                     AND chunk_overlap <> 0) AS ovn,
                 sum(chunk_size_cfg) FILTER (WHERE chunk_size_cfg
                     IS NOT NULL AND chunk_size_cfg <> 0) AS czs,
                 count(*) FILTER (WHERE chunk_size_cfg IS NOT NULL
                     AND chunk_size_cfg <> 0) AS czn
          FROM samp),
        g2 AS (
          SELECT very_small_chunks, very_large_chunks, size_min, size_max,
                 CASE WHEN n > 0 THEN floor(CAST(s AS DOUBLE) / n * 10
                                            + 0.5) / 10
                      ELSE 0.0 END AS size_avg,
                 coalesce(floor(sqrt(CASE WHEN n > 1
                     THEN CAST(n * ss - s * s AS DOUBLE) / (n * (n - 1))
                     END) * 10 + 0.5) / 10, 0.0) AS size_stddev,
                 CASE WHEN n > 0 THEN floor(CAST(med AS DOUBLE) * 10
                                            + 0.5) / 10
                      ELSE 0.0 END AS size_median,
                 coalesce(floor(CAST(ovs AS DOUBLE) / ovn * 10 + 0.5) / 10,
                          0.0) AS avg_overlap,
                 coalesce(floor(CAST(czs AS DOUBLE) / czn * 10 + 0.5) / 10,
                          0.0) AS avg_configured_size,
                 coalesce(floor(CAST(ovs AS DOUBLE) / ovn
                                / (CAST(czs AS DOUBLE) / czn) * 100 * 10
                                + 0.5) / 10, 0.0) AS overlap_ratio
          FROM g),
        m AS (
          SELECT p.workspace_id, p.total_chunks,
                 p.average_quality_score, p.excellent, p.good, p.fair,
                 p.poor,
                 coalesce(d.total_documents, 0) AS total_documents,
                 coalesce(fl.flagged_pending, 0) AS flagged_pending,
                 coalesce(fl.flagged_reviewed, 0) AS flagged_reviewed,
                 coalesce(fl.borderline_flagged, 0) AS borderline_flagged,
                 coalesce(jb.dup_prevented, 0) AS dup_prevented,
                 coalesce(jb.low_rejected, 0) AS low_rejected,
                 g2.*
          FROM per_ws2 p
          LEFT JOIN d USING (workspace_id)
          LEFT JOIN fl USING (workspace_id)
          LEFT JOIN jb USING (workspace_id)
          CROSS JOIN g2)
    """


def quality_metrics_sql() -> str:
    return f"""
        WITH {_metrics_cte()}
        SELECT workspace_id, CAST(total_chunks AS BIGINT) AS total_chunks,
               average_quality_score,
               floor(average_quality_score * 1000 + 0.5) / 1000
                   AS avg_quality_r3,
               CAST(excellent AS BIGINT) AS excellent,
               CAST(good AS BIGINT) AS good,
               CAST(fair AS BIGINT) AS fair,
               CAST(poor AS BIGINT) AS poor,
               CAST(total_documents AS BIGINT) AS total_documents,
               CAST(flagged_pending AS BIGINT) AS flagged_pending,
               CAST(flagged_reviewed AS BIGINT) AS flagged_reviewed,
               CAST(borderline_flagged AS BIGINT) AS borderline_flagged,
               CAST(dup_prevented AS BIGINT) AS dup_prevented,
               CAST(low_rejected AS BIGINT) AS low_rejected,
               CAST(very_small_chunks AS BIGINT) AS very_small_chunks,
               CAST(very_large_chunks AS BIGINT) AS very_large_chunks,
               CAST(size_min AS INT) AS size_min,
               CAST(size_max AS INT) AS size_max,
               size_avg, size_stddev, size_median,
               avg_overlap, avg_configured_size, overlap_ratio
        FROM m
    """


def _fmt1_sql(x: str) -> str:
    i = f"CAST(floor(({x}) * 10 + 0.5) AS BIGINT)"
    return (f"(CAST(CAST(floor({i} / 10) AS BIGINT) AS VARCHAR) || '.' "
            f"|| CAST({i} % 10 AS VARCHAR))")


def _fmt0_sql(x: str) -> str:
    return f"CAST(CAST(floor(({x}) + 0.5) AS BIGINT) AS VARCHAR)"


def _fmt2_sql(x: str) -> str:
    i = f"CAST(floor(({x}) * 100 + 0.5) AS BIGINT)"
    return (f"(CAST(CAST(floor({i} / 100) AS BIGINT) AS VARCHAR) || '.' "
            f"|| lpad(CAST({i} % 100 AS VARCHAR), 2, '0'))")


def quality_recommendations_sql() -> str:
    small_pct = ("CASE WHEN total_chunks > 0 THEN CAST(very_small_chunks "
                 "AS DOUBLE) / total_chunks * 100 ELSE 0.0 END")
    large_pct = ("CASE WHEN total_chunks > 0 THEN CAST(very_large_chunks "
                 "AS DOUBLE) / total_chunks * 100 ELSE 0.0 END")
    poor_pct = ("CASE WHEN total_chunks > 0 THEN CAST(poor AS DOUBLE) "
                "/ total_chunks * 100 ELSE 0.0 END")
    eg_pct = ("CASE WHEN total_chunks > 0 THEN CAST(excellent + good "
              "AS DOUBLE) / total_chunks * 100 ELSE 0.0 END")
    avg = "average_quality_score"
    r1 = f"""CASE WHEN very_small_chunks > 0 AND ({small_pct}) > 5 THEN
            '⚠️ HIGH: ' || CAST(very_small_chunks AS VARCHAR) || ' chunks ('
            || {_fmt1_sql(small_pct)} || '%) are very small (< 100 chars). '
            || 'Consider increasing minimum chunk size to 200 characters '
            || 'or filtering out small chunks.'
        WHEN very_small_chunks > 0 AND ({small_pct}) > 2 THEN
            '⚡ MEDIUM: ' || CAST(very_small_chunks AS VARCHAR)
            || ' chunks (' || {_fmt1_sql(small_pct)}
            || '%) are very small (< 100 chars). Monitor this metric - '
            || 'may affect retrieval quality.' END"""
    r2 = f"""CASE WHEN very_large_chunks > 0 AND ({large_pct}) > 10 THEN
            '⚠️ HIGH: ' || CAST(very_large_chunks AS VARCHAR) || ' chunks ('
            || {_fmt1_sql(large_pct)} || '%) are very large (> 2500 chars). '
            || 'Consider reducing max_chunk_size from current setting to '
            || '2000 characters for better retrieval precision.' END"""
    r3 = f"""CASE WHEN size_stddev > 800 THEN
            '⚡ MEDIUM: High chunk size variance (stddev: '
            || {_fmt0_sql("size_stddev")}
            || '). This is normal for semantic chunking but monitor for '
            || 'consistency. Consider using fixed-size chunking if '
            || 'variance is problematic.' END"""
    r4 = f"""CASE WHEN overlap_ratio > 25 THEN
            '⚡ MEDIUM: Overlap ratio is ' || {_fmt1_sql("overlap_ratio")}
            || '% (> 25%). Consider reducing chunk_overlap from '
            || {_fmt0_sql("avg_overlap")} || ' to '
            || {_fmt0_sql("avg_configured_size * 0.15")}
            || ' (15%) to reduce processing time by ~10-15%.'
        WHEN overlap_ratio < 10 THEN
            '💡 INFO: Overlap ratio is ' || {_fmt1_sql("overlap_ratio")}
            || '% (< 10%). Consider increasing chunk_overlap to 15-20% '
            || 'for better context preservation.' END"""
    r5 = f"""CASE WHEN ({poor_pct}) > 15 THEN
            '⚠️ HIGH: ' || {_fmt1_sql(poor_pct)}
            || '% of chunks have poor quality scores (< 0.5). Review '
            || 'chunking strategy - may need better sentence boundary '
            || 'detection or content filtering.' END"""
    r6 = f"""CASE WHEN {avg} < 0.6 THEN
            '⚠️ HIGH: Average quality score is ' || {_fmt2_sql(avg)}
            || ' (< 0.6). Immediate action needed: Review chunking '
            || 'configuration and consider implementing pre-processing '
            || 'filters.'
        WHEN {avg} < 0.7 THEN
            '⚡ MEDIUM: Average quality score is ' || {_fmt2_sql(avg)}
            || ' (< 0.7). Consider tuning chunk_size and overlap '
            || 'parameters for better quality.'
        WHEN {avg} >= 0.8 THEN
            '✅ EXCELLENT: Average quality score is ' || {_fmt2_sql(avg)}
            || '. Current chunking configuration is performing well!' END"""
    r7 = f"""CASE WHEN ({eg_pct}) > 80 THEN
            '✅ EXCELLENT: ' || {_fmt1_sql(eg_pct)}
            || '% of chunks have good/excellent quality. No immediate '
            || 'changes needed.' END"""
    config = (f"'💡 CURRENT CONFIG: chunk_size=' || "
              f"{_fmt0_sql('avg_configured_size')} || "
              f"', chunk_overlap=' || {_fmt0_sql('avg_overlap')} || "
              f"'. System is performing optimally - maintain current "
              f"settings.'")
    return f"""
        WITH {_metrics_cte()},
        r AS (
          SELECT workspace_id,
                 list_filter([{r1}, {r2}, {r3}, {r4}, {r5}, {r6}, {r7}],
                             x -> x IS NOT NULL) AS recs,
                 {config} AS config_line
          FROM m),
        r2 AS (
          SELECT workspace_id,
                 CASE WHEN len(recs) = 0 OR len(list_filter(recs,
                          x -> NOT contains(x, '✅'))) = 0
                      THEN list_append(recs, config_line)
                      ELSE recs END AS recs
          FROM r)
        SELECT workspace_id, CAST(len(recs) AS INT) AS n_recs,
               array_to_string(recs, ' | ') AS recommendations
        FROM r2
    """
