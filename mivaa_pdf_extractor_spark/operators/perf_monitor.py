"""Performance-monitor folds (collector window, quirky percentiles,
alert cooldown chain, optimizer analysis, slow-op report).

Reference: ``app/monitoring/performance_monitor.py`` —

- ``PerformanceCollector.add_metric`` (:63-71): the per-name
  aggregation list is trimmed to its LAST 500 entries whenever it
  exceeds 1000 — trims fire at lengths 1001, then every 501 appends,
  so after N appends the retained window starts at 0-based index
  ``501 * max(0, (N - 500) // 501)``. Closed form, no state needed.
- ``get_aggregated_stats`` / ``_percentile`` (:87-113): count, min,
  max, avg plus a NEAREST-RANK-ish percentile with
  ``index = int(p/100 * len)`` clamped to len-1 — one off from the
  textbook definition (p50 of [1,2,3,4] is 3, not 2.5). Pinned.
- ``PerformanceAlertManager.check_thresholds`` (:398-424): critical
  at value >= critical_threshold, else warning at >= warning; the
  5-minute cooldown is keyed per (metric, LEVEL) — a critical alert
  does not suppress a later warning. Emission chain: an alert fires
  iff no alert of the same (name, level) fired in the last 300 s.
- ``PerformanceOptimizer.analyze_performance`` (:432-486): health
  starts at 100; http p95 > 2000 => -20 (high), memory avg > 80 =>
  -15 (medium), cpu avg > 70 => -10 (medium), each with its pinned
  message; absent metrics contribute nothing.
- ``get_slow_operations`` (:488-505): ``operation.*`` metrics with
  p95 > threshold, sorted by p95 descending.
- ``_setup_default_thresholds`` (:522-532): the 4-row defaults table.

Scale: window/stats are a per-name groupBy over an inherently
<=1000-element retained window (the reference's own cap), so the
collect_list arrays are bounded; the alert chain is a per-(name,
level) sequential fold in ``applyInPandas`` with a recursive-CTE
DuckDB twin; everything else is map-side Column logic.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

AGG_TRIM_ABOVE = 1000   # performance_monitor.py:69
AGG_KEEP = 500          # :70
TRIM_STRIDE = AGG_TRIM_ABOVE - AGG_KEEP + 1  # appends between trims
ALERT_COOLDOWN_S = 300  # :388 (timedelta(minutes=5))

# performance_monitor.py:524-529
THRESHOLD_DEFAULTS = (
    ("http.request.duration", 1000.0, 5000.0, "ms", True),
    ("system.memory.usage", 80.0, 95.0, "percent", True),
    ("system.cpu.usage", 70.0, 90.0, "percent", True),
    ("operation.pdf_processing", 5000.0, 15000.0, "ms", True),
)

ANALYSIS_RULES = (
    # (metric, stat, gate, penalty, type, severity, message)
    ("http.request.duration", "p95", 2000.0, 20, "performance",
     "high", "HTTP request P95 latency is high (>2s). "
     "Consider optimizing slow endpoints."),
    ("system.memory.usage", "avg", 80.0, 15, "resource", "medium",
     "High memory usage detected. "
     "Consider optimizing memory consumption."),
    ("system.cpu.usage", "avg", 70.0, 10, "resource", "medium",
     "High CPU usage detected. "
     "Consider optimizing CPU-intensive operations."),
)


def _trim_start(n):
    """0-based start of the retained aggregation window after ``n``
    appends (the :69-70 trim replayed in closed form)."""
    k = F.greatest(F.lit(0), F.floor((n - AGG_KEEP) / TRIM_STRIDE))
    return (k * TRIM_STRIDE).cast("long")


def retained_window(values: DataFrame) -> DataFrame:
    """``values``: (name, seq long — append order, value double).
    Per name: total appends, trim count, retained-window start
    (0-based) and size."""
    agg = values.groupBy("name").agg(F.count(F.lit(1)).alias("n"))
    start = _trim_start(F.col("n"))
    return agg.select(
        "name", F.col("n").alias("total_appends"),
        (start / TRIM_STRIDE).cast("long").alias("trims"),
        start.alias("retained_from"),
        (F.col("n") - start).alias("retained_count"))


def _quirky_pct(sorted_vals, cnt, p):
    """_percentile (:105-113): sorted[min(int(p/100*len), len-1)]."""
    idx = F.least(F.floor(F.lit(p) / F.lit(100.0) * cnt),
                  (cnt - 1).cast("bigint"))
    return F.element_at(sorted_vals, (idx + 1).cast("int"))


def aggregated_stats(values: DataFrame) -> DataFrame:
    """get_aggregated_stats over the retained window (:87-103):
    count/min/max/avg + the pinned index percentiles."""
    per_name = (values.groupBy("name").agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("seq").alias("s"),
            F.col("value").alias("v")))).alias("arr")))
    n = F.size(F.col("arr"))
    start = _trim_start(n)
    vals = F.transform(
        F.slice(F.col("arr"), (start + 1).cast("int"),
                (n - start).cast("int")),
        lambda x: x["v"])
    cnt = F.size(vals)
    sorted_vals = F.array_sort(vals)
    total = F.aggregate(vals, F.lit(0.0),
                        lambda acc, v: acc + v)
    return per_name.select(
        "name",
        cnt.cast("long").alias("count"),
        F.element_at(sorted_vals, 1).alias("min"),
        F.element_at(sorted_vals, -1).alias("max"),
        (total / cnt).alias("avg"),
        _quirky_pct(sorted_vals, cnt, 50).alias("p50"),
        _quirky_pct(sorted_vals, cnt, 95).alias("p95"),
        _quirky_pct(sorted_vals, cnt, 99).alias("p99"))


def threshold_alerts(metrics: DataFrame,
                     thresholds: DataFrame) -> DataFrame:
    """``metrics``: (name, ts long — check time seconds, value
    double). ``thresholds``: (name, warning_threshold,
    critical_threshold, enabled). One row per threshold-exceeding
    metric with the level and whether the 300 s per-(name, level)
    cooldown let it fire (:398-424)."""
    th = F.broadcast(thresholds.where(F.col("enabled")).select(
        F.col("name").alias("t_name"), "warning_threshold",
        "critical_threshold"))
    cand = (metrics.join(th, metrics["name"] == th["t_name"])
            .withColumn(
                "level",
                F.when(F.col("value") >= F.col("critical_threshold"),
                       F.lit("critical"))
                .when(F.col("value") >= F.col("warning_threshold"),
                      F.lit("warning")))
            .where(F.col("level").isNotNull())
            .select("name", "level", "ts", "value"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        last = None
        out = []
        for r in pdf.itertuples():
            emitted = last is None or (r.ts - last) >= ALERT_COOLDOWN_S
            if emitted:
                last = r.ts
            out.append((r.name, r.level, int(r.ts), float(r.value),
                        emitted))
        return pd.DataFrame(out, columns=[
            "name", "level", "ts", "value", "emitted"])

    return (cand.repartition("name", "level")
            .groupBy("name", "level").applyInPandas(
                lambda _, g: run(g),
                "name string, level string, ts long, value double, "
                "emitted boolean"))


def duck_alerts_sql() -> str:
    """Recursive-CTE twin over a CTE ``acand`` (name, level, ts,
    value); yields CTE ``alerts``."""
    return f"""
anumbered AS (
  SELECT *, row_number() OVER (PARTITION BY name, level
                               ORDER BY ts) AS rn
  FROM acand),
alerts_rec AS (
  SELECT name, level, ts, value, rn, true AS emitted,
         ts AS last_ts
  FROM anumbered WHERE rn = 1
  UNION ALL
  SELECT n.name, n.level, n.ts, n.value, n.rn,
         n.ts - s.last_ts >= {ALERT_COOLDOWN_S} AS emitted,
         CASE WHEN n.ts - s.last_ts >= {ALERT_COOLDOWN_S}
              THEN n.ts ELSE s.last_ts END AS last_ts
  FROM anumbered n JOIN alerts_rec s
    ON n.name = s.name AND n.level = s.level AND n.rn = s.rn + 1),
alerts AS (
  SELECT name, level, ts, value, emitted FROM alerts_rec)"""


def analyze_performance(stats: DataFrame) -> DataFrame:
    """``stats``: (snapshot_id long, name, avg double, p95 double) —
    one row per metric present in the snapshot. Optimizer fold
    (:432-486): fixed rule order, health 100 minus the fired
    penalties, parallel recommendation arrays."""
    base = stats.groupBy("snapshot_id").agg(
        *[F.max(F.when(F.col("name") == m,
                       F.col(stat))).alias(f"_{i}")
          for i, (m, stat, *_rest) in enumerate(ANALYSIS_RULES)])
    fires = [(F.col(f"_{i}").isNotNull() & (F.col(f"_{i}") > gate))
             for i, (_m, _s, gate, *_r) in enumerate(ANALYSIS_RULES)]
    health = F.lit(100)
    for fire, (_m, _s, _g, pen, *_r) in zip(fires, ANALYSIS_RULES):
        health = health - F.when(fire, F.lit(pen)).otherwise(F.lit(0))

    def arr(sel):
        return F.filter(
            F.array(*[F.when(fire, sel(i, rule))
                      for i, (fire, rule) in enumerate(
                          zip(fires, ANALYSIS_RULES))]),
            lambda x: x.isNotNull())

    return base.select(
        "snapshot_id",
        health.alias("health_score"),
        arr(lambda i, r: F.lit(r[4])).alias("rec_types"),
        arr(lambda i, r: F.lit(r[5])).alias("rec_severities"),
        arr(lambda i, r: F.lit(r[6])).alias("rec_messages"),
        arr(lambda i, r: F.lit(r[0])).alias("rec_metrics"),
        arr(lambda i, r: F.col(f"_{i}")).alias("rec_values"))


def slow_operations(stats: DataFrame,
                    threshold_ms: float = 1000.0) -> DataFrame:
    """get_slow_operations (:488-505): ``operation.*`` stats with
    p95 > threshold, ranked by p95 descending (name ascending breaks
    ties — the reference's stable sort keeps dict order, which the
    synth avoids exercising)."""
    slow = stats.where(F.col("name").startswith("operation.")
                       & (F.col("p95") > threshold_ms))
    return slow.select(
        F.col("name").alias("operation"),
        F.col("p95").alias("p95_duration"),
        F.col("avg").alias("avg_duration"),
        F.col("max").alias("max_duration"),
        "count").withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("p95_duration").desc(),
                           F.col("operation").asc())))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

def synth_metric_values(docs) -> DataFrame:
    """Append streams: 3 http rows per doc (so the >1000 trim fires
    at every SF) + one row per doc for three other metrics. Values
    are exact binary quarters."""
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    http = d.select(
        F.lit("http.request.duration").alias("name"),
        F.explode(F.array(*[F.lit(j) for j in range(3)])).alias("j"),
        "doc").select(
        "name", (F.col("doc") * 3 + F.col("j")).alias("seq"),
        (((F.col("doc") * 3 + F.col("j")) * 7919) % 8000 * 0.25)
        .alias("value"))
    others = None
    for name, mult, mod, scale in (
            ("system.memory.usage", 31, 101, 1.0),
            ("system.cpu.usage", 17, 101, 1.0),
            ("operation.pdf_processing", 7901, 20000, 0.25)):
        o = d.select(F.lit(name).alias("name"),
                     F.col("doc").alias("seq"),
                     ((F.col("doc") * mult) % mod * scale)
                     .alias("value"))
        others = o if others is None else others.unionByName(o)
    return http.unionByName(others)


DUCK_METRIC_VALUES_SQL = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
pvals AS (
  SELECT 'http.request.duration' AS name, doc*3 + j AS seq,
         ((doc*3 + j) * 7919) % 8000 * 0.25 AS value
  FROM docs, (SELECT unnest(generate_series(0, 2)) AS j)
  UNION ALL
  SELECT 'system.memory.usage', doc, (doc*31) % 101 * 1.0 FROM docs
  UNION ALL
  SELECT 'system.cpu.usage', doc, (doc*17) % 101 * 1.0 FROM docs
  UNION ALL
  SELECT 'operation.pdf_processing', doc,
         (doc*7901) % 20000 * 0.25 FROM docs)"""

DUCK_WINDOW_SQL = f"""
pwin AS (
  SELECT name, n AS total_appends,
         GREATEST(0, (n - {AGG_KEEP}) // {TRIM_STRIDE}) AS trims,
         GREATEST(0, (n - {AGG_KEEP}) // {TRIM_STRIDE})
           * {TRIM_STRIDE} AS retained_from,
         n - GREATEST(0, (n - {AGG_KEEP}) // {TRIM_STRIDE})
           * {TRIM_STRIDE} AS retained_count
  FROM (SELECT name, count(*) AS n FROM pvals GROUP BY name))"""

DUCK_STATS_SQL = f"""
pretained AS (
  SELECT name, value,
         row_number() OVER (PARTITION BY name ORDER BY seq) - 1
           AS idx0,
         count(*) OVER (PARTITION BY name) AS n
  FROM pvals
  QUALIFY idx0 >= GREATEST(0, (n - {AGG_KEEP}) // {TRIM_STRIDE})
                  * {TRIM_STRIDE}),
pstats AS (
  SELECT name,
         count(*) AS count,
         min(value) AS min, max(value) AS max,
         sum(value) / count(*) AS avg,
         (array_agg(value ORDER BY value))
           [LEAST(CAST(floor(CAST(50 AS DOUBLE)/100 * count(*))
                  AS BIGINT), count(*) - 1) + 1] AS p50,
         (array_agg(value ORDER BY value))
           [LEAST(CAST(floor(CAST(95 AS DOUBLE)/100 * count(*))
                  AS BIGINT), count(*) - 1) + 1] AS p95,
         (array_agg(value ORDER BY value))
           [LEAST(CAST(floor(CAST(99 AS DOUBLE)/100 * count(*))
                  AS BIGINT), count(*) - 1) + 1] AS p99
  FROM pretained GROUP BY name)"""


def synth_alert_metrics(docs) -> DataFrame:
    """Check-time streams straddling warning/critical with gaps both
    under and over the 300 s cooldown."""
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    names = ("http.request.duration", "system.memory.usage",
             "system.cpu.usage", "operation.pdf_processing",
             "custom.op", "unthresholded.op")
    name = F.element_at(F.array(*[F.lit(x) for x in names]),
                        (F.col("doc") % 6 + 1).cast("int"))
    is_pct = name.isin("system.memory.usage", "system.cpu.usage")
    value = F.when(is_pct, (F.col("doc") * 13) % 120 * 1.0) \
        .otherwise((F.col("doc") * 13) % 120 * 100.0)
    return d.select(
        name.alias("name"),
        (F.col("doc") * 37 + (F.col("doc") % 5) * 29).alias("ts"),
        value.alias("value"))


DUCK_ALERT_METRICS_SQL = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
ametrics AS (
  SELECT (['http.request.duration','system.memory.usage',
           'system.cpu.usage','operation.pdf_processing',
           'custom.op','unthresholded.op'])
            [CAST(doc % 6 AS INT) + 1] AS name,
         doc*37 + (doc % 5)*29 AS ts,
         CASE WHEN CAST(doc % 6 AS INT) IN (1, 2)
              THEN (doc*13) % 120 * 1.0
              ELSE (doc*13) % 120 * 100.0 END AS value
  FROM docs),
athr(name, warning_threshold, critical_threshold, enabled) AS (VALUES
  ('http.request.duration', 1000.0, 5000.0, TRUE),
  ('system.memory.usage', 80.0, 95.0, TRUE),
  ('system.cpu.usage', 70.0, 90.0, TRUE),
  ('operation.pdf_processing', 5000.0, 15000.0, TRUE),
  ('custom.op', 100.0, 200.0, FALSE)),
acand AS (
  SELECT * FROM (
    SELECT m.name,
           CASE WHEN m.value >= t.critical_threshold THEN 'critical'
                WHEN m.value >= t.warning_threshold THEN 'warning'
           END AS level,
           m.ts, m.value
    FROM ametrics m JOIN athr t ON m.name = t.name AND t.enabled)
  WHERE level IS NOT NULL)"""


def synth_alert_thresholds(spark) -> DataFrame:
    rows = [(n, w, c, e) for n, w, c, _u, e in THRESHOLD_DEFAULTS]
    rows.append(("custom.op", 100.0, 200.0, False))
    return spark.createDataFrame(
        rows, "name string, warning_threshold double, "
        "critical_threshold double, enabled boolean")


def synth_snapshot_stats(docs) -> DataFrame:
    """Per-snapshot optimizer inputs; each metric is present for most
    snapshots and absent for a residue class (the `if stats:` gate)."""
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    out = None
    for i, (name, mult, mod) in enumerate((
            ("http.request.duration", 11, 4000),
            ("system.memory.usage", 7, 120),
            ("system.cpu.usage", 3, 110))):
        o = (d.where(F.col("doc") % 4 != i)
             .select(F.col("doc").alias("snapshot_id"),
                     F.lit(name).alias("name"),
                     ((F.col("doc") * mult) % mod * 1.0).alias("avg"),
                     ((F.col("doc") * mult) % mod * 1.0).alias("p95")))
        out = o if out is None else out.unionByName(o)
    return out


DUCK_SNAPSHOT_STATS_SQL = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
sstats AS (
  SELECT doc AS snapshot_id, 'http.request.duration' AS name,
         (doc*11) % 4000 * 1.0 AS avg, (doc*11) % 4000 * 1.0 AS p95
  FROM docs WHERE doc % 4 != 0
  UNION ALL
  SELECT doc, 'system.memory.usage',
         (doc*7) % 120 * 1.0, (doc*7) % 120 * 1.0
  FROM docs WHERE doc % 4 != 1
  UNION ALL
  SELECT doc, 'system.cpu.usage',
         (doc*3) % 110 * 1.0, (doc*3) % 110 * 1.0
  FROM docs WHERE doc % 4 != 2)"""


def duck_analysis_sql() -> str:
    cols, types, sevs, msgs, mets, vals, pens = [], [], [], [], [], \
        [], []
    for i, (m, stat, gate, pen, typ, sev, msg) in enumerate(
            ANALYSIS_RULES):
        cols.append(
            f"max(CASE WHEN name = '{m}' THEN {stat} END) AS _{i}")
        fire = f"(_{i} IS NOT NULL AND _{i} > {gate})"
        pens.append(f"CASE WHEN {fire} THEN {pen} ELSE 0 END")
        types.append(f"CASE WHEN {fire} THEN '{typ}' END")
        sevs.append(f"CASE WHEN {fire} THEN '{sev}' END")
        msgs.append(f"CASE WHEN {fire} THEN '{msg}' END")
        mets.append(f"CASE WHEN {fire} THEN '{m}' END")
        vals.append(f"CASE WHEN {fire} THEN _{i} END")

    def flt(parts):
        return ("list_filter([" + ", ".join(parts)
                + "], x -> x IS NOT NULL)")
    return f"""
sbase AS (
  SELECT snapshot_id, {', '.join(cols)}
  FROM sstats GROUP BY snapshot_id),
sanalysis AS (
  SELECT snapshot_id,
         100 - ({' + '.join(pens)}) AS health_score,
         {flt(types)} AS rec_types,
         {flt(sevs)} AS rec_severities,
         {flt(msgs)} AS rec_messages,
         {flt(mets)} AS rec_metrics,
         {flt(vals)} AS rec_values
  FROM sbase)"""


DUCK_SLOW_OPS_SQL = """
sslow AS (
  SELECT name AS operation, p95 AS p95_duration, avg AS avg_duration,
         max AS max_duration, count,
         row_number() OVER (ORDER BY p95 DESC, name ASC) AS rank
  FROM pstats
  WHERE name LIKE 'operation.%' AND p95 > 1000)"""
