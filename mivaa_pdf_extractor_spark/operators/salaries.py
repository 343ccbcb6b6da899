"""Job-salary normalization: any (amount, currency, period) → annualized
USD, with the reference's static FX table, period inference, and sanity
band.

Re-expresses ``normalize_to_annual_usd``
(app/services/integrations/job_salary_normalizer.py:107-166) as one
native column projection:

- FX: the verbatim 23-currency static table (:28-54); unknown currency →
  note ``"unknown currency 'X'; treating as USD"`` and fx = 1.0 (the
  CODE stays the unknown one — it still feeds the period heuristic's
  big-5 check, pinned in tests).
- Period: the 15-alias multiplier table (:62-78); missing/unknown period
  → magnitude inference (:94-104: sample = max(min, max); < 500 →
  hour, < 12000 in {USD, EUR, GBP, CAD, AUD} → month, else year) with
  note ``"inferred period=P from magnitude"``; sample 0 → multiplier 1,
  no note.
- Convert: value ≤ 0 / NULL → NULL, else int(round(v · mult · fx)).
- Sanity band (:151-160): a converted value < 5,000 or > 2,000,000 USD
  is rejected to NULL with note ``"rejected out-of-band value V"`` —
  min's note before max's, after any currency/period notes, '; '-joined.
- The both-empty gate (:120-121: ``not min and not max`` — 0 counts as
  empty) short-circuits to an all-NULL row with NULL note.

Cross-engine determinism: synthesized salaries are multiples of 4 and
every FX rate has exactly 2 decimals, so v·mult·fx can never land on an
exact .5 (4j·cents·mult ≡ 50 (mod 100) has no solution — LHS even ≡ 2
(mod 4)·odd), making Python's round-half-even, Spark ROUND and DuckDB
ROUND all agree bit-for-bit on this domain.

Scale notes: pure map-side projection — no shuffle, no UDF, no collect;
the FX/period tables are literal when-chains inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 1 unit = N USD, scaled to integer cents-per-100 to keep the literal
# table exact (job_salary_normalizer.py:28-54). Stored as (code, rate).
FX_TO_USD = (
    ("USD", 1.00), ("EUR", 1.08), ("GBP", 1.27), ("CHF", 1.13),
    ("CAD", 0.74), ("AUD", 0.66), ("NZD", 0.61), ("JPY", 0.0067),
    ("CNY", 0.14), ("INR", 0.012), ("SEK", 0.094), ("NOK", 0.094),
    ("DKK", 0.144), ("PLN", 0.25), ("CZK", 0.043), ("BRL", 0.20),
    ("MXN", 0.058), ("ZAR", 0.054), ("TRY", 0.029), ("ILS", 0.27),
    ("AED", 0.272), ("SGD", 0.74), ("HKD", 0.128),
)

# period alias → per-year multiplier (job_salary_normalizer.py:57-78)
PERIOD_MULT = (
    ("year", 1), ("yr", 1), ("annual", 1), ("annually", 1),
    ("month", 12), ("mo", 12), ("monthly", 12),
    ("week", 52), ("wk", 52), ("weekly", 52),
    ("day", 250), ("daily", 250),
    ("hour", 2080), ("hr", 2080), ("hourly", 2080),
)

BIG5 = ("USD", "EUR", "GBP", "CAD", "AUD")  # :102

SANE_MIN = 5_000        # :153
SANE_MAX = 2_000_000    # :153


def _fx_col(code: Column) -> Column:
    expr = F.lit(None).cast("double")
    for c, r in reversed(FX_TO_USD):
        expr = F.when(code == c, F.lit(r)).otherwise(expr)
    return expr


def _mult_col(period: Column) -> Column:
    expr = F.lit(None).cast("long")
    for p, m in reversed(PERIOD_MULT):
        expr = F.when(period == p, F.lit(m)).otherwise(expr)
    return expr


def normalize_salaries(listings: DataFrame) -> DataFrame:
    """(listing_id, salary_min, salary_max, salary_currency, salary_period)
    → (listing_id, annual_min_usd, annual_max_usd, note).

    Faithful column transcription of normalize_to_annual_usd
    (job_salary_normalizer.py:107-166).

    Execution shape (round 6): built as STAGED projections — the same
    CTE ladder as the DuckDB twin — instead of one inlined tree.  The
    single-select form referenced ``ann_min``/``ann_max`` (each
    embedding the 23-branch FX chain and the 15-branch period chain)
    six times across the outputs and the note array; Catalyst inlines
    the copies and re-evaluates the whole dup'd ladder per row
    (measured 3.2-4.8 s steady for a 100k-row map-only projection at
    local[32]).  Multi-referenced non-cheap aliases block
    ``CollapseProject``, so each intermediate below is computed once
    per row."""
    smin = F.col("salary_min").cast("long")
    smax = F.col("salary_max").cast("long")

    # stage 1: normalized inputs (each referenced many times below)
    s1 = listings.select(
        F.col("listing_id"),
        smin.alias("smin"), smax.alias("smax"),
        F.upper(F.trim(F.coalesce(F.col("salary_currency"),
                                  F.lit("USD")))).alias("code"),
        # `(salary_period or '').strip().lower() or None` (:130)
        F.lower(F.trim(F.coalesce(F.col("salary_period"),
                                  F.lit("")))).alias("period"))

    # stage 2: FX / period lookups + the empty gate + sample magnitude
    s2 = s1.select(
        "listing_id", "smin", "smax", "code",
        # `not salary_min and not salary_max` — 0 and NULL falsy (:120)
        ((F.coalesce(F.col("smin"), F.lit(0)) == 0)
         & (F.coalesce(F.col("smax"), F.lit(0)) == 0)).alias("empty"),
        _fx_col(F.col("code")).alias("fx_raw"),
        # NULL for '' and unknown aliases alike
        _mult_col(F.col("period")).alias("mult_raw"),
        # magnitude inference sample uses `or 0` semantics (:94-104)
        F.greatest(F.coalesce(F.col("smin"), F.lit(0)),
                   F.coalesce(F.col("smax"), F.lit(0))).alias("sample"))

    # stage 3: inference + effective fx/mult
    s3 = s2.select(
        "listing_id", "smin", "smax", "code", "empty",
        F.col("fx_raw").isNull().alias("unknown_ccy"),
        F.coalesce(F.col("fx_raw"), F.lit(1.0)).alias("fx"),
        (F.col("mult_raw").isNull()
         & (F.col("sample") > 0)).alias("infer_needed"),
        (F.when(F.col("sample") < 500, F.lit("hour"))
          .when((F.col("sample") < 12000)
                & F.col("code").isin(*BIG5), F.lit("month"))
          .otherwise(F.lit("year"))).alias("inferred"),
        "mult_raw")
    s4 = s3.withColumn(
        "mult",
        F.when(F.col("mult_raw").isNotNull(), F.col("mult_raw"))
         .when(F.col("infer_needed"), _mult_col(F.col("inferred")))
         .otherwise(F.lit(1)))

    # stage 4: converted values
    def conv(v: Column) -> Column:
        return F.when(v.isNull() | (v <= 0), F.lit(None).cast("long")) \
                .otherwise(F.round(v.cast("double") * F.col("mult")
                                   * F.col("fx"), 0).cast("long"))

    s5 = s4.select(
        "listing_id", "code", "empty", "unknown_ccy", "infer_needed",
        "inferred",
        conv(F.col("smin")).alias("ann_min"),
        conv(F.col("smax")).alias("ann_max"))

    # stage 5: sanity band flags (:151-160)
    def rejected(v: Column) -> Column:
        return v.isNotNull() & ((v < SANE_MIN) | (v > SANE_MAX))

    s6 = s5.select(
        "*",
        rejected(F.col("ann_min")).alias("rej_min"),
        rejected(F.col("ann_max")).alias("rej_max"))

    notes = F.array_compact(F.array(
        F.when(F.col("unknown_ccy"),
               F.concat(F.lit("unknown currency '"), F.col("code"),
                        F.lit("'; treating as USD"))),
        F.when(F.col("infer_needed"),
               F.concat(F.lit("inferred period="), F.col("inferred"),
                        F.lit(" from magnitude"))),
        F.when(F.col("rej_min"),
               F.concat(F.lit("rejected out-of-band value "),
                        F.col("ann_min").cast("string"))),
        F.when(F.col("rej_max"),
               F.concat(F.lit("rejected out-of-band value "),
                        F.col("ann_max").cast("string"))),
    ))
    note = F.when(F.size(notes) > 0, F.array_join(notes, "; "))

    null_l = F.lit(None).cast("long")
    return s6.select(
        F.col("listing_id"),
        F.when(F.col("empty") | F.col("rej_min"), null_l)
         .otherwise(F.col("ann_min")).alias("annual_min_usd"),
        F.when(F.col("empty") | F.col("rej_max"), null_l)
         .otherwise(F.col("ann_max")).alias("annual_max_usd"),
        F.when(F.col("empty"), F.lit(None).cast("string"))
         .otherwise(note).alias("note"),
    )


def synth_job_listings(events: DataFrame) -> DataFrame:
    """Deterministic job_listings salary columns from the ``events``
    testdata. Magnitudes are multiples of 4 (see module docstring) and
    span every branch: the hour/month/year inference tiers, explicit and
    alias periods, unknown periods, unknown currencies, zero/NULL
    salaries, and both sanity-band rejections. DuckDB twin:
    SYNTH_JOB_LISTINGS_SQL."""
    e = F.col("event_id")
    mag = (F.when(e % 5 == 0, 48)           # < 500 → hour inference
            .when(e % 5 == 1, 4800)         # < 12000 → month in big-5
            .when(e % 5 == 2, 96000)        # year
            .when(e % 5 == 3, 2400)
            .otherwise(120)).cast("long")
    smin = (F.when(e % 7 == 0, None)
             .when(e % 7 == 1, 0)
             .otherwise(mag + (e % 11) * 4)).cast("long")
    smax = (F.when(e % 3 == 0, None)
             .otherwise(F.coalesce(smin, mag) + (e % 13 + 1) * 4)) \
        .cast("long")
    return events.select(
        e.alias("listing_id"),
        smin.alias("salary_min"),
        smax.alias("salary_max"),
        (F.when(e % 8 == 0, None).when(e % 8 == 1, "usd")
          .when(e % 8 == 2, "EUR").when(e % 8 == 3, " gbp ")
          .when(e % 8 == 4, "CAD").when(e % 8 == 5, "XYZ")
          .when(e % 8 == 6, "chf").otherwise("AUD"))
        .alias("salary_currency"),
        (F.when(e % 6 == 0, "year").when(e % 6 == 1, "Monthly")
          .when(e % 6 == 2, "hour").when(e % 6 == 3, None)
          .when(e % 6 == 4, "").otherwise("fortnight"))
        .alias("salary_period"),
    )


SYNTH_JOB_LISTINGS_SQL = """
    SELECT event_id AS listing_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN 0
                ELSE (CASE WHEN event_id % 5 = 0 THEN 48
                           WHEN event_id % 5 = 1 THEN 4800
                           WHEN event_id % 5 = 2 THEN 96000
                           WHEN event_id % 5 = 3 THEN 2400
                           ELSE 120 END) + (event_id % 11) * 4
           END AS salary_min,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE COALESCE(
                       CASE WHEN event_id % 7 = 0 THEN NULL
                            WHEN event_id % 7 = 1 THEN 0
                            ELSE (CASE WHEN event_id % 5 = 0 THEN 48
                                       WHEN event_id % 5 = 1 THEN 4800
                                       WHEN event_id % 5 = 2 THEN 96000
                                       WHEN event_id % 5 = 3 THEN 2400
                                       ELSE 120 END) + (event_id % 11) * 4
                       END,
                       CASE WHEN event_id % 5 = 0 THEN 48
                            WHEN event_id % 5 = 1 THEN 4800
                            WHEN event_id % 5 = 2 THEN 96000
                            WHEN event_id % 5 = 3 THEN 2400
                            ELSE 120 END)
                     + (event_id % 13 + 1) * 4
           END AS salary_max,
           CASE WHEN event_id % 8 = 0 THEN NULL
                WHEN event_id % 8 = 1 THEN 'usd'
                WHEN event_id % 8 = 2 THEN 'EUR'
                WHEN event_id % 8 = 3 THEN ' gbp '
                WHEN event_id % 8 = 4 THEN 'CAD'
                WHEN event_id % 8 = 5 THEN 'XYZ'
                WHEN event_id % 8 = 6 THEN 'chf'
                ELSE 'AUD' END AS salary_currency,
           CASE WHEN event_id % 6 = 0 THEN 'year'
                WHEN event_id % 6 = 1 THEN 'Monthly'
                WHEN event_id % 6 = 2 THEN 'hour'
                WHEN event_id % 6 = 3 THEN NULL
                WHEN event_id % 6 = 4 THEN ''
                ELSE 'fortnight' END AS salary_period
    FROM events
"""


def _duck_fx_case(code: str) -> str:
    rows = " ".join(f"WHEN '{c}' THEN CAST({r} AS DOUBLE)"
                    for c, r in FX_TO_USD)
    return f"(CASE {code} {rows} END)"


def _duck_mult_case(period: str) -> str:
    rows = " ".join(f"WHEN '{p}' THEN {m}" for p, m in PERIOD_MULT)
    return f"(CASE {period} {rows} END)"


def duck_salary_normalize_sql(src: str) -> str:
    """DuckDB oracle for normalize_salaries over ``src`` (a CTE name
    exposing the synth_job_listings columns)."""
    big5 = ", ".join(f"'{c}'" for c in BIG5)
    return f"""
    base AS (
        SELECT listing_id,
               CAST(salary_min AS BIGINT) AS smin,
               CAST(salary_max AS BIGINT) AS smax,
               UPPER(TRIM(COALESCE(salary_currency, 'USD'))) AS code,
               LOWER(TRIM(COALESCE(salary_period, ''))) AS period
        FROM {src}
    ), stage AS (
        SELECT listing_id,
               (COALESCE(smin, 0) = 0 AND COALESCE(smax, 0) = 0) AS empty,
               smin, smax, code,
               {_duck_fx_case('code')} IS NULL AS unknown_ccy,
               COALESCE({_duck_fx_case('code')}, CAST(1.0 AS DOUBLE)) AS fx,
               {_duck_mult_case('period')} AS mult_raw,
               GREATEST(COALESCE(smin, 0), COALESCE(smax, 0)) AS sample
        FROM base
    ), infer AS (
        SELECT *,
               CASE WHEN sample < 500 THEN 'hour'
                    WHEN sample < 12000 AND code IN ({big5}) THEN 'month'
                    ELSE 'year' END AS inferred,
               (mult_raw IS NULL AND sample > 0) AS infer_needed,
               CASE WHEN mult_raw IS NOT NULL THEN mult_raw
                    WHEN mult_raw IS NULL AND sample > 0 THEN
                        {_duck_mult_case("(CASE WHEN sample < 500 THEN 'hour' "
                                         f"WHEN sample < 12000 AND code IN ({big5}) THEN 'month' "
                                         "ELSE 'year' END)")}
                    ELSE 1 END AS mult
        FROM stage
    ), conv AS (
        SELECT *,
               CASE WHEN smin IS NULL OR smin <= 0 THEN NULL
                    ELSE CAST(ROUND(CAST(smin AS DOUBLE) * mult * fx, 0) AS BIGINT)
               END AS ann_min,
               CASE WHEN smax IS NULL OR smax <= 0 THEN NULL
                    ELSE CAST(ROUND(CAST(smax AS DOUBLE) * mult * fx, 0) AS BIGINT)
               END AS ann_max
        FROM infer
    ), noted AS (
        SELECT *,
               (ann_min IS NOT NULL AND (ann_min < {SANE_MIN} OR ann_min > {SANE_MAX})) AS rej_min,
               (ann_max IS NOT NULL AND (ann_max < {SANE_MIN} OR ann_max > {SANE_MAX})) AS rej_max
        FROM conv
    )
    SELECT listing_id,
           CASE WHEN empty OR rej_min THEN NULL ELSE ann_min END AS annual_min_usd,
           CASE WHEN empty OR rej_max THEN NULL ELSE ann_max END AS annual_max_usd,
           CASE WHEN empty THEN NULL ELSE
             NULLIF(ARRAY_TO_STRING(LIST_FILTER([
               CASE WHEN unknown_ccy THEN 'unknown currency ''' || code || '''; treating as USD' END,
               CASE WHEN infer_needed THEN 'inferred period=' || inferred || ' from magnitude' END,
               CASE WHEN rej_min THEN 'rejected out-of-band value ' || CAST(ann_min AS VARCHAR) END,
               CASE WHEN rej_max THEN 'rejected out-of-band value ' || CAST(ann_max AS VARCHAR) END
             ], x -> x IS NOT NULL), '; '), '')
           END AS note
    FROM noted
"""
