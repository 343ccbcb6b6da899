"""Rule-based functional-property extraction (map-only Column plans).

Re-expresses the deterministic fallback tier of the reference's
enhanced material-property extractor (reference ``app/services/
products/enhanced_material_property_extractor.py:313-400``,
``_rule_based_extraction``): the regex battery that fires when the
LLM path is unavailable, covering 6 of the 9 property categories.

Semantics pinned (category key names from PropertyCategory):

- slipSafetyRatings: ``\\b(R(?:9|10|11|12|13))\\b`` (?i) over the
  ORIGINAL text, upper-cased and set-deduped (the reference renders a
  Python set — order-insensitive — so the contract canonicalizes it
  sorted); dcofRange = [min, max] of ``dcof[:\\s]*(num)`` hits over
  the lowered text kept within [0, 1]; confidence 0.65.
- mechanicalPropertiesExtended: mohsHardnessRange from
  ``mohs[:\\s]+(?:hardness[:\\s]+)?(num)`` kept within [1, 10];
  peiRating = sorted set of ``pei[:\\s]+(?:rating[:\\s]+)?
  (?:class[:\\s]+)?([0-5])`` single digits; confidence 0.6.
- waterMoistureResistance: waterAbsorptionRange from
  ``water\\s+absorption[:\\s]*(num)\\s*%`` kept within [0, 100];
  frostResistance = 'frost' AND ('resist' OR 'proof'); conf 0.6.
- surfaceGlossReflectivity: glossLevel = the keyword list
  [super-polished, polished, satin, semi-polished, matte, velvet,
  anti-glare] filtered by substring containment IN LIST ORDER (note
  'polished' is a substring of 'super-polished'/'semi-polished' —
  containment is independent, exactly as the reference); conf 0.7.
- dimensionalAesthetic: shadeVariation = FIRST ``\\b(V[1-4])\\b``
  match over the ORIGINAL text (case-SENSITIVE — 'v2' does not
  match; pinned); rectifiedEdges = 'rectified' substring; conf 0.7.
- environmentalSustainability: greenguardLevel = 'gold' when both
  'greenguard' and 'gold' appear (anywhere) else 'certified';
  totalRecycledContentRange from ``(\\d+)\\s*%\\s*recycled`` ints
  kept within [0, 100]; confidence 0.6.

A category's confidence column is NULL when no subfield fired (the
reference omits the whole category dict).

Scale: a single whole-stage-codegen projection — regexp_extract_all +
array HOFs, no shuffle, no UDF.  ``\\s`` inside patterns is pinned to
the explicit ASCII class (Java vs RE2 disagree on \\x0b).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_WS = "[ \\t\\r\\n\\x0b\\f]"
_NUM = "([0-9]+\\.?[0-9]*)"
R_PAT = "(?i)\\b(R(?:9|10|11|12|13))\\b"
DCOF_PAT = "dcof[:" + _WS[1:-1] + "]*" + _NUM
MOHS_PAT = ("mohs[:" + _WS[1:-1] + "]+(?:hardness[:" + _WS[1:-1]
            + "]+)?" + _NUM)
PEI_PAT = ("pei[:" + _WS[1:-1] + "]+(?:rating[:" + _WS[1:-1]
           + "]+)?(?:class[:" + _WS[1:-1] + "]+)?([0-5])")
WATER_PAT = ("water" + _WS + "+absorption[:" + _WS[1:-1] + "]*"
             + _NUM + _WS + "*%")
SHADE_PAT = "\\b(V[1-4])\\b"
RECYCLED_PAT = "([0-9]+)" + _WS + "*%" + _WS + "*recycled"

GLOSS_KEYWORDS = ["super-polished", "polished", "satin",
                  "semi-polished", "matte", "velvet", "anti-glare"]


def _bounded(pat: str, src: Column, lo: float, hi: float) -> Column:
    vals = F.transform(F.regexp_extract_all(src, F.lit(pat), F.lit(1)),
                       lambda v: v.cast("double"))
    return F.filter(vals, lambda v: (v >= lo) & (v <= hi))


def extract_props(docs: DataFrame) -> DataFrame:
    """Expects doc_id, text.  Emits the flattened category columns."""
    t = F.coalesce(F.col("text"), F.lit(""))
    low = F.lower(t)

    rvals = F.array_sort(F.array_distinct(F.transform(
        F.regexp_extract_all(t, F.lit(R_PAT), F.lit(1)), F.upper)))
    dcof = _bounded(DCOF_PAT, low, 0.0, 1.0)
    slip = (F.size(rvals) > 0) | (F.size(dcof) > 0)

    mohs = _bounded(MOHS_PAT, low, 1.0, 10.0)
    pei = F.array_sort(F.array_distinct(F.transform(
        F.regexp_extract_all(low, F.lit(PEI_PAT), F.lit(1)),
        lambda v: v.cast("int"))))
    mech = (F.size(mohs) > 0) | (F.size(pei) > 0)

    water = _bounded(WATER_PAT, low, 0.0, 100.0)
    frost = (low.contains("frost")
             & (low.contains("resist") | low.contains("proof")))
    wat = (F.size(water) > 0) | frost

    gloss = F.filter(
        F.array(*[F.lit(k) for k in GLOSS_KEYWORDS]),
        lambda k: low.contains(k))
    has_gloss = F.size(gloss) > 0

    shade = F.nullif(F.regexp_extract(t, SHADE_PAT, 1), F.lit(""))
    rect = low.contains("rectified")
    aes = shade.isNotNull() | rect

    gg = F.when(low.contains("greenguard"),
                F.when(low.contains("gold"), "gold")
                .otherwise("certified"))
    recycled = F.filter(
        F.transform(F.regexp_extract_all(low, F.lit(RECYCLED_PAT),
                                         F.lit(1)),
                    lambda v: v.cast("int")),
        lambda v: (v >= 0) & (v <= 100))
    sust = gg.isNotNull() | (F.size(recycled) > 0)

    def rng(arr: Column, cast: str):
        lo_ = F.when(F.size(arr) > 0, F.array_min(arr)).cast(cast)
        hi_ = F.when(F.size(arr) > 0, F.array_max(arr)).cast(cast)
        return lo_, hi_

    dcof_lo, dcof_hi = rng(dcof, "double")
    mohs_lo, mohs_hi = rng(mohs, "double")
    water_lo, water_hi = rng(water, "double")
    rec_lo, rec_hi = rng(recycled, "int")
    return docs.select(
        "doc_id",
        F.when(F.size(rvals) > 0, F.array_join(rvals, ","))
         .alias("slip_rvalues_csv"),
        dcof_lo.alias("dcof_min"), dcof_hi.alias("dcof_max"),
        F.when(slip, 0.65).alias("slip_conf"),
        mohs_lo.alias("mohs_min"), mohs_hi.alias("mohs_max"),
        F.when(F.size(pei) > 0, F.array_join(
            F.transform(pei, lambda v: v.cast("string")), ","))
         .alias("pei_csv"),
        F.when(mech, 0.6).alias("mech_conf"),
        water_lo.alias("water_min"), water_hi.alias("water_max"),
        F.when(wat, frost).cast("string")
         .alias("frost_resistance"),
        F.when(wat, 0.6).alias("water_conf"),
        F.when(has_gloss, F.array_join(gloss, ",")).alias("gloss_csv"),
        F.when(has_gloss, 0.7).alias("gloss_conf"),
        F.when(aes, shade).alias("shade_variation"),
        F.when(aes, rect).cast("string")
         .alias("rectified_edges"),
        F.when(aes, 0.7).alias("aesthetic_conf"),
        gg.alias("greenguard_level"),
        rec_lo.alias("recycled_min"), rec_hi.alias("recycled_max"),
        F.when(sust, 0.6).alias("sust_conf"))


def props_sql() -> str:
    """DuckDB twin over a CTE ``docs`` (doc_id, text)."""
    ws = "[ \\t\\r\\n\\x0b\\f]"
    sep = "[: \\t\\r\\n\\x0b\\f]"
    num = "([0-9]+\\.?[0-9]*)"
    gloss_list = ", ".join(f"'{k}'" for k in GLOSS_KEYWORDS)

    def bounded(pat, src, lo, hi):
        return (f"list_filter(list_transform(regexp_extract_all({src}, "
                f"'{pat}', 1), v -> CAST(v AS DOUBLE)), "
                f"v -> v >= {lo} AND v <= {hi})")

    dcof = bounded(f"dcof{sep}*{num}", "low", 0.0, 1.0)
    mohs = bounded(f"mohs{sep}+(?:hardness{sep}+)?{num}", "low", 1.0,
                   10.0)
    water = bounded(f"water{ws}+absorption{sep}*{num}{ws}*%", "low",
                    0.0, 100.0)
    return f"""
    base AS (SELECT doc_id, coalesce(text, '') AS t,
                    lower(coalesce(text, '')) AS low FROM docs),
    ext AS (SELECT doc_id, t, low,
        list_sort(list_distinct(list_transform(regexp_extract_all(t,
            '(?i)\\b(R(?:9|10|11|12|13))\\b', 1), v -> upper(v))))
            AS rvals,
        {dcof} AS dcof,
        {mohs} AS mohs,
        list_sort(list_distinct(list_transform(regexp_extract_all(low,
            'pei{sep}+(?:rating{sep}+)?(?:class{sep}+)?([0-5])', 1),
            v -> CAST(v AS INT)))) AS pei,
        {water} AS water,
        low LIKE '%frost%'
            AND (low LIKE '%resist%' OR low LIKE '%proof%') AS frost,
        list_filter([{gloss_list}],
                    k -> contains(low, k)) AS gloss,
        nullif(coalesce(regexp_extract(t, '\\b(V[1-4])\\b', 1), ''),
               '') AS shade,
        low LIKE '%rectified%' AS rect,
        CASE WHEN low LIKE '%greenguard%' THEN
            CASE WHEN low LIKE '%gold%' THEN 'gold'
                 ELSE 'certified' END END AS gg,
        list_filter(list_transform(regexp_extract_all(low,
            '([0-9]+){ws}*%{ws}*recycled', 1), v -> CAST(v AS INT)),
            v -> v >= 0 AND v <= 100) AS recycled
        FROM base)
    SELECT doc_id,
        CASE WHEN len(rvals) > 0
             THEN array_to_string(rvals, ',') END AS slip_rvalues_csv,
        CASE WHEN len(dcof) > 0 THEN list_min(dcof) END AS dcof_min,
        CASE WHEN len(dcof) > 0 THEN list_max(dcof) END AS dcof_max,
        CASE WHEN len(rvals) > 0 OR len(dcof) > 0 THEN CAST(0.65 AS DOUBLE) END
            AS slip_conf,
        CASE WHEN len(mohs) > 0 THEN list_min(mohs) END AS mohs_min,
        CASE WHEN len(mohs) > 0 THEN list_max(mohs) END AS mohs_max,
        CASE WHEN len(pei) > 0 THEN array_to_string(list_transform(
            pei, v -> CAST(v AS VARCHAR)), ',') END AS pei_csv,
        CASE WHEN len(mohs) > 0 OR len(pei) > 0 THEN CAST(0.6 AS DOUBLE) END
            AS mech_conf,
        CASE WHEN len(water) > 0 THEN list_min(water) END AS water_min,
        CASE WHEN len(water) > 0 THEN list_max(water) END AS water_max,
        CAST(CASE WHEN len(water) > 0 OR frost THEN frost END
             AS VARCHAR) AS frost_resistance,
        CASE WHEN len(water) > 0 OR frost THEN CAST(0.6 AS DOUBLE) END AS water_conf,
        CASE WHEN len(gloss) > 0
             THEN array_to_string(gloss, ',') END AS gloss_csv,
        CASE WHEN len(gloss) > 0 THEN CAST(0.7 AS DOUBLE) END AS gloss_conf,
        CASE WHEN shade IS NOT NULL OR rect THEN shade END
            AS shade_variation,
        CAST(CASE WHEN shade IS NOT NULL OR rect THEN rect END
             AS VARCHAR) AS rectified_edges,
        CASE WHEN shade IS NOT NULL OR rect THEN CAST(0.7 AS DOUBLE) END
            AS aesthetic_conf,
        gg AS greenguard_level,
        CAST(CASE WHEN len(recycled) > 0 THEN list_min(recycled) END
             AS INT) AS recycled_min,
        CAST(CASE WHEN len(recycled) > 0 THEN list_max(recycled) END
             AS INT) AS recycled_max,
        CASE WHEN gg IS NOT NULL OR len(recycled) > 0 THEN CAST(0.6 AS DOUBLE) END
            AS sust_conf
    FROM ext"""


# ---------------------------------------------------------------------------
# synthesized input (shared shape with the SQL twin)


def synth_prop_docs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")

    def frag(cond, s):
        return F.when(cond, F.lit(s)).otherwise(F.lit(""))

    text = F.concat(
        frag(e % 3 == 0, "Slip rating R10 and r11 certified. "),
        frag(e % 3 == 1, "Rated R9 only. "),
        frag(e % 4 == 0, "DCOF: 0.42 dcof 0.68 measured. "),
        frag(e % 4 == 1, "dcof: 1.5 out of spec. "),
        frag(e % 5 == 0, "Mohs hardness 6.5 scratch test mohs: 12. "),
        frag(e % 5 == 1, "PEI rating class 4 then pei: 3 again. "),
        frag(e % 6 == 0, "Water  absorption: 3.2 % tested twice "
                         "water absorption 0.5%. "),
        frag(e % 6 == 1, "frost resistant surface. "),
        frag(e % 6 == 2, "certified frost proof. "),
        frag(e % 6 == 3, "frost mentioned alone. "),
        frag(e % 7 == 0, "super-polished finish. "),
        frag(e % 7 == 1, "matte and velvet options. "),
        frag(e % 8 == 0, "Shade V3 then V2 variation. "),
        frag(e % 8 == 1, "shade v2 lowercase ignored. "),
        frag(e % 9 == 0, "rectified edges throughout. "),
        frag(e % 10 == 0, "GREENGUARD Gold certified product. "),
        frag(e % 10 == 1, "greenguard listed. "),
        frag(e % 11 == 0, "40 % recycled content with 25% recycled "
                          "glass and 140% recycled bogus. "))
    return events.select(e.alias("doc_id"), text.alias("text"))


SYNTH_PROP_SQL = """
SELECT event_id AS doc_id,
       CASE WHEN event_id % 3 = 0
            THEN 'Slip rating R10 and r11 certified. ' ELSE '' END
    || CASE WHEN event_id % 3 = 1 THEN 'Rated R9 only. ' ELSE '' END
    || CASE WHEN event_id % 4 = 0
            THEN 'DCOF: 0.42 dcof 0.68 measured. ' ELSE '' END
    || CASE WHEN event_id % 4 = 1
            THEN 'dcof: 1.5 out of spec. ' ELSE '' END
    || CASE WHEN event_id % 5 = 0
            THEN 'Mohs hardness 6.5 scratch test mohs: 12. '
            ELSE '' END
    || CASE WHEN event_id % 5 = 1
            THEN 'PEI rating class 4 then pei: 3 again. ' ELSE '' END
    || CASE WHEN event_id % 6 = 0
            THEN 'Water  absorption: 3.2 % tested twice water absorption 0.5%. '
            ELSE '' END
    || CASE WHEN event_id % 6 = 1
            THEN 'frost resistant surface. ' ELSE '' END
    || CASE WHEN event_id % 6 = 2
            THEN 'certified frost proof. ' ELSE '' END
    || CASE WHEN event_id % 6 = 3
            THEN 'frost mentioned alone. ' ELSE '' END
    || CASE WHEN event_id % 7 = 0
            THEN 'super-polished finish. ' ELSE '' END
    || CASE WHEN event_id % 7 = 1
            THEN 'matte and velvet options. ' ELSE '' END
    || CASE WHEN event_id % 8 = 0
            THEN 'Shade V3 then V2 variation. ' ELSE '' END
    || CASE WHEN event_id % 8 = 1
            THEN 'shade v2 lowercase ignored. ' ELSE '' END
    || CASE WHEN event_id % 9 = 0
            THEN 'rectified edges throughout. ' ELSE '' END
    || CASE WHEN event_id % 10 = 0
            THEN 'GREENGUARD Gold certified product. ' ELSE '' END
    || CASE WHEN event_id % 10 = 1
            THEN 'greenguard listed. ' ELSE '' END
    || CASE WHEN event_id % 11 = 0
            THEN '40 % recycled content with 25% recycled glass and 140% recycled bogus. '
            ELSE '' END AS text
FROM events"""
