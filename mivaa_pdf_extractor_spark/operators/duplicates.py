"""Factory-gated product duplicate detection — the reference's
duplicate-detection service
(app/services/search/duplicate_detection_service.py) re-expressed as a
bucketed self-join:

- ``extract_factory``   — ``_extract_factory_info`` (:249-268):
  first truthy metadata value in FACTORY_KEYS priority order,
  lowercased + stripped (an empty-string value is skipped, not used).
- ``candidate_pairs``   — ``_is_same_factory`` (:270-284) as the JOIN
  CONDITION: products pair ONLY within the same non-null factory
  (id_a < id_b). The reference's critical rule — different factories
  are never duplicates regardless of similarity — is structural here:
  cross-factory pairs are never generated.
- ``score_pairs``       — ``_calculate_similarity`` (:287-336):
  name similarity = SequenceMatcher.ratio on lower/strip
  (text_similarity.py:14-42); description similarity = the
  deterministic sequence fallback (:361-378 — the embeddings path is
  a network service, out of scope per SURVEY, and the reference
  itself falls back to this on any failure); metadata similarity =
  ``_calculate_metadata_similarity`` (:381-423) with the exact
  key/value bookkeeping incl. the ``> 0.8 → +0.8`` fuzzy tier;
  weighted overall (name 0.50, description 0.30, metadata 0.20,
  :41-46) and the high/medium/low/very_low ladder (:425-434).

Scale: the factory gate turns the reference's O(n²) all-pairs loop
(:147-247 batch_detect_duplicates) into an equi-join keyed on the
factory string — pair count is bounded by per-factory bucket
occupancy, never corpus². Mega-brand skew is the classic AQE
skew-join case (spark.sql.adaptive.skewJoin handles it). The two
SequenceMatcher evaluations are Arrow-batched pandas UDFs (the ratio
has no native/SQL equivalent); everything else is codegen-resident.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# duplicate_detection_service.py:48-55 — priority order
FACTORY_KEYS = ["factory", "manufacturer", "factory_group", "brand",
                "company"]
# :36-39
HIGH_CONFIDENCE = 0.85
MEDIUM_CONFIDENCE = 0.70
LOW_CONFIDENCE = 0.55
# :41-46
W_NAME, W_DESC, W_META = 0.50, 0.30, 0.20


def _nonempty(c: Column) -> Column:
    return F.when((c.isNotNull()) & (c != ""), c)


def extract_factory(df: DataFrame, metadata_col: str = "metadata",
                    out_col: str = "factory") -> DataFrame:
    """First truthy FACTORY_KEYS value, normalized (:249-268)."""
    m = F.col(metadata_col)
    v = F.coalesce(*[_nonempty(F.element_at(m, F.lit(k)))
                     for k in FACTORY_KEYS])
    return df.withColumn(out_col, F.lower(F.trim(v)))


def candidate_pairs(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Same-factory product pairs (id_a < id_b). Null factory never
    pairs (``_is_same_factory`` returns False on missing, :282)."""
    base = df if "factory" in df.columns else extract_factory(df)
    a, b = base.alias("a"), base.alias("b")
    joined = a.join(b, (F.col("a.factory") == F.col("b.factory"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
    keep = [c for c in base.columns if c != "factory"]
    return joined.select(
        F.col("a.factory").alias("factory"),
        *[F.col(f"a.{c}").alias(f"{c}_a") for c in keep],
        *[F.col(f"b.{c}").alias(f"{c}_b") for c in keep])


def _seqratio(a: Column, b: Column) -> Column:
    """calculate_string_similarity with case_sensitive=False
    (text_similarity.py:14-42): 0.0 when either input is empty/null,
    else SequenceMatcher.ratio over lower().strip()."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    # memoize per distinct input pair: same-factory candidate pairs
    # draw names/descriptions from a small per-factory vocabulary, so
    # the same (s1, s2) recurs across many pairs. The memo lives in the
    # closure and persists across Arrow batches within a task (§4.5);
    # the size cap bounds worker memory — on a pathological corpus with
    # no repeats the cost degrades to the uncached difflib sweep.
    memo: dict = {}

    def _fn(x, y):
        from difflib import SequenceMatcher
        out = []
        for s1, s2 in zip(x, y):
            if not s1 or not s2:
                out.append(0.0)
                continue
            k = (s1, s2)
            r = memo.get(k)
            if r is None:
                r = SequenceMatcher(
                    None, s1.lower().strip(), s2.lower().strip()).ratio()
                if len(memo) < (1 << 17):
                    memo[k] = r
            out.append(r)
        return pd.Series(out)

    _fn.__annotations__ = {"x": pd.Series, "y": pd.Series,
                           "return": pd.Series}
    return pandas_udf(_fn, T.DoubleType())(a, b)


def _meta_sim(a: Column, b: Column) -> Column:
    """``_calculate_metadata_similarity`` (:381-423): over the union
    of non-factory keys, +1 key-match when present in both, value +1
    on exact equality else +0.8 when the fuzzy ratio exceeds 0.8;
    similarity = (key_ratio + value_ratio) / 2. Empty either side →
    0.0; no non-factory keys → 1.0."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    fkeys = set(FACTORY_KEYS)
    # fuzzy-tier memo, same rationale and bound as _seqratio's
    memo: dict = {}

    def _fn(ms1, ms2):
        from difflib import SequenceMatcher
        out = []
        for m1, m2 in zip(ms1, ms2):
            m1, m2 = m1 or {}, m2 or {}
            if not m1 or not m2:
                out.append(0.0)
                continue
            keys = (set(m1) | set(m2)) - fkeys
            if not keys:
                out.append(1.0)
                continue
            mk = 0
            mv = 0.0
            for k in keys:
                if k in m1 and k in m2:
                    mk += 1
                    v1, v2 = m1[k], m2[k]
                    if v1 == v2:
                        mv += 1
                    elif isinstance(v1, str) and isinstance(v2, str):
                        if v1 and v2:
                            pk = (v1, v2)
                            r = memo.get(pk)
                            if r is None:
                                r = SequenceMatcher(
                                    None, v1.lower().strip(),
                                    v2.lower().strip()).ratio()
                                if len(memo) < (1 << 17):
                                    memo[pk] = r
                            if r > 0.8:
                                mv += 0.8
            out.append(((mk / len(keys)) + (mv / len(keys))) / 2)
        return pd.Series(out)

    _fn.__annotations__ = {"ms1": pd.Series, "ms2": pd.Series,
                           "return": pd.Series}
    return pandas_udf(_fn, T.DoubleType())(a, b)


def score_pairs(pairs: DataFrame) -> DataFrame:
    """Append the three component similarities, the weighted overall
    score, and the confidence level (:287-336, :425-434)."""
    name_sim = _seqratio(F.col("name_a"), F.col("name_b"))
    desc_sim = _seqratio(F.col("description_a"), F.col("description_b"))
    meta_sim = _meta_sim(F.col("metadata_a"), F.col("metadata_b"))
    out = (pairs
           .withColumn("name_similarity", name_sim)
           .withColumn("description_similarity", desc_sim)
           .withColumn("metadata_similarity", meta_sim)
           .withColumn("overall_score",
                       F.lit(W_NAME) * F.col("name_similarity")
                       + F.lit(W_DESC) * F.col("description_similarity")
                       + F.lit(W_META) * F.col("metadata_similarity")))
    conf = (F.when(F.col("overall_score") >= HIGH_CONFIDENCE, "high")
            .when(F.col("overall_score") >= MEDIUM_CONFIDENCE, "medium")
            .when(F.col("overall_score") >= LOW_CONFIDENCE, "low")
            .otherwise("very_low"))
    return out.withColumn("confidence", conf)


def detect_duplicates(products: DataFrame,
                      id_col: str = "id") -> DataFrame:
    """Full tier: factory gate → same-factory pairs → scored pairs.

    The pairs are explicitly round-robined across the cluster before
    scoring: AQE coalesces the join's output stage by its INPUT bytes
    (a few MB of products), but the same-factory self-join expands the
    row count ~bucket-size-fold and the two difflib pandas UDFs
    multiply per-row cost ~1000x over codegen — left alone, the whole
    scoring stage lands in 1-2 coalesced partitions (measured 24 s
    single-task at sf0.1 vs ~2 s distributed). Cheap-input-bytes →
    expensive-downstream-work is exactly the shape AQE cannot see."""
    pairs = candidate_pairs(products, id_col=id_col)
    par = products.sparkSession.sparkContext.defaultParallelism
    return score_pairs(pairs.repartition(par))
