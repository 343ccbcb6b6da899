"""Corpus mixture sampling.

Pre-training runs fix a mixture over data sources (the Pile / DoReMi-style
"mixing weights": web 50%, books 30%, code 20%, ...). Given the corpus and
a weight per source, this operator down-samples each source so the output
follows the target mixture exactly while keeping as much data as possible:
the output size is T = min_s(n_s / w_s) weighted units — the corpus the
LIMITING source can support — and each source contributes
floor(w_s * T) documents.

Selection within a source is by md5(doc_id) order, so the sample is
deterministic, reproducible across runs and engines (the property every
resume/audit path here relies on), and unbiased with respect to corpus
order.

Scale design — two modes:

- ``exact=True``: per-source quota filled by hash-rank (row_number over a
  window partitioned by source). One shuffle, partitioned on source; with
  few huge sources that window is SKEWED (one task per source at the
  extreme), so exact mode is for audits and contract verification, not
  the 100 TB pass.
- ``exact=False``: threshold mode — keep a document when the uniform
  fraction derived from its md5 falls below quota_s/n_s. Map-only against
  the scan after the tiny (source, threshold) table broadcasts; quotas
  are hit in expectation with O(sqrt(n)) deviation, which is what a
  production mixing pass accepts in exchange for zero corpus shuffle.

Both modes compute the quota table from one small aggregate (a handful of
rows — it broadcasts) and never collect corpus data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _uniform_frac(id_col: str, salt: str = "") -> "F.Column":
    """md5(salt + id)'s top 60 bits as a uniform fraction in [0, 1).

    15 hex chars keep the conv() inside exact double range, and the
    division is by a power of two, so any IEEE engine reproduces the
    value bit-for-bit (the DuckDB twins hash to the same double). Every
    hash-derived decision in this module draws from this helper with a
    DISTINCT salt, so the decisions are mutually independent — composing
    the operators never correlates (e.g. a mixture-sampled corpus still
    splits 80/10/10, not 100/0/0).
    """
    key = (F.concat(F.lit(salt), F.col(id_col).cast("string")) if salt
           else F.col(id_col).cast("string"))
    return (F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("double")
            / F.lit(float(1 << 60)))


def mixture_sample(df: DataFrame, weights: DataFrame,
                   source_col: str = "source", id_col: str = "doc_id",
                   exact: bool = True) -> DataFrame:
    """Down-sample ``df`` to the target source mixture.

    ``weights``: a tiny DataFrame ``(source_col, weight)`` — relative
    mixing weights, any positive scale. Sources absent from ``weights``
    are dropped (weight 0). Returns ``(id_col, source_col)`` — the kept
    documents.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("n"))
    j = counts.join(F.broadcast(weights), source_col)
    t = j.agg(F.min(F.col("n") / F.col("weight")).alias("t"))
    quota = (j.crossJoin(F.broadcast(t))
             .select(source_col, "n",
                     F.floor(F.col("weight") * F.col("t")).alias("quota")))
    base = df.select(F.col(id_col), F.col(source_col))
    if exact:
        w = (Window.partitionBy(source_col)
             .orderBy(F.md5(F.col(id_col).cast("string"))))
        ranked = base.withColumn("rk", F.row_number().over(w))
        return (ranked.join(F.broadcast(quota), source_col)
                .filter(F.col("rk") <= F.col("quota"))
                .select(id_col, source_col))
    # threshold mode: the unsalted fraction is this operator's OWN
    # selection hash (exact mode ranks by the same unsalted md5)
    frac = _uniform_frac(id_col)
    return (base.withColumn("__frac", frac)
            .join(F.broadcast(quota), source_col)
            .filter(F.col("__frac") * F.col("n") < F.col("quota"))
            .select(id_col, source_col))


def hash_split(df: DataFrame, id_col: str = "doc_id",
               fractions: dict[str, float] | None = None) -> DataFrame:
    """Deterministic train/val/test assignment by content-free hashing —
    the split step every corpus pipeline runs last. ``fractions`` maps
    split name -> fraction (must sum to 1); default 80/10/10.

    The assignment key is md5('split|' + id)'s top 60 bits as a uniform
    fraction (salted, so it is independent of mixture_sample's unsalted
    selection hash — a mixture-sampled corpus still splits at the target
    rates instead of landing 100% in 'train'),
    so it is (a) stable across runs, engines, and corpus growth — a
    document keeps its split when the corpus is re-built, which is what
    prevents silent train/test leakage between dataset versions — and
    (b) independent of corpus order. Map-only projection, no shuffle;
    the division is by a power of two, so the double is exact in any
    IEEE engine (the DuckDB twin hashes to the same bit).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        # a silent non-1 sum mis-sizes every later split (train/eval
        # contamination with no error) — fail loudly instead
        raise ValueError(f"split fractions must sum to 1, got {total}")
    frac = _uniform_frac(id_col, salt="split|")
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        expr = (F.when(frac < F.lit(acc), F.lit(name)) if expr is None
                else expr.when(frac < F.lit(acc), F.lit(name)))
    expr = (expr.otherwise(F.lit(names[-1])) if expr is not None
            else F.lit(names[-1]))
    return df.select(F.col(id_col), expr.alias("split"))


def importance_resample(df: DataFrame, score_col: str,
                        id_col: str = "doc_id",
                        scale: int = 1_000_000,
                        salt: str = "q|") -> DataFrame:
    """Quality-weighted importance resampling: keep each row with
    probability ``score/scale`` — the soft alternative to a hard quality
    cutoff (CCNet keeps its middle-perplexity tercile; modern curation
    instead samples in proportion to a quality score so borderline
    documents survive at reduced rate instead of cliff-dropping).

    Deterministic: the keep decision hashes ``salt + id`` (salted so it
    is independent of other hash-derived decisions on the same corpus,
    e.g. hash_split's), so reruns and engines agree bit-for-bit.
    ``score_col`` is expected in integer ``scale``-units (micro-units by
    default) — the comparison is frac*scale < score with both sides
    exact doubles, no float-formula drift. Map-only, no shuffle.
    """
    frac = _uniform_frac(id_col, salt=salt)
    return (df.withColumn("__frac", frac)
            .filter(F.col("__frac") * F.lit(float(scale))
                    < F.col(score_col))
            .drop("__frac"))
